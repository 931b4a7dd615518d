"""Unit tests for the numerics substrate (GLL quadrature, SE operators)."""

import numpy as np
import pytest

from tempestmodel_tpu.ops import quadrature as quad


def test_gll_p4_matches_reference_constants():
    """Nodes/weights/D/S must match the exact constants hardcoded in the
    reference (GridGLL.cpp:107-160)."""
    x, w = quad.gauss_lobatto(4, 0.0, 1.0)
    np.testing.assert_allclose(
        x, [0.0, 2.76393202250021063903773210768e-1,
            7.23606797749978936096226789232e-1, 1.0], atol=1e-14)
    np.testing.assert_allclose(
        w, [8.33333333333333e-2, 4.16666666666667e-1,
            4.16666666666667e-1, 8.33333333333333e-2], atol=1e-13)
    D = quad.derivative_matrix(x)
    np.testing.assert_allclose(D[0, 0], -6.0, atol=1e-12)
    np.testing.assert_allclose(D[1, 0], 8.09016994374947451262869435595, atol=1e-12)
    np.testing.assert_allclose(D[2, 0], -3.09016994374947451262869435595, atol=1e-12)
    np.testing.assert_allclose(D[3, 0], 1.0, atol=1e-12)
    np.testing.assert_allclose(D[0, 1], -1.61803398874989490252573887119, atol=1e-12)
    S = quad.stiffness_matrix(x, w)
    np.testing.assert_allclose(S[0, 1], -8.09016994374947451262869435595, atol=1e-12)
    np.testing.assert_allclose(S[3, 1], -3.09016994374947451262869435595, atol=1e-12)


@pytest.mark.parametrize("n", [2, 3, 4, 5, 6, 8, 10])
def test_gll_quadrature_exactness(n):
    """GLL with n points integrates polynomials up to degree 2n-3 exactly."""
    x, w = quad.gauss_lobatto(n, -1.0, 1.0)
    for deg in range(2 * n - 2):
        exact = (1.0 - (-1.0) ** (deg + 1)) / (deg + 1)
        np.testing.assert_allclose(np.sum(w * x ** deg), exact, atol=1e-12,
                                   err_msg=f"degree {deg}")


@pytest.mark.parametrize("n", [2, 3, 4, 6])
def test_derivative_matrix_exact_on_polynomials(n):
    x, _ = quad.gauss_lobatto(n, 0.0, 1.0)
    D = quad.derivative_matrix(x)
    for deg in range(n):
        f = x ** deg
        df = deg * x ** (deg - 1) if deg > 0 else np.zeros_like(x)
        np.testing.assert_allclose(f @ D, df, atol=1e-10)


def test_interpolation_matrix():
    x, _ = quad.gauss_lobatto(5, 0.0, 1.0)
    pts = np.array([0.1, 0.35, 0.99])
    M = quad.interpolation_matrix(x, pts)
    f = 3 * x ** 4 - 2 * x ** 2 + x - 7
    expect = 3 * pts ** 4 - 2 * pts ** 2 + pts - 7
    np.testing.assert_allclose(M @ f, expect, atol=1e-12)


def test_gauss_quadrature():
    x, w = quad.gauss(4, 0.0, 1.0)
    np.testing.assert_allclose(np.sum(w * x ** 7), 1.0 / 8.0, atol=1e-13)
