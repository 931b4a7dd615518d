"""Pallas TPU kernels vs their XLA reference formulations (interpret mode).

The banded solver kernel (``ops/pallas_banded.py``) replaces the
reference's per-column LAPACK DGBSV loop
(``src/atm/VerticalDynamicsFEM.cpp:1437-1464``); on CPU it runs in the
Pallas interpreter, so these tests validate the exact kernel logic that
runs on TPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tempestmodel_tpu.models.vertical_banded import (
    banded_solve_t, interleave_perm)
from tempestmodel_tpu.ops.pallas_banded import banded_solve_pallas


def _random_banded(n, q, ncol, seed=0, dtype=np.float64):
    """Diagonally-dominant banded systems in the (n, 2q+1, ncol) layout."""
    rng = np.random.default_rng(seed)
    b = 2 * q + 1
    bands = rng.standard_normal((n, b, ncol)).astype(dtype)
    # strong diagonal (the HEVI Newton systems carry I/dt)
    bands[:, q, :] += 2.0 * b
    # zero out-of-range diagonals (extractor band guarantee)
    rows = np.arange(n)
    for d in range(b):
        col = rows + d - q
        bad = (col < 0) | (col >= n)
        bands[bad, d, :] = 0.0
    rhs = rng.standard_normal((n, ncol)).astype(dtype)
    return jnp.asarray(bands), jnp.asarray(rhs)


def _dense_solve(bands, rhs, q):
    """Dense reference solve of the banded layout."""
    n, b, ncol = bands.shape
    X = np.zeros((n, ncol))
    bands = np.asarray(bands)
    rhs = np.asarray(rhs)
    for c in range(ncol):
        A = np.zeros((n, n))
        for d in range(b):
            for i in range(n):
                j = i + d - q
                if 0 <= j < n:
                    A[i, j] = bands[i, d, c]
        X[:, c] = np.linalg.solve(A, rhs[:, c])
    return X


@pytest.mark.parametrize("q", [1, 2, 4])
def test_pallas_banded_matches_scan_and_dense(q):
    n, ncol = 3 * 10 + 1, 24
    bands, rhs = _random_banded(n, q, ncol, seed=q)
    x_scan = np.asarray(banded_solve_t(bands, rhs, q))
    x_pl = np.asarray(banded_solve_pallas(bands, rhs, q, col_tile=16,
                                          interpret=True))
    x_dense = _dense_solve(bands, rhs, q)
    np.testing.assert_allclose(x_scan, x_dense, rtol=1e-10, atol=1e-10)
    np.testing.assert_allclose(x_pl, x_scan, rtol=1e-10, atol=1e-10)


def test_pallas_banded_column_padding():
    """ncol not a multiple of col_tile exercises the identity-pad path."""
    n, q, ncol = 13, 2, 7
    bands, rhs = _random_banded(n, q, ncol, seed=3)
    x_scan = np.asarray(banded_solve_t(bands, rhs, q))
    x_pl = np.asarray(banded_solve_pallas(bands, rhs, q, col_tile=16,
                                          interpret=True))
    np.testing.assert_allclose(x_pl, x_scan, rtol=1e-10, atol=1e-10)


def test_interleave_perm_roundtrip():
    nz = 7
    perm = interleave_perm(nz)
    assert sorted(perm.tolist()) == list(range(3 * nz + 1))
    inv = np.argsort(perm)
    np.testing.assert_array_equal(perm[inv], np.arange(3 * nz + 1))
