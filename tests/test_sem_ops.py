"""Unit tests for the spectral-element tensor-product operators."""

import numpy as np
import jax.numpy as jnp

from tempestmodel_tpu.ops import quadrature as quad
from tempestmodel_tpu.ops import sem


def _setup(ne=4, p=4):
    x01, w01 = quad.gauss_lobatto(p, 0.0, 1.0)
    D = jnp.asarray(quad.derivative_matrix(x01))
    S = jnp.asarray(quad.stiffness_matrix(x01, w01))
    delta = 1.0 / ne
    nodes = (np.repeat(np.arange(ne), p) + np.tile(x01, ne)) * delta
    return D, S, delta, nodes, np.tile(w01, ne) * delta


def test_deriv_a_b_polynomial_exact():
    """SE derivatives are exact on polynomials of degree < p per element."""
    D, S, delta, nodes, _ = _setup()
    A = len(nodes)
    fa = nodes[:, None] ** 3 * np.ones((1, A))
    fb = np.ones((A, 1)) * nodes[None, :] ** 3
    f_a = jnp.asarray(np.broadcast_to(fa, (6, A, A)))
    f_b = jnp.asarray(np.broadcast_to(fb, (6, A, A)))
    da = sem.deriv_a(f_a, D, 4, 4, 4, delta)
    db = sem.deriv_b(f_b, D, 4, 4, 4, delta)
    expect_a = 3.0 * nodes[:, None] ** 2 * np.ones((1, A))
    expect_b = 3.0 * np.ones((A, 1)) * nodes[None, :] ** 2
    np.testing.assert_allclose(np.asarray(da[0]), expect_a, atol=1e-10)
    np.testing.assert_allclose(np.asarray(db[0]), expect_b, atol=1e-10)
    # deriv_both must agree with the individual calls
    da2, db2 = sem.deriv_both(f_a, D, 4, 4, 4, delta, delta)
    np.testing.assert_allclose(np.asarray(da), np.asarray(da2), atol=1e-13)
    db3 = sem.deriv_b(f_a, D, 4, 4, 4, delta)
    _, db4 = sem.deriv_both(f_a, D, 4, 4, 4, delta, delta)
    np.testing.assert_allclose(np.asarray(db3), np.asarray(db4), atol=1e-13)


def test_deriv_b_trailing_dims():
    """deriv_b handles trailing (level) axes identically per level."""
    D, S, delta, nodes, _ = _setup()
    A = len(nodes)
    rng = np.random.default_rng(0)
    f = rng.standard_normal((6, A, A))
    f3 = jnp.asarray(np.stack([f, 2.0 * f], axis=-1))
    db3 = sem.deriv_b(f3, D, 4, 4, 4, delta)
    db = sem.deriv_b(jnp.asarray(f), D, 4, 4, 4, delta)
    np.testing.assert_allclose(np.asarray(db3[..., 0]), np.asarray(db),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(db3[..., 1]), 2.0 * np.asarray(db),
                               atol=1e-12)


def test_weak_div_mass_conservation():
    """The variational divergence conserves mass exactly per element.

    Tempest's variational form (``HorizontalDynamicsFEM.cpp:519-560``) drops
    the boundary lift term (it cancels between elements under DSS assembly),
    so sum_i w_i [weak_div(F)]_i == 0 for ANY flux data — the discrete mass
    conservation property of the scheme.
    """
    p = 4
    x01, w01 = quad.gauss_lobatto(p, 0.0, 1.0)
    S = jnp.asarray(quad.stiffness_matrix(x01, w01))
    rng = np.random.default_rng(1)
    fa = rng.standard_normal((6, p, p))
    fb = rng.standard_normal((6, p, p))
    d = sem.weak_div(jnp.asarray(fa), jnp.asarray(fb), S, 1, 1, p, 1.0, 1.0)
    w2 = w01[:, None] * w01[None, :]
    total = float(jnp.sum(jnp.asarray(w2) * d[0]))
    np.testing.assert_allclose(total, 0.0, atol=1e-12)
