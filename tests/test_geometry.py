"""Geometry golden tests: metric identities on the cubed sphere."""

import numpy as np
import jax.numpy as jnp
import pytest

from tempestmodel_tpu.constants import DEFAULT_CONSTANTS
from tempestmodel_tpu.grid import cubed_sphere as cst
from tempestmodel_tpu.grid.geometry import build_geometry, node_multiplicity


@pytest.fixture(scope="module")
def geom():
    return build_geometry(ne=4, p=4, constants=DEFAULT_CONSTANTS)


def test_sphere_area(geom):
    """Quadrature area converges to 4 pi a^2 at the SE order.

    (GLL quadrature of the non-polynomial Jacobian is not exact; the error
    must be small and shrink ~2^6 per doubling at p=4.)
    """
    a = DEFAULT_CONSTANTS.earth_radius
    exact = 4.0 * np.pi * a * a
    e4 = abs(float(jnp.sum(geom.area2d)) - exact) / exact
    assert e4 < 1e-6
    g8 = build_geometry(ne=8, p=4, constants=DEFAULT_CONSTANTS)
    e8 = abs(float(jnp.sum(g8.area2d)) - exact) / exact
    assert e8 < e4 / 30.0


def test_roundtrip_coordinates():
    rng = np.random.default_rng(0)
    lon = rng.uniform(0, 2 * np.pi, 1000)
    lat = rng.uniform(-np.pi / 2 + 0.01, np.pi / 2 - 0.01, 1000)
    a, b, p = cst.abp_from_rll(lon, lat)
    for pi in range(6):
        m = p == pi
        if not m.any():
            continue
        lon2, lat2 = cst.rll_from_abp(a[m], b[m], pi)
        np.testing.assert_allclose(lat2, lat[m], atol=1e-12)
        dlon = np.mod(lon2 - lon[m] + np.pi, 2 * np.pi) - np.pi
        np.testing.assert_allclose(dlon, 0.0, atol=1e-12)


def test_metric_inverse(geom):
    """cov2d and con2d must be matrix inverses."""
    con = np.asarray(geom.con2d)
    cov = np.asarray(geom.cov2d)
    prod = np.einsum("...ij,...jk->...ik", con, cov)
    eye = np.broadcast_to(np.eye(2), prod.shape)
    np.testing.assert_allclose(prod, eye, atol=1e-11)


def test_jacobian_det(geom):
    """J2d = a^2 sqrt(det(cov metric without a^2... )): J^2 = det(g_ij)."""
    cov = np.asarray(geom.cov2d)
    det = cov[..., 0, 0] * cov[..., 1, 1] - cov[..., 0, 1] * cov[..., 1, 0]
    np.testing.assert_allclose(np.sqrt(det), np.asarray(geom.jac2d), rtol=1e-12)


def test_vector_transform_roundtrip():
    rng = np.random.default_rng(1)
    for p in range(6):
        X = rng.uniform(-0.99, 0.99, 50)
        Y = rng.uniform(-0.99, 0.99, 50)
        ulon = rng.normal(size=50)
        ulat = rng.normal(size=50)
        ua, ub = cst.vec_cov_from_sphere(X, Y, p, ulon, ulat)
        ulon2, ulat2 = cst.vec_sphere_from_cov(X, Y, p, ua, ub)
        np.testing.assert_allclose(ulon2, ulon, atol=1e-10)
        np.testing.assert_allclose(ulat2, ulat, atol=1e-10)
        ca, cb = cst.vec_con_from_sphere(X, Y, p, ulon, ulat)
        ulon3, ulat3 = cst.vec_sphere_from_con(X, Y, p, ca, cb)
        np.testing.assert_allclose(ulon3, ulon, atol=1e-10)
        np.testing.assert_allclose(ulat3, ulat, atol=1e-10)


def test_cov_con_consistency(geom):
    """Raising the covariant components with con2d must equal the
    contravariant transform of the same sphere vector."""
    rng = np.random.default_rng(2)
    alpha = np.asarray(geom.alpha)
    X = np.tan(alpha)[:, None] * np.ones((1, len(alpha)))
    Y = np.ones((len(alpha), 1)) * np.tan(alpha)[None, :]
    ulon = rng.normal(size=X.shape)
    ulat = rng.normal(size=X.shape)
    a_r = DEFAULT_CONSTANTS.earth_radius
    for p in [0, 4]:
        cov_a, cov_b = cst.vec_cov_from_sphere(X, Y, p, a_r * ulon, a_r * ulat)
        con_a, con_b = cst.vec_con_from_sphere(X, Y, p, ulon / a_r, ulat / a_r)
        con = np.asarray(geom.con2d[p])
        raised_a = con[..., 0, 0] * cov_a + con[..., 0, 1] * cov_b
        raised_b = con[..., 1, 0] * cov_a + con[..., 1, 1] * cov_b
        np.testing.assert_allclose(raised_a, con_a, atol=1e-10 * a_r)
        np.testing.assert_allclose(raised_b, con_b, atol=1e-10 * a_r)


def test_multiplicity_counts():
    ne, p = 3, 4
    mult = node_multiplicity(ne, p)
    assert mult[0, 0, 0] == 3.0
    assert mult[0, 0, 1] == 2.0
    assert mult[0, p - 1, 1] == 2.0      # interior element boundary x edge-free row
    assert mult[0, p - 1, p] == 4.0      # interior cross
    assert mult[0, 1, 1] == 1.0
    assert mult[0, 0, p - 1] == 4.0      # panel edge x element boundary


def test_geometry_edge_meta_consistency(geom):
    """Every edge link must be mutual."""
    links = {(pa, e): (qa, qe, flip) for (pa, e, qa, qe, flip) in geom.edge_meta}
    for (pa, e), (qa, qe, flip) in links.items():
        back = links[(qa, qe)]
        assert back == (pa, e, flip)
