"""DSS correctness: idempotence, continuity, smooth-field preservation."""

import numpy as np
import jax.numpy as jnp
import pytest

from tempestmodel_tpu.constants import DEFAULT_CONSTANTS
from tempestmodel_tpu.grid import cubed_sphere as cst
from tempestmodel_tpu.grid.geometry import build_geometry
from tempestmodel_tpu.parallel import dss
from tempestmodel_tpu.testcases.shallow_water import sphere_velocity_to_covariant


@pytest.fixture(scope="module")
def geom():
    return build_geometry(ne=4, p=4, constants=DEFAULT_CONSTANTS)


def _coincident_groups(geom):
    """Group stored nodes by their position on the sphere."""
    alpha = np.asarray(geom.alpha)
    A = len(alpha)
    X = np.tan(alpha)
    groups = {}
    for p in range(6):
        for i in range(A):
            for j in range(A):
                xyz = np.round(np.array(cst.xyz_from_xyp(X[i], X[j], p)), 9)
                groups.setdefault(tuple(xyz), []).append((p, i, j))
    return groups


def test_scalar_dss_is_mean_over_coincident(geom):
    rng = np.random.default_rng(0)
    A = geom.ne * geom.p
    f = jnp.asarray(rng.normal(size=(6, A, A)))
    out = np.asarray(dss.apply_dss_scalar(f, geom))
    fn = np.asarray(f)
    groups = _coincident_groups(geom)
    checked_mults = set()
    for nodes in groups.values():
        vals = [fn[n] for n in nodes]
        outs = [out[n] for n in nodes]
        mean = np.mean(vals)
        checked_mults.add(len(nodes))
        for o in outs:
            np.testing.assert_allclose(o, mean, atol=1e-12)
    # we must have exercised multiplicity 1, 2, 3 and 4 nodes
    assert checked_mults == {1, 2, 3, 4}


def test_scalar_dss_idempotent(geom):
    rng = np.random.default_rng(1)
    A = geom.ne * geom.p
    f = jnp.asarray(rng.normal(size=(6, A, A)))
    once = dss.apply_dss_scalar(f, geom)
    twice = dss.apply_dss_scalar(once, geom)
    np.testing.assert_allclose(np.asarray(once), np.asarray(twice), atol=1e-12)


def test_scalar_dss_preserves_continuous_field(geom):
    """A globally continuous function must be unchanged by DSS."""
    lon = np.asarray(geom.lon)
    lat = np.asarray(geom.lat)
    f = jnp.asarray(np.sin(lat) * np.cos(2 * lon) + np.cos(lat) ** 2)
    out = dss.apply_dss_scalar(f, geom)
    np.testing.assert_allclose(np.asarray(out), np.asarray(f), atol=1e-11)


def test_vector_dss_preserves_continuous_vector_field(geom):
    """A smooth global vector field (in covariant components) is DSS-invariant:
    this exercises the cross-panel covariant rotation matrices."""
    lon = np.asarray(geom.lon)
    lat = np.asarray(geom.lat)
    # smooth sphere vector field (solid-body-like plus twist)
    ulon = 30.0 * np.cos(lat) + 5.0 * np.sin(lat) ** 2 * np.cos(lon)
    ulat = -10.0 * np.sin(lon) * np.cos(lat)
    U, V = sphere_velocity_to_covariant(ulon, ulat, geom, DEFAULT_CONSTANTS)
    U = jnp.asarray(U)
    V = jnp.asarray(V)
    U2, V2 = dss.apply_dss_vector(U, V, geom)
    scale = float(jnp.max(jnp.abs(U)))
    np.testing.assert_allclose(np.asarray(U2), np.asarray(U),
                               atol=1e-10 * scale)
    np.testing.assert_allclose(np.asarray(V2), np.asarray(V),
                               atol=1e-10 * scale)


def test_vector_dss_idempotent(geom):
    rng = np.random.default_rng(3)
    A = geom.ne * geom.p
    u = jnp.asarray(rng.normal(size=(6, A, A)))
    v = jnp.asarray(rng.normal(size=(6, A, A)))
    u1, v1 = dss.apply_dss_vector(u, v, geom)
    u2, v2 = dss.apply_dss_vector(u1, v1, geom)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-11)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-11)


def test_dss_level_stack(geom):
    """DSS must broadcast over trailing level dimensions."""
    rng = np.random.default_rng(4)
    A = geom.ne * geom.p
    f = jnp.asarray(rng.normal(size=(6, A, A, 5)))
    out = dss.apply_dss_scalar(f, geom)
    for k in range(5):
        ref = dss.apply_dss_scalar(f[..., k], geom)
        np.testing.assert_allclose(np.asarray(out[..., k]), np.asarray(ref),
                                   atol=1e-12)


# ---------------------------------------------------------------------------
# gather-formulated DSS (parallel/dss_gather.py): must equal the
# scatter DSS to roundoff — scalars, covariant vectors, contravariant
# momenta (HighSpeedDynamics path)
# ---------------------------------------------------------------------------

def test_gather_dss_equals_scatter_dss(geom):
    from tempestmodel_tpu.parallel import dss_gather
    rng = np.random.default_rng(7)
    A = geom.ne * geom.p
    tab = dss_gather.build_dss_tables(geom)
    f = jnp.asarray(rng.normal(size=(6, A, A, 5)))
    np.testing.assert_allclose(
        np.asarray(dss_gather.dss_scalar_gather(f, tab)),
        np.asarray(dss.apply_dss_scalar(f, geom)), atol=1e-14)
    u = jnp.asarray(rng.normal(size=(6, A, A, 5)))
    v = jnp.asarray(rng.normal(size=(6, A, A, 5)))
    un, vn = dss_gather.dss_vector_gather(u, v, tab)
    uo, vo = dss.apply_dss_vector(u, v, geom)
    np.testing.assert_allclose(np.asarray(un), np.asarray(uo), atol=1e-13)
    np.testing.assert_allclose(np.asarray(vn), np.asarray(vo), atol=1e-13)
    # contravariant table vs inverse-transpose edge matrices
    wvc = dss_gather.build_contra_wv(geom)
    contra = jnp.asarray(np.swapaxes(
        np.linalg.inv(np.asarray(geom.edge_mats)), -1, -2))
    un2, vn2 = dss_gather.dss_vector_gather(u, v, tab, wv=wvc)
    uo2, vo2 = dss.apply_dss_vector(u, v, geom, mats=contra)
    np.testing.assert_allclose(np.asarray(un2), np.asarray(uo2), atol=1e-13)
    np.testing.assert_allclose(np.asarray(vn2), np.asarray(vo2), atol=1e-13)
