"""Physics parameterization tests (Held-Suarez, Kessler)."""

import numpy as np
import jax.numpy as jnp

from tempestmodel_tpu.physics.kessler import kessler_column_update
import pytest

pytestmark = pytest.mark.slow


def test_kessler_rain_cycle():
    """Repeated Kessler calls: condensation -> autoconversion -> rain ->
    surface precipitation, with water mass closed except precip."""
    nz = 30
    z = jnp.linspace(100.0, 12000.0, nz)[None, :]
    rho = jnp.asarray(np.exp(-np.asarray(z) / 8000.0) * 1.2)
    pk = jnp.asarray(np.exp(-np.asarray(z) / 8000.0) ** 0.2875)
    theta = jnp.full((1, nz), 300.0)
    # moderately supersaturated lower atmosphere
    qv = jnp.asarray(0.030 * np.exp(-np.asarray(z) / 8000.0))
    qc = jnp.zeros((1, nz))
    qr = jnp.zeros((1, nz))

    precl_total = 0.0
    for _ in range(60):
        theta, qv, qc, qr, precl = kessler_column_update(
            theta, qv, qc, qr, rho, pk, z, 30.0)
        precl_total += float(precl[0]) * 30.0

    assert bool(jnp.isfinite(theta).all())
    assert float(qc.max()) > 1e-5          # cloud water present
    assert float(qr.max()) > 1e-6          # rain formed
    assert precl_total > 0.0               # rain reached the surface
    assert float(qv.min()) >= 0.0
    assert float(qr.min()) >= 0.0


def test_kessler_dry_column_noop():
    """A dry, subsaturated column is (almost) untouched."""
    nz = 20
    z = jnp.linspace(100.0, 10000.0, nz)[None, :]
    rho = jnp.asarray(np.exp(-np.asarray(z) / 8000.0) * 1.2)
    pk = jnp.asarray(np.exp(-np.asarray(z) / 8000.0) ** 0.2875)
    theta = jnp.full((1, nz), 300.0)
    qv = jnp.full((1, nz), 1e-6)           # far below saturation
    qc = jnp.zeros((1, nz))
    qr = jnp.zeros((1, nz))
    th2, qv2, qc2, qr2, precl = kessler_column_update(
        theta, qv, qc, qr, rho, pk, z, 30.0)
    np.testing.assert_allclose(np.asarray(th2), 300.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qv2), 1e-6, atol=1e-12)
    assert float(precl[0]) == 0.0


def test_dcmip_simple_physics_column():
    """Simple-physics kernel: saturated column precipitates, surface drag
    slows the wind, PBL mixing conserves column moisture (no surface flux
    for dry surface air at saturation)."""
    from tempestmodel_tpu.physics.dcmip_simple import simple_physics_update
    nz = 20
    # hydrostatic-ish columns, k=0 at surface
    pint = jnp.linspace(1.0e5, 1.0e4, nz + 1)[None, :]
    pmid = 0.5 * (pint[:, :-1] + pint[:, 1:])
    t = jnp.linspace(300.0, 210.0, nz)[None, :]
    q = jnp.full((1, nz), 0.02)
    u = jnp.full((1, nz), 20.0)
    v = jnp.zeros((1, nz))
    ps = pint[:, 0]
    tsurf = jnp.full((1,), 302.15)
    u2, v2, t2, q2, precl = simple_physics_update(
        u, v, t, q, pmid, pint, ps, tsurf, dt=300.0)
    assert bool(jnp.isfinite(t2).all())
    assert float(precl[0]) > 0.0               # condensation rained out
    assert float(u2[0, 0]) < 20.0              # surface drag
    assert float(t2.max()) < 330.0
    assert float(q2.min()) >= 0.0


def test_dcmip_simple_physics_in_model():
    from tempestmodel_tpu.physics.dcmip_simple import DCMIPSimplePhysics
    from tempestmodel_tpu.testcases.dcmip2016 import TropicalCyclone
    from tempestmodel_tpu.model import Model
    from tempestmodel_tpu.config import ModelConfig, GridKind, EquationSet
    tc = TropicalCyclone()
    cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=4, order=4, nz=10,
                      ztop=tc.ztop, dt=200.0, hyperdiffusion=True,
                      nu_scalar=1e16, nu_div=1e16, nu_vort=1e16,
                      equation_set=EquationSet.PRIMITIVE_NONHYDRO)
    m = Model(cfg, tc, workflow_processes=[DCMIPSimplePhysics(interval=0.0)])
    m.go(nsteps=3)
    assert np.isfinite(np.asarray(m.state["Rt"])).all()
    assert float(m.state["Tracers"].min()) >= -1e-10
