"""End-to-end shallow-water dynamics tests.

Reproduces the reference's physics-verification strategy (SURVEY.md §4):
Williamson TC2 steady geostrophic flow (reference
``test/shallowwater_sphere/SWTest2.cpp``) must stay close to its analytic
steady state, conserve energy, and produce reproducible checksums.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tempestmodel_tpu.config import ModelConfig, ExplicitSubScheme
from tempestmodel_tpu.models import sw_model
from tempestmodel_tpu.models.shallow_water import (sw_tendency, sw_energy)
from tempestmodel_tpu.parallel import dss as dss_mod
from tempestmodel_tpu.testcases.shallow_water import Williamson2
from tempestmodel_tpu.io.diagnostics import error_norms, state_checksums

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tc2_setup():
    cfg = ModelConfig(ne=8, order=4, dt=400.0, hyperdiffusion=False)
    geom = sw_model.build_sw_geometry(cfg)
    state0 = Williamson2().initial_state(geom, cfg.constants)
    return cfg, geom, state0


def test_tc2_steady_tendency_small(tc2_setup):
    """The DSS'd tendency of the TC2 steady state is discretization-small."""
    cfg, geom, s0 = tc2_setup
    t = dss_mod.apply_dss_state_sw(sw_tendency(s0, geom, cfg.constants), geom)
    # relative to the state magnitude and a 1/day timescale
    u_scale = float(jnp.abs(s0["U"]).max()) / 86400.0
    h_scale = float(jnp.abs(s0["H"]).max()) / 86400.0
    assert float(jnp.abs(t["U"]).max()) < 0.05 * u_scale
    assert float(jnp.abs(t["H"]).max()) < 0.05 * h_scale


def test_tc2_one_day_error_and_energy(tc2_setup):
    """One simulated day of TC2 stays allclose to the steady state."""
    cfg, geom, s0 = tc2_setup
    step = sw_model.make_sw_step(cfg, geom)
    e0 = float(sw_energy(s0, geom, cfg.constants))
    s = s0
    for _ in range(216):  # 1 day at dt=400s
        s = step(s)
    en = error_norms(s, s0, geom.area2d)
    assert float(en["H"]["l2_rel"]) < 1e-5
    assert float(en["U"]["l2_rel"]) < 1e-4
    e1 = float(sw_energy(s, geom, cfg.constants))
    assert abs(e1 / e0 - 1.0) < 1e-10
    for name in ("U", "V", "H"):
        assert np.isfinite(np.asarray(s[name])).all()


def test_tc2_hyperdiffusion_stable(tc2_setup):
    """nu4 hyperviscosity branch runs and remains stable/accurate."""
    cfg, geom, s0 = tc2_setup
    cfg = cfg.with_(hyperdiffusion=True, nu_scalar=1.0e15,
                    nu_div=1.0e15, nu_vort=1.0e15)
    step = sw_model.make_sw_step(cfg, geom)
    s = s0
    for _ in range(50):
        s = step(s)
    en = error_norms(s, s0, geom.area2d)
    assert float(en["H"]["l2_rel"]) < 1e-4
    assert np.isfinite(np.asarray(s["H"])).all()


def test_tc2_checksum_reproducible(tc2_setup):
    """Two runs from the same state produce bit-identical checksums."""
    cfg, geom, s0 = tc2_setup
    step = sw_model.make_sw_step(cfg, geom)
    a = step(step(s0))
    b = step(step(s0))
    ca = state_checksums(a, geom.area2d)
    cb = state_checksums(b, geom.area2d)
    for k in ca:
        assert float(ca[k]) == float(cb[k])


@pytest.mark.parametrize("scheme", [ExplicitSubScheme.RK4,
                                    ExplicitSubScheme.SSPRK3,
                                    ExplicitSubScheme.SSPRK53])
def test_tc2_other_erk_schemes(tc2_setup, scheme):
    cfg, geom, s0 = tc2_setup
    cfg = cfg.with_(explicit_scheme=scheme, dt=200.0)
    step = sw_model.make_sw_step(cfg, geom)
    s = s0
    for _ in range(20):
        s = step(s)
    en = error_norms(s, s0, geom.area2d)
    assert float(en["H"]["l2_rel"]) < 1e-5


def test_advection_equation_set():
    """Passive cosine-bell advection in solid-body rotation: shape
    preserved after substantial transport, mass conserved exactly."""
    from tempestmodel_tpu.models import sw_model
    from tempestmodel_tpu.models.advection import make_advection_step
    from tempestmodel_tpu.testcases.shallow_water import (
        sphere_velocity_to_covariant)

    cfg = ModelConfig(ne=8, order=4, dt=1800.0)
    geom = sw_model.build_sw_geometry(cfg)
    c = cfg.constants
    lon = np.asarray(geom.lon)
    lat = np.asarray(geom.lat)
    # solid-body rotation along the equator
    u0 = 2 * np.pi * c.earth_radius / (12.0 * 86400.0)
    U, V = sphere_velocity_to_covariant(
        u0 * np.cos(lat), np.zeros_like(lat), geom, c)
    # cosine bell at (3pi/2, 0)
    r = np.arccos(np.clip(np.cos(lat) * np.cos(lon - 1.5 * np.pi), -1, 1))
    R = 1.0 / 3.0
    q0 = np.where(r < R, 0.5 * (1 + np.cos(np.pi * r / R)), 0.0)
    tr = jnp.asarray(q0[None])

    step = make_advection_step(cfg, geom, (jnp.asarray(U), jnp.asarray(V)))
    m0 = float(jnp.sum(tr[0] * geom.area2d))
    t = 0.0
    for _ in range(48):         # 1 day of transport
        tr = step(tr, t)
        t += cfg.dt
    q = np.asarray(tr[0])
    assert np.isfinite(q).all()
    assert abs(float(jnp.sum(tr[0] * geom.area2d)) / m0 - 1) < 1e-12
    # peak preserved within SE dispersion error; no huge over/undershoot
    assert 0.7 < q.max() < 1.2
    assert q.min() > -0.2
