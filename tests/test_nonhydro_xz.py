"""End-to-end nonhydrostatic x-z tests (HEVI Strang stepping).

Reproduces the reference's physics-verification strategy on the
``test/nonhydro_xz`` cases at reduced resolution: hydrostatic balance
retention, thermal-bubble physics, and exact tracer-mass conservation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tempestmodel_tpu.config import ModelConfig, GridKind
from tempestmodel_tpu.models import nh_model
from tempestmodel_tpu.testcases.nonhydro_xz import ThermalBubble

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def bubble_setup():
    tc = ThermalBubble()
    cfg = ModelConfig(grid_kind=GridKind.CARTESIAN_XZ, nex=12, ney=1,
                      order=4, nz=24, ztop=tc.ztop, x_extent=tc.x_extent,
                      y_extent=tc.y_extent, dt=0.05, hyperdiffusion=False)
    geom = nh_model.build_nh_cartesian_geometry(cfg)
    return tc, cfg, geom


def test_hydrostatic_balance_retained(bubble_setup):
    """The discrete hydrostatic background stays steady (W stays ~0)."""
    tc, cfg, geom = bubble_setup
    ref = tc.reference_state(geom, cfg.constants)
    first_step, step = nh_model.make_nh_step(cfg, geom)
    s, carry = first_step(ref)
    for _ in range(40):
        s, carry = step(s, carry)
    dth = np.asarray(s["Rt"] / s["Rho"]) - 300.0
    assert np.abs(dth).max() < 1e-9
    assert np.abs(np.asarray(s["W"])).max() < 1e-6


def test_thermal_bubble_physics(bubble_setup):
    """Bubble stays bounded, rises, and conserves mass exactly."""
    tc, cfg, geom = bubble_setup
    s0 = tc.initial_state(geom, cfg.constants)
    first_step, step = nh_model.make_nh_step(cfg, geom)

    mass0 = float(jnp.sum(s0["Rho"] * geom.area3d))
    rt0 = float(jnp.sum(s0["Rt"] * geom.area3d))

    z = np.asarray(geom.z_lev)
    area = np.asarray(geom.area3d)

    def com_height(s):
        thp = np.asarray(s["Rt"] / s["Rho"]) - 300.0
        thp = np.maximum(thp, 0.0)
        return float((thp * z * area).sum() / (thp * area).sum())

    z_start = com_height(s0)
    s, carry = first_step(s0)
    for _ in range(199):          # 10 s
        s, carry = step(s, carry)

    thp = np.asarray(s["Rt"] / s["Rho"]) - 300.0
    assert np.isfinite(thp).all()
    # perturbation stays near its initial range (no spurious amplification)
    assert thp.max() < 0.6
    assert thp.min() > -0.2
    # bubble rises (buoyant acceleration ~g*theta'/theta ~ 0.016 m/s^2)
    assert com_height(s) > z_start + 0.1
    # physical vertical velocity (covariant W / dz/dxi) is upward, sane
    w_phys = np.asarray(s["W"]) / np.asarray(geom.deriv_r_int[..., 2])
    assert 0.01 < np.abs(w_phys).max() < 5.0
    # exact conservation of mass and rho*theta
    assert abs(float(jnp.sum(s["Rho"] * geom.area3d)) / mass0 - 1) < 1e-12
    assert abs(float(jnp.sum(s["Rt"] * geom.area3d)) / rt0 - 1) < 1e-12


def test_bubble_with_hyperdiffusion(bubble_setup):
    """The nu4 hyperdiffusion tail runs stably on the nonhydro state."""
    tc, cfg, geom = bubble_setup
    cfg = cfg.with_(hyperdiffusion=True, nu_scalar=1.0e-1, nu_div=1.0e-1,
                    nu_vort=1.0e-1)
    s0 = tc.initial_state(geom, cfg.constants)
    first_step, step = nh_model.make_nh_step(cfg, geom)
    s, carry = first_step(s0)
    for _ in range(20):
        s, carry = step(s, carry)
    assert np.isfinite(np.asarray(s["Rt"])).all()
    thp = np.asarray(s["Rt"] / s["Rho"]) - 300.0
    assert thp.max() < 0.6


def test_tracer_transport(bubble_setup):
    """Tracers advect, conserve mass exactly, and stay nonnegative."""
    import jax.numpy as jnp
    tc, cfg, geom = bubble_setup
    s0 = dict(tc.initial_state(geom, cfg.constants))
    # tracer blob colocated with the bubble
    x = np.asarray(geom.x)[None, :, None, None]
    z = np.asarray(geom.z_lev)
    q = np.exp(-(((np.broadcast_to(x, z.shape) - 500.0) / 150.0) ** 2
                 + ((z - 350.0) / 150.0) ** 2))
    s0["Tracers"] = jnp.asarray(
        (q * np.asarray(s0["Rho"]))[None], dtype=s0["Rho"].dtype)

    first_step, step = nh_model.make_nh_step(cfg, geom)
    m0 = float(jnp.sum(s0["Tracers"][0] * geom.area3d))
    s, carry = first_step(s0)
    for _ in range(60):
        s, carry = step(s, carry)
    tr = np.asarray(s["Tracers"][0])
    assert np.isfinite(tr).all()
    assert tr.min() >= 0.0
    m1 = float(jnp.sum(s["Tracers"][0] * geom.area3d))
    assert abs(m1 / m0 - 1.0) < 1e-10
    # the blob must move with the flow (field changed measurably)
    d0 = np.abs(tr - np.asarray(s0["Tracers"][0])).max()
    assert d0 > 1e-6


def test_rayleigh_damping_relaxes(bubble_setup):
    """Rayleigh layer relaxes the perturbation towards the reference."""
    import jax.numpy as jnp
    tc, cfg, geom0 = bubble_setup
    geom = nh_model.build_nh_cartesian_geometry(
        cfg, rayleigh=lambda z: np.where(z > 500.0, 5.0, 0.0))
    cfg = cfg.with_(rayleigh_damping=True)
    ref = tc.reference_state(geom, cfg.constants)
    s0 = dict(tc.initial_state(geom, cfg.constants))
    # seed a W perturbation in the damped layer
    s0["W"] = s0["W"] + 100.0 * np.exp(
        -((np.asarray(geom.z_int) - 800.0) / 100.0) ** 2)
    first_step, step = nh_model.make_nh_step(cfg, geom, ref_state=ref)
    s, carry = first_step(s0)
    for _ in range(20):
        s, carry = step(s, carry)
    # upper-level W must decay strongly vs the undamped run
    cfg_nod = cfg.with_(rayleigh_damping=False)
    first_nod, step_nod = nh_model.make_nh_step(cfg_nod, geom)
    sn, cn = first_nod(s0)
    for _ in range(20):
        sn, cn = step_nod(sn, cn)
    w_damped = float(jnp.abs(s["W"][..., -8:]).max())
    w_undamped = float(jnp.abs(sn["W"][..., -8:]).max())
    assert w_damped < 0.3 * w_undamped


def test_schar_mountain_waves():
    """Terrain-following metric: flow over the Schar mountain produces
    bounded mountain waves (exercises topography + Rayleigh sponge)."""
    from tempestmodel_tpu.testcases.nonhydro_xz import ScharMountain
    from tempestmodel_tpu.model import Model
    from tempestmodel_tpu.config import EquationSet
    tc = ScharMountain()
    cfg = ModelConfig(grid_kind=GridKind.CARTESIAN_XZ, nex=20, ney=1,
                      order=4, nz=20, ztop=tc.ztop, x_extent=tc.x_extent,
                      y_extent=tc.y_extent, dt=1.0, hyperdiffusion=True,
                      nu_scalar=1e7, nu_div=1e7, nu_vort=1e7,
                      rayleigh_damping=True,
                      equation_set=EquationSet.PRIMITIVE_NONHYDRO)
    m = Model(cfg, tc)
    # terrain is seen by the metric
    assert float(np.abs(np.asarray(m.geom.topo)).max()) > 100.0
    assert float(np.abs(np.asarray(m.geom.con_a_xi)).max()) > 0.0
    m.go(nsteps=120)   # 2 minutes
    w_phys = np.asarray(m.state["W"] / m.geom.deriv_r_int[..., 2])
    assert np.isfinite(w_phys).all()
    # waves develop over the mountain but remain bounded
    assert 1e-3 < np.abs(w_phys).max() < 10.0
    theta = np.asarray(m.state["Rt"] / m.state["Rho"])
    assert theta.min() > 200.0


def test_density_current_develops():
    from tempestmodel_tpu.testcases.nonhydro_xz import DensityCurrent
    from tempestmodel_tpu.model import Model
    from tempestmodel_tpu.config import EquationSet
    tc = DensityCurrent()
    cfg = ModelConfig(grid_kind=GridKind.CARTESIAN_XZ, nex=16, ney=1,
                      order=4, nz=16, ztop=tc.ztop, x_extent=tc.x_extent,
                      y_extent=tc.y_extent, dt=0.25, hyperdiffusion=True,
                      nu_scalar=1e7, nu_div=1e7, nu_vort=1e7,
                      rayleigh_damping=True,
                      equation_set=EquationSet.PRIMITIVE_NONHYDRO)
    m = Model(cfg, tc)
    m.go(nsteps=120)   # 30 s
    thp = np.asarray(m.state["Rt"] / m.state["Rho"]) - 300.0
    assert np.isfinite(thp).all()
    # cold blob descends: negative perturbation persists, downdraft forms
    assert thp.min() < -2.0
    w_phys = np.asarray(m.state["W"] / m.geom.deriv_r_int[..., 2])
    assert w_phys.min() < -0.5          # sinking air


def test_explicit_vertical_bubble():
    """--explicitvertical: fully-explicit vertical integration matches the
    HEVI solution closely at a vertically-CFL-stable dt."""
    from tempestmodel_tpu.model import Model
    from tempestmodel_tpu.config import EquationSet, TimestepSchemeType
    tc = ThermalBubble()
    base = dict(grid_kind=GridKind.CARTESIAN_XZ, nex=8, ney=1, order=4,
                nz=16, ztop=tc.ztop, x_extent=tc.x_extent,
                y_extent=tc.y_extent, dt=0.02, hyperdiffusion=False,
                equation_set=EquationSet.PRIMITIVE_NONHYDRO)
    m_exp = Model(ModelConfig(**base, timescheme=TimestepSchemeType.ERK,
                              explicit_vertical=True), tc)
    m_imp = Model(ModelConfig(**base), tc)
    m_exp.go(nsteps=50)
    m_imp.go(nsteps=50)
    for k in ("Rt", "Rho"):
        a = np.asarray(m_exp.state[k])
        b = np.asarray(m_imp.state[k])
        assert np.isfinite(a).all()
        rel = np.abs(a - b).max() / np.abs(b).max()
        assert rel < 1e-5, (k, rel)
