"""Battery-completion tests: the remaining reference test cases.

Covers the reference binaries not exercised elsewhere:
``RobertBubbleCartesianTest``, ``ThermalBubbleCartesian3DTest``,
``HydrostaticMountainCartesianTest``, ``NonHydroMountainCartesianTest``,
``Baroclinic3DCartesianTest`` (+Ridge), ``ShallowWaterEddyTest``.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tempestmodel_tpu.config import ModelConfig, GridKind
from tempestmodel_tpu.models import nh_model
from tempestmodel_tpu.testcases.nonhydro_xz import (
    RobertBubble, ThermalBubble3D, HydrostaticMountain, NonHydroMountain,
    Baroclinic3DChannel)
from tempestmodel_tpu.testcases.shallow_water import ShallowWaterEddy

pytestmark = pytest.mark.slow


def test_robert_bubble_rises():
    tc = RobertBubble()
    cfg = ModelConfig(grid_kind=GridKind.CARTESIAN_XZ, nex=10, ney=1,
                      order=4, nz=24, ztop=tc.ztop, x_extent=tc.x_extent,
                      y_extent=tc.y_extent, dt=0.05, hyperdiffusion=False)
    geom = nh_model.build_nh_cartesian_geometry(cfg)
    s = tc.initial_state(geom, cfg.constants)
    first_step, step = nh_model.make_nh_step(cfg, geom)
    s, carry = first_step(s)
    for _ in range(99):
        s, carry = step(s, carry)
    thp = np.asarray(s["Rt"] / s["Rho"]) - tc.theta_bar
    assert np.isfinite(thp).all()
    assert -0.2 < thp.min() and thp.max() < 0.6
    # bubble accelerates upward
    w_phys = np.asarray(s["W"]) / np.asarray(geom.deriv_r_int[..., 2])
    assert w_phys.max() > 1e-3


def test_thermal_bubble_3d_step():
    tc = ThermalBubble3D()
    cfg = ModelConfig(grid_kind=GridKind.CARTESIAN_3D, nex=6, ney=6,
                      order=4, nz=16, ztop=tc.ztop, x_extent=tc.x_extent,
                      y_extent=tc.y_extent, dt=0.05, hyperdiffusion=False)
    geom = nh_model.build_nh_cartesian_geometry(cfg)
    s0 = tc.initial_state(geom, cfg.constants)
    # perturbation is spherical: max on the y=500 line
    thp0 = np.asarray(s0["Rt"] / s0["Rho"]) - tc.theta_bar
    assert abs(thp0.max() - tc.theta_c) < 2e-2
    first_step, step = nh_model.make_nh_step(cfg, geom)
    s, carry = first_step(s0)
    for _ in range(19):
        s, carry = step(s, carry)
    thp = np.asarray(s["Rt"] / s["Rho"]) - tc.theta_bar
    assert np.isfinite(thp).all()
    assert thp.max() < 0.6
    # mass conserved exactly
    m0 = float(jnp.sum(s0["Rho"] * geom.area3d))
    assert abs(float(jnp.sum(s["Rho"] * geom.area3d)) / m0 - 1) < 1e-12


@pytest.mark.parametrize("case", [HydrostaticMountain(), NonHydroMountain()])
def test_mountain_wave_cases_stable(case):
    cfg = ModelConfig(grid_kind=GridKind.CARTESIAN_XZ, nex=12, ney=1,
                      order=4, nz=20, ztop=case.ztop, x_extent=case.x_extent,
                      y_extent=case.y_extent, dt=0.5, hyperdiffusion=False)
    geom = nh_model.build_nh_cartesian_geometry(
        cfg, topography=case.topography, rayleigh=case.rayleigh_strength)
    assert float(jnp.max(geom.topo)) > 0.5 * case.h_c
    s = case.initial_state(geom, cfg.constants)
    first_step, step = nh_model.make_nh_step(cfg, geom)
    s, carry = first_step(s)
    for _ in range(29):
        s, carry = step(s, carry)
    for k, v in s.items():
        assert bool(jnp.isfinite(v).all()), k
    # background flow is retained to leading order
    u = np.asarray(s["U"])
    assert abs(u.mean() - case.u0) < 0.5 * abs(case.u0)


def test_baroclinic3d_channel_balance():
    tc = Baroclinic3DChannel()
    cfg = ModelConfig(grid_kind=GridKind.CARTESIAN_3D, nex=10, ney=4,
                      order=4, nz=10, ztop=tc.ztop, x_extent=tc.x_extent,
                      y_extent=tc.y_extent, dt=100.0, hyperdiffusion=False)
    geom = nh_model.build_nh_cartesian_geometry(
        cfg, rayleigh=tc.rayleigh_strength, bc_y=tc.bc_y,
        reference_latitude=tc.reference_latitude)
    ref = tc.reference_state(geom, cfg.constants)
    # hydrostatic + geostrophic balance: the unperturbed state is steady
    first_step, step = nh_model.make_nh_step(cfg, geom, ref_state=ref)
    s, carry = first_step(ref)
    for _ in range(9):
        s, carry = step(s, carry)
    for k, v in s.items():
        assert bool(jnp.isfinite(v).all()), k
    du = np.abs(np.asarray(s["U"]) - np.asarray(ref["U"])).max()
    u_scale = np.abs(np.asarray(ref["U"])).max()
    assert du < 0.2 * u_scale
    # perturbed initial state differs by ~u_p
    s0 = tc.initial_state(geom, cfg.constants)
    dup = np.abs(np.asarray(s0["U"]) - np.asarray(ref["U"])).max()
    assert 0.5 * tc.u_p < dup <= tc.u_p * 1.01


def test_baroclinic3d_noflux_y_walls():
    """The channel's y walls are no-flux: the Strang stepper must thread
    the halo shadows (regression for the bc_x-only gating bug) and the
    normal velocity V at the walls must stay ~0 while the interior jet
    stays O(u0)."""
    tc = Baroclinic3DChannel()
    cfg = ModelConfig(grid_kind=GridKind.CARTESIAN_3D, nex=8, ney=4,
                      order=4, nz=8, ztop=tc.ztop, x_extent=tc.x_extent,
                      y_extent=tc.y_extent, dt=100.0, hyperdiffusion=False)
    geom = nh_model.build_nh_cartesian_geometry(
        cfg, bc_y=tc.bc_y, reference_latitude=tc.reference_latitude)
    assert geom.bc_y == "noflux"
    s = tc.initial_state(geom, cfg.constants)
    first_step, step = nh_model.make_nh_step(cfg, geom)
    s, carry = first_step(s)
    # halo-shadow mechanism must be active for y-only no-flux grids
    assert isinstance(carry, dict) and "halo" in carry
    for _ in range(9):
        s, carry = step(s, carry)
    v = np.asarray(s["V"])
    v_wall = max(np.abs(v[:, :, 0]).max(), np.abs(v[:, :, -1]).max())
    v_int = np.abs(v[:, :, 1:-1]).max()
    u_scale = np.abs(np.asarray(s["U"])).max()
    assert np.isfinite(v).all()
    # wall-normal velocity bounded far below the flow scale
    assert v_wall < 0.05 * u_scale
    assert v_wall < 0.5 * max(v_int, 1e-30)


def test_baroclinic3d_ridge_topography():
    tc = Baroclinic3DChannel(ridge=True)
    x = np.linspace(*tc.x_extent, 101)
    h = tc.topography(x, np.zeros_like(x))
    # peak value hC/2 at exactly x = 2*Xc
    assert abs(tc.topography(np.array([2 * tc.x_c]), np.zeros(1))[0]
               - tc.ridge_h / 2.0) < 1e-9 * tc.ridge_h
    assert np.argmax(h) == np.argmin(np.abs(x - 2 * tc.x_c))


def test_shallow_water_eddy_initial_and_step():
    import dataclasses
    from tempestmodel_tpu.models import sw_model
    tc = ShallowWaterEddy()
    cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=6, order=4,
                      nz=1, dt=120.0, hyperdiffusion=False)
    # the reference runs this case with omega = 0 (EvaluatePhysicalConstants)
    cfg = dataclasses.replace(
        cfg, constants=tc.physical_constants(cfg.constants))
    assert cfg.constants.omega == 0.0
    geom = sw_model.build_sw_geometry(cfg)
    s = tc.initial_state(geom, cfg.constants)
    h0 = np.asarray(s["H"])
    assert np.isfinite(h0).all()
    # symmetric double jet: balanced height is even in latitude
    # (check the unperturbed field; the integrand is odd in lat)
    tc0 = ShallowWaterEddy(h_hat=0.0)
    hs = np.asarray(tc0.initial_state(
        geom, tc0.physical_constants(cfg.constants))["H"])
    lat = np.asarray(geom.lat)
    north = (lat > 0.6) & (lat < 0.8)
    south = (lat < -0.6) & (lat > -0.8)
    assert abs(hs[north].mean() - hs[south].mean()) < 5.0
    step = sw_model.make_sw_step(cfg, geom)
    for _ in range(10):
        s = step(s)
    assert bool(jnp.isfinite(s["H"]).all())
    assert np.asarray(s["H"]).min() > 8000.0


def test_shallow_water_eddy_rotated():
    tc = ShallowWaterEddy(alpha=np.pi / 4.0)
    lon = np.linspace(0.0, 2 * np.pi, 41)[None, :]
    lat = np.linspace(-1.4, 1.4, 31)[:, None]
    ulon, ulat, h = tc.evaluate(lon + 0 * lat, lat + 0 * lon,
                                type("C", (), {
                                    "earth_radius": 6.37122e6,
                                    "omega": 7.292e-5, "g": 9.80616})())
    assert np.isfinite(ulon).all() and np.isfinite(ulat).all()
    assert np.isfinite(h).all()
    # rotation produces meridional flow
    assert np.abs(ulat).max() > 1.0


def test_baroclinic3d_ridge_runs():
    """Ridge variant end-to-end: terrain-following metric over the
    meridional ridge + no-flux y walls, 6 steps stay finite and the
    jet stays O(u0) (Baroclinic3DCartesianRidgeTest.cpp)."""
    tc = Baroclinic3DChannel(ridge=True)
    cfg = ModelConfig(grid_kind=GridKind.CARTESIAN_3D, nex=8, ney=4,
                      order=4, nz=8, ztop=tc.ztop, x_extent=tc.x_extent,
                      y_extent=tc.y_extent, dt=100.0, hyperdiffusion=False)
    geom = nh_model.build_nh_cartesian_geometry(
        cfg, bc_y=tc.bc_y, topography=tc.topography,
        reference_latitude=tc.reference_latitude)
    assert float(np.abs(np.asarray(geom.topo)).max()) > 100.0
    s = tc.initial_state(geom, cfg.constants)
    first_step, step = nh_model.make_nh_step(cfg, geom)
    s, carry = first_step(s)
    for _ in range(5):
        s, carry = step(s, carry)
    u = np.asarray(s["U"])
    assert np.isfinite(u).all()
    u_scale = np.abs(np.asarray(
        tc.initial_state(geom, cfg.constants)["U"])).max()
    assert np.abs(u).max() < 3.0 * u_scale
