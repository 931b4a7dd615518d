"""Nonhydrostatic sphere tests: UMJS baroclinic wave background."""

import numpy as np
import jax.numpy as jnp
import pytest

from tempestmodel_tpu.config import ModelConfig, GridKind
from tempestmodel_tpu.models import nh_model
from tempestmodel_tpu.testcases.nonhydro_sphere import BaroclinicWaveUMJS

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def umjs_setup():
    tc = BaroclinicWaveUMJS()
    cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=6, order=4, nz=16,
                      ztop=tc.ztop, dt=300.0, hyperdiffusion=True,
                      nu_scalar=1e15, nu_div=1e15, nu_vort=1e15)
    geom = nh_model.build_nh_sphere_geometry(cfg, ztop=tc.ztop)
    return tc, cfg, geom


def test_umjs_background_bounded(umjs_setup):
    """The balanced zonal jet stays near steady at coarse resolution.

    The pointwise-analytic initial state is not in exact discrete balance;
    the adjustment transient must stay small and bounded (reference behavior
    for ``BaroclinicWaveUMJSTest`` without perturbation).
    """
    tc, cfg, geom = umjs_setup
    ref = tc.reference_state(geom, cfg.constants)
    mass0 = float(jnp.sum(ref["Rho"] * geom.area3d))

    first_step, step = nh_model.make_nh_step(cfg, geom)
    s, carry = first_step(ref)
    for _ in range(19):
        s, carry = step(s, carry)

    dth = np.asarray(s["Rt"] / s["Rho"] - ref["Rt"] / ref["Rho"])
    du = np.asarray(s["U"] - ref["U"]) / cfg.constants.earth_radius
    assert np.isfinite(dth).all()
    assert np.abs(dth).max() < 1.5          # K; coarse-res adjustment only
    assert np.abs(du).max() < 1.0           # m/s drift of the 21 m/s jet
    # physical w from covariant W stays small
    w_phys = np.asarray(s["W"] / geom.deriv_r_int[..., 2])
    assert np.abs(w_phys).max() < 0.5
    # mass conservation (DSS + weak form + implicit solve)
    assert abs(float(jnp.sum(s["Rho"] * geom.area3d)) / mass0 - 1) < 1e-11


def test_umjs_perturbation_grows_nothing_crazy(umjs_setup):
    """With the Exp perturbation the state stays finite and near background."""
    tc, cfg, geom = umjs_setup
    tc = BaroclinicWaveUMJS(pert="exp")
    s0 = tc.initial_state(geom, cfg.constants)
    first_step, step = nh_model.make_nh_step(cfg, geom)
    s, carry = first_step(s0)
    for _ in range(10):
        s, carry = step(s, carry)
    assert np.isfinite(np.asarray(s["Rt"])).all()
    umax = np.abs(np.asarray(s["U"])).max() / cfg.constants.earth_radius
    assert umax < 60.0


# ---------------------------------------------------------------------------
# the remaining nonhydro_sphere battery


def _run(cfg, geom, s0, nsteps):
    first_step, step = nh_model.make_nh_step(cfg, geom)
    s, carry = first_step(s0)
    for _ in range(nsteps - 1):
        s, carry = step(s, carry)
    return s


def test_jw_balanced_background():
    """JW06 balanced state (with its surface-geopotential topography)
    stays near steady: the Newton eta inversion + hydrostatic balance."""
    from tempestmodel_tpu.testcases.nonhydro_sphere import BaroclinicWaveJW
    tc = BaroclinicWaveJW()
    cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=5, order=4, nz=10,
                      ztop=tc.ztop, dt=200.0, hyperdiffusion=True,
                      nu_scalar=1e15, nu_div=1e15, nu_vort=1e15)
    c = cfg.constants
    geom = nh_model.build_nh_sphere_geometry(
        cfg, topography=lambda lon, lat: tc.topography(lon, lat, c))
    ref = tc.reference_state(geom, c)
    s = _run(cfg, geom, ref, 10)
    du = np.asarray(s["U"] - ref["U"]) / c.earth_radius
    assert np.isfinite(du).all()
    assert np.abs(du).max() < 2.0           # m/s drift of the 35 m/s jet
    dth = np.asarray(s["Rt"] / s["Rho"] - ref["Rt"] / ref["Rho"])
    assert np.abs(dth).max() < 3.0


def test_jw_perturbed_runs():
    from tempestmodel_tpu.testcases.nonhydro_sphere import BaroclinicWaveJW
    tc = BaroclinicWaveJW(pert="exp")
    cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=4, order=4, nz=8,
                      ztop=tc.ztop, dt=200.0)
    c = cfg.constants
    geom = nh_model.build_nh_sphere_geometry(
        cfg, topography=lambda lon, lat: tc.topography(lon, lat, c))
    s = _run(cfg, geom, tc.initial_state(geom, c), 5)
    assert np.isfinite(np.asarray(s["Rt"])).all()


def test_inertia_gravity_wave_sphere():
    """DCMIP 3-0-0 on the X=125 reduced planet: theta perturbation
    propagates without blowup; background stays balanced."""
    from tempestmodel_tpu.testcases.nonhydro_sphere import (
        InertiaGravityWaveSphere)
    tc = InertiaGravityWaveSphere()
    from tempestmodel_tpu.constants import PhysicalConstants
    c = tc.constants(PhysicalConstants())
    cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=5, order=4, nz=10,
                      ztop=tc.ztop, dt=1.5, constants=c,
                      hyperdiffusion=False)
    geom = nh_model.build_nh_sphere_geometry(cfg)
    ref = tc.reference_state(geom, c)
    s0 = tc.initial_state(geom, c)
    # perturbation magnitude ~1 K on top of the balanced state
    dth0 = np.asarray(s0["Rt"] / s0["Rho"] - ref["Rt"] / ref["Rho"])
    assert 0.5 < np.abs(dth0).max() < 1.5
    s = _run(cfg, geom, s0, 10)
    dth = np.asarray(s["Rt"] / s["Rho"] - ref["Rt"] / ref["Rho"])
    assert np.isfinite(dth).all()
    assert np.abs(dth).max() < 3.0


def test_mountain_wave_sphere():
    """Wavenumber-6 mountain + Rayleigh sponge: bounded mountain waves."""
    from tempestmodel_tpu.testcases.nonhydro_sphere import MountainWaveSphere
    tc = MountainWaveSphere()
    cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=5, order=4, nz=10,
                      ztop=tc.ztop, dt=200.0, rayleigh_damping=True)
    c = cfg.constants
    geom = nh_model.build_nh_sphere_geometry(
        cfg, topography=lambda lon, lat: tc.topography(lon, lat, c),
        rayleigh=tc.rayleigh_strength)
    ref = tc.reference_state(geom, c)
    s = _run(cfg, geom, ref, 10)
    du = np.asarray(s["U"] - ref["U"]) / c.earth_radius
    assert np.isfinite(du).all()
    assert np.abs(du).max() < 5.0


def test_schar_mountain_sphere():
    """DCMIP 2-x Schar mountain on the X=500 planet."""
    from tempestmodel_tpu.testcases.nonhydro_sphere import ScharMountainSphere
    from tempestmodel_tpu.constants import PhysicalConstants
    tc = ScharMountainSphere()
    c = tc.constants(PhysicalConstants())
    cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=5, order=4, nz=20,
                      ztop=tc.ztop, dt=0.4, constants=c,
                      rayleigh_damping=True, hyperdiffusion=False)
    geom = nh_model.build_nh_sphere_geometry(
        cfg, topography=lambda lon, lat: tc.topography(lon, lat, c),
        rayleigh=tc.rayleigh_strength)
    s = _run(cfg, geom, tc.initial_state(geom, c), 10)
    assert np.isfinite(np.asarray(s["Rt"])).all()
    umax = np.abs(np.asarray(s["U"])).max() / c.earth_radius
    assert umax < 60.0


def test_stationary_mountain_flow():
    """Discrete-balance test: atmosphere at rest over a 2 km mountain
    should develop only small spurious winds."""
    from tempestmodel_tpu.testcases.nonhydro_sphere import (
        StationaryMountainFlow)
    from tempestmodel_tpu.constants import PhysicalConstants
    tc = StationaryMountainFlow()
    c = tc.constants(PhysicalConstants())
    cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=5, order=4, nz=10,
                      ztop=tc.ztop, dt=300.0, constants=c,
                      hyperdiffusion=True,
                      nu_scalar=1e15, nu_div=1e15, nu_vort=1e15)
    geom = nh_model.build_nh_sphere_geometry(
        cfg, topography=lambda lon, lat: tc.topography(lon, lat, c))
    s = _run(cfg, geom, tc.initial_state(geom, c), 10)
    umax = np.abs(np.asarray(s["U"])).max() / c.earth_radius
    assert np.isfinite(umax)
    # The zetam=11.25-degree cos^2 ripples are marginally resolved at ne=5,
    # so the discrete imbalance is sizable but must stay bounded.
    assert umax < 15.0


def test_mountain_rossby_3d():
    from tempestmodel_tpu.testcases.nonhydro_sphere import MountainRossby3D
    tc = MountainRossby3D()
    cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=5, order=4, nz=10,
                      ztop=tc.ztop, dt=200.0, rayleigh_damping=True,
                      hyperdiffusion=True,
                      nu_scalar=1e15, nu_div=1e15, nu_vort=1e15)
    c = cfg.constants
    geom = nh_model.build_nh_sphere_geometry(
        cfg, topography=lambda lon, lat: tc.topography(lon, lat, c),
        rayleigh=tc.rayleigh_strength)
    s = _run(cfg, geom, tc.initial_state(geom, c), 8)
    assert np.isfinite(np.asarray(s["Rt"])).all()
    umax = np.abs(np.asarray(s["U"])).max() / c.earth_radius
    assert umax < 60.0


def test_baldauf_gravity_wave():
    """Baldauf-Brdar wave: rest isothermal + T perturbation, no rotation."""
    from tempestmodel_tpu.testcases.nonhydro_sphere import BaldaufGravityWave
    from tempestmodel_tpu.constants import PhysicalConstants
    tc = BaldaufGravityWave()
    c = tc.constants(PhysicalConstants())
    cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=5, order=4, nz=10,
                      ztop=tc.ztop, dt=100.0, constants=c,
                      hyperdiffusion=False)
    geom = nh_model.build_nh_sphere_geometry(cfg)
    ref = tc.reference_state(geom, c)
    s0 = tc.initial_state(geom, c)
    s = _run(cfg, geom, s0, 10)
    dth = np.asarray(s["Rt"] / s["Rho"] - ref["Rt"] / ref["Rho"])
    assert np.isfinite(dth).all()
    assert np.abs(dth).max() < 3.0


def test_held_suarez_initial_condition():
    """HS isothermal rest + random noise initial state is stable."""
    from tempestmodel_tpu.testcases.nonhydro_sphere import HeldSuarezIC
    tc = HeldSuarezIC()
    cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=4, order=4, nz=10,
                      ztop=tc.ztop, dt=300.0, hyperdiffusion=True,
                      nu_scalar=1e15, nu_div=1e15, nu_vort=1e15)
    geom = nh_model.build_nh_sphere_geometry(cfg)
    s = _run(cfg, geom, tc.initial_state(geom, cfg.constants), 8)
    umax = np.abs(np.asarray(s["U"])).max() / cfg.constants.earth_radius
    assert np.isfinite(umax)
    assert umax < 1.0
