"""Nonhydrostatic sphere tests: UMJS baroclinic wave background."""

import numpy as np
import jax.numpy as jnp
import pytest

from tempestmodel_tpu.config import ModelConfig, GridKind
from tempestmodel_tpu.models import nh_model
from tempestmodel_tpu.testcases.nonhydro_sphere import BaroclinicWaveUMJS


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
