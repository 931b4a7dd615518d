"""Vertical staggering variants (--vstagger CPH / LEV), reference
``Grid.cpp:265-295`` variable-location table.

The reference's analytic Jacobian supports only Lorenz
(``VerticalDynamicsFEM.cpp:3065``), so there are no CPH/LEV golden
dumps; validation is convergence to the Lorenz solution of the same
PDE under vertical refinement (the staggerings differ at vertical
truncation order) plus stability of the implicit solve.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tempestmodel_tpu.config import ModelConfig, GridKind, VerticalStaggering
from tempestmodel_tpu.models import nh_model, nonhydro
from tempestmodel_tpu.testcases.nonhydro_xz import InertiaGravityWave


def _run_igw(stagger, nz, dt, nsteps):
    tc = InertiaGravityWave()
    enum = {"LOR": VerticalStaggering.LORENZ,
            "CPH": VerticalStaggering.CHARNEY_PHILLIPS,
            "LEV": VerticalStaggering.LEVELS}[stagger]
    cfg = ModelConfig(grid_kind=GridKind.CARTESIAN_XZ, nex=10, ney=1,
                      order=4, nz=nz, ztop=tc.ztop, x_extent=tc.x_extent,
                      y_extent=tc.y_extent, dt=dt, hyperdiffusion=False,
                      vertical_staggering=enum,
                      vertical_solver="dense" if stagger != "LOR"
                      else "banded")
    geom = nh_model.build_nh_cartesian_geometry(cfg)
    s0 = tc.initial_state(geom, cfg.constants, stagger=stagger)
    fs, st = nh_model.make_nh_step(cfg, geom)
    s, c = fs(s0)
    for _ in range(nsteps - 1):
        s, c = st(s, c)
    return s, s0, geom


def test_infer_stagger():
    nz = 6
    mk = lambda n_rt, n_w: {"Rt": np.zeros((1, 1, 1, n_rt)),
                            "W": np.zeros((1, 1, 1, n_w)),
                            "Rho": np.zeros((1, 1, 1, nz))}
    assert nonhydro.infer_stagger(mk(nz, nz + 1), nz) == "LOR"
    assert nonhydro.infer_stagger(mk(nz + 1, nz + 1), nz) == "CPH"
    assert nonhydro.infer_stagger(mk(nz, nz), nz) == "LEV"


@pytest.mark.parametrize("stagger,ratio", [("CPH", 0.45), ("LEV", 0.65)])
def test_stagger_igw_converges_to_lorenz(stagger, ratio):
    """IGW under CPH/LEV converges to the Lorenz solution under
    refinement (measured Rt rel diff per 2x: CPH 0.67 -> 0.17 (~2nd
    order); LEV 0.32 -> 0.17 (~1st order — the boundary-level W rows
    are held, a one-sided closure)."""
    rels = []
    for nz, dt, ns in ((10, 1.0, 20), (20, 0.5, 40)):
        s, s0, geom = _run_igw(stagger, nz, dt, ns)
        sL, s0L, _ = _run_igw("LOR", nz, dt, ns)
        rt = s["Rt"]
        if stagger == "CPH":
            rt = jnp.einsum("KL,...L->...K", geom.interp_i2n, rt)
        assert bool(jnp.isfinite(rt).all())
        d = float(jnp.abs(rt - sL["Rt"]).max())
        sig = float(jnp.abs(sL["Rt"] - s0L["Rt"]).max())
        rels.append(d / sig)
    assert rels[1] < ratio * rels[0], rels
    assert rels[1] < 0.25, rels


@pytest.mark.parametrize("stagger", ["CPH", "LEV"])
def test_stagger_hydrostatic_balance_held(stagger):
    """The unperturbed background stays balanced: after 10 implicit
    steps max |W| remains small relative to the acoustic scale."""
    tc = InertiaGravityWave()
    enum = {"CPH": VerticalStaggering.CHARNEY_PHILLIPS,
            "LEV": VerticalStaggering.LEVELS}[stagger]
    cfg = ModelConfig(grid_kind=GridKind.CARTESIAN_XZ, nex=4, ney=1,
                      order=4, nz=16, ztop=tc.ztop,
                      x_extent=tc.x_extent, y_extent=tc.y_extent,
                      dt=1.0, hyperdiffusion=False,
                      vertical_staggering=enum, vertical_solver="dense")
    geom = nh_model.build_nh_cartesian_geometry(cfg)
    tc2 = InertiaGravityWave(theta_c=0.0)      # no perturbation
    s0 = tc2.initial_state(geom, cfg.constants, stagger=stagger)
    fs, st = nh_model.make_nh_step(cfg, geom)
    s, c = fs(s0)
    for _ in range(29):
        s, c = st(s, c)
    # the discrete-balance adjustment transient (CPH peaks ~5 cm/s,
    # LEV ~0.7 mm/s) must have decayed back below 1 cm/s by step 30
    zxi = (geom.deriv_r[..., 2] if stagger == "LEV"
           else geom.deriv_r_int[..., 2])
    w_phys = s["W"] / zxi
    assert float(jnp.abs(w_phys).max()) < 0.01
    drho = float(jnp.abs(s["Rho"] - s0["Rho"]).max()
                 / jnp.abs(s0["Rho"]).max())
    assert drho < 1e-3
