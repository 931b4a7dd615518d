"""Split-explicit (SPEX) dynamics tests.

Reference family: ``SplitExplicitDynamics.{h,cpp}`` +
``TimestepSchemeSplitExp.cpp`` (``--hmethod SPEX``): KGU35 macro-stages,
3 acoustic subcycles each, off-centered implicit vertical acoustics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempestmodel_tpu.config import ModelConfig, GridKind, TimestepSchemeType
from tempestmodel_tpu.models import nh_model, nonhydro
from tempestmodel_tpu.testcases.nonhydro_xz import ThermalBubble

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def bubble_cfgs():
    tc = ThermalBubble()
    base = dict(grid_kind=GridKind.CARTESIAN_XZ, nex=8, ney=1, order=4,
                nz=16, ztop=tc.ztop, x_extent=tc.x_extent,
                y_extent=tc.y_extent, hyperdiffusion=False)
    return tc, base


def _run(tc, base, ts, dt, T):
    cfg = ModelConfig(dt=dt, timescheme=ts, **base)
    geom = nh_model.build_nh_cartesian_geometry(cfg)
    s = tc.initial_state(geom, cfg.constants)
    first, step = nh_model.make_nh_step(cfg, geom)
    s, c = first(s)
    for _ in range(round(T / dt) - 1):
        s, c = step(s, c)
    return s


def test_fast_jvp_exact(bubble_cfgs):
    """The analytic fast-operator JVP matches AD of an independently
    written fast residual."""
    from tempestmodel_tpu.models.split_explicit import fast_column_multi_jvp
    from tempestmodel_tpu.models.nonhydro import exner_from_rhotheta
    tc, base = bubble_cfgs
    cfg = ModelConfig(dt=0.1, **base)
    geom = nh_model.build_nh_cartesian_geometry(cfg)
    s0 = tc.initial_state(geom, cfg.constants)
    nz = geom.nz
    x0, aux, gmats, _ = nonhydro._implicit_aux(s0, geom)

    def fast_resid(x, a):
        g, c = gmats, cfg.constants
        rt, w, rho = x[:nz], x[nz:2 * nz + 1], x[2 * nz + 1:]
        rho_i = g["interp_n2i"] @ rho
        rt_i = g["interp_n2i"] @ rt
        dpi_i = g["diff_n2i"] @ exner_from_rhotheta(rt, c)
        xid = (a["con_a_xi_int"] * a["u_i"] + a["con_b_xi_int"] * a["v_i"]
               + a["con_xi_xi_int"] * w).at[0].set(0.).at[-1].set(0.)
        mf = (a["jac_int"] * rho_i * xid).at[0].set(0.).at[-1].set(0.)
        pf = (a["jac_int"] * rt_i * xid).at[0].set(0.).at[-1].set(0.)
        return jnp.concatenate([
            (g["diff_i2n"] @ pf) / a["jac"],
            (dpi_i * rt_i / rho_i).at[0].set(0.).at[-1].set(0.),
            (g["diff_i2n"] @ mf) / a["jac"]])

    def br(xs):
        return jax.vmap(fast_resid)(xs, aux)

    t = jnp.asarray(
        np.random.default_rng(7).standard_normal((1,) + x0.shape))
    _, jv_ad = jax.jvp(br, (x0,), (t[0],))
    jv_an = fast_column_multi_jvp(x0, aux, gmats, cfg.constants, nz, t)[0]
    scale = float(jnp.abs(jv_ad).max())
    assert float(jnp.abs(jv_ad - jv_an).max()) < 1e-12 * scale


def test_spex_stable_and_converges_to_strang(bubble_cfgs):
    """SPEX stays finite on the bubble and approaches the Strang-HEVI
    solution as dt -> 0 (acoustic off-centering is O(dt) dissipative,
    so convergence between the schemes is first order)."""
    tc, base = bubble_cfgs
    T = 0.8
    ref = _run(tc, base, TimestepSchemeType.STRANG, 0.05, T)
    d_coarse = _run(tc, base, TimestepSchemeType.SPEX, 0.2, T)
    d_fine = _run(tc, base, TimestepSchemeType.SPEX, 0.05, T)
    for s in (d_coarse, d_fine):
        for k in ("U", "W", "Rt", "Rho"):
            assert np.isfinite(np.asarray(s[k])).all()
    err_c = float(jnp.abs(d_coarse["Rt"] - ref["Rt"]).max())
    err_f = float(jnp.abs(d_fine["Rt"] - ref["Rt"]).max())
    assert err_f < 0.5 * err_c          # shrinks with dt
    # absolute agreement on the thermodynamic fields at matched dt
    assert err_f < 1e-3 * float(jnp.abs(ref["Rt"]).max())
