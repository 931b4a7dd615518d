"""Fused Pallas TPU kernels for the nu4 hyperdiffusion tail.

The Strang tail (reference ``StepAfterSubCycle``,
``HorizontalDynamicsFEM.cpp:2637-2726``) is two horizontal Laplacian
passes with a DSS between them.  The XLA formulation
(``engine.step_after_subcycle`` order-4 branch) costs ~40 kernels of
derivative einsums and elementwise glue per step; here each pass is ONE
kernel over (panel, A-chunk) tiles reusing the stage-kernel derivative
machinery (``stage_pallas._da/_db``): pass 1 produces the unscaled
Laplacian "work" fields, pass 2 applies the scaled second Laplacian and
the axpy onto the state.  The math matches the XLA path bitwise-close
(same contraction order); the DSS calls between/after stay in
``dss_pallas.dss_state`` (with the Rayleigh finish fused there).

Restriction: order-4 hyperviscosity on the cubed sphere with a
z-constant 3-D Jacobian (true for the Gal-Chen vertical of
``grid/geometry.py``: jac3d = (ztop - zs) * jac2d on every level) —
the Laplacian's 1/J then needs only (6, A, B) metric reads instead of
full (nz, 6, A, B) fields.  ``supported()`` guards this; other configs
use the XLA path.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stage_pallas import _da, _db

FIELDS = ("U", "V", "Rt", "Rho", "W")


def supported(fg, cfg) -> bool:
    jac = np.asarray(fg.jac3d)
    jac_i = np.asarray(fg.jac3d_int)
    # the kernels use jac3d[0] for W's Laplacian where the XLA path uses
    # jac3d_int, so require the level/interface Jacobians to AGREE, not
    # just be z-constant each
    return (cfg.hypervis_order == 4 and fg.vo >= 1
            and fg.A % 8 == 0 and fg.p <= 8 and 8 % fg.p == 0
            and bool(np.all(jac == jac[0:1]))
            and bool(np.all(jac_i == jac_i[0:1]))
            and np.allclose(jac[0], jac_i[0], rtol=1e-12, atol=0.0))


def _rd(ref):
    x = ref[...]
    return x.reshape(x.shape[0], x.shape[2], x.shape[3])


def _scalar_lap(f, jinv, c2aa, c2ab, c2ba, c2bb, jac, D, S, SdT, DAT,
                delta, p):
    """engine.scalar_laplacian on a (K, ac, B) tile (jac = z-const J)."""
    da = _da(f, D, delta, p)
    db = _db(f, DAT)
    ga = jac * (c2aa * da + c2ab * db)
    gb = jac * (c2ba * da + c2bb * db)
    # hweak_div = -(Sd@ga + gb@Sd^T)
    return -(_da(ga, S.T, delta, p) + _db(gb, SdT)) * jinv


def _vector_upd(u, v, nu_div, nu_vort, c2aa, c2ab, c2ba, c2bb, j2, j2inv,
                D, S, SdT, DAT, delta, p):
    """engine.vector_hyperdiff_update on a tile; returns (du, dv)."""
    con_u = c2aa * u + c2ab * v
    con_v = c2ba * u + c2bb * v
    div = (_da(j2 * con_u, D, delta, p) + _db(j2 * con_v, DAT)) * j2inv
    curl = (_da(v, D, delta, p) - _db(u, DAT)) * j2inv
    wda_div = -_da(div, S.T, delta, p)
    wdb_div = -_db(div, SdT)
    wda_curl = -_da(curl, S.T, delta, p)
    wdb_curl = -_db(curl, SdT)
    du = nu_div * wda_div - nu_vort * j2 * (
        c2ba * wda_curl + c2bb * wdb_curl)
    dv = nu_div * wdb_div + nu_vort * j2 * (
        c2aa * wda_curl + c2ab * wdb_curl)
    return du, dv


def _pass1_kernel(p, delta, D, S,
                  u_ref, v_ref, rt_ref, rho_ref, w_ref, m2d_ref,
                  SdT_ref, DAT_ref,
                  ou_ref, ov_ref, ort_ref, orho_ref, ow_ref):
    m2d = _rd(m2d_ref)       # (8, ac, B): c2aa..c2bb, j2, j2inv, jl, jlinv
    c2aa, c2ab = m2d[0:1], m2d[1:2]
    c2ba, c2bb = m2d[2:3], m2d[3:4]
    j2, j2inv = m2d[4:5], m2d[5:6]
    jl, jlinv = m2d[6:7], m2d[7:8]
    SdT = SdT_ref[...]
    DAT = DAT_ref[...]

    wu, wv = _vector_upd(_rd(u_ref), _rd(v_ref), 1.0, 1.0,
                         c2aa, c2ab, c2ba, c2bb, j2, j2inv,
                         D, S, SdT, DAT, delta, p)

    def wr(ref, val):
        K, ac, B = val.shape
        ref[...] = val.reshape(K, 1, ac, B)

    wr(ou_ref, -wu)
    wr(ov_ref, -wv)
    for ref, out in ((rt_ref, ort_ref), (rho_ref, orho_ref),
                     (w_ref, ow_ref)):
        wr(out, _scalar_lap(_rd(ref), jlinv, c2aa, c2ab, c2ba, c2bb, jl,
                            D, S, SdT, DAT, delta, p))


def _pass2_kernel(p, delta, D, S, nu_s, nu_d, nu_v, dt,
                  u_ref, v_ref, rt_ref, rho_ref, w_ref,
                  wu_ref, wv_ref, wrt_ref, wrho_ref, ww_ref, m2d_ref,
                  SdT_ref, DAT_ref,
                  ou_ref, ov_ref, ort_ref, orho_ref, ow_ref):
    m2d = _rd(m2d_ref)
    c2aa, c2ab = m2d[0:1], m2d[1:2]
    c2ba, c2bb = m2d[2:3], m2d[3:4]
    j2, j2inv = m2d[4:5], m2d[5:6]
    jl, jlinv = m2d[6:7], m2d[7:8]
    SdT = SdT_ref[...]
    DAT = DAT_ref[...]

    du, dv = _vector_upd(_rd(wu_ref), _rd(wv_ref), nu_d, nu_v,
                         c2aa, c2ab, c2ba, c2bb, j2, j2inv,
                         D, S, SdT, DAT, delta, p)

    def wr(ref, val):
        K, ac, B = val.shape
        ref[...] = val.reshape(K, 1, ac, B)

    wr(ou_ref, _rd(u_ref) + dt * du)
    wr(ov_ref, _rd(v_ref) + dt * dv)
    for ref, wref, out in ((rt_ref, wrt_ref, ort_ref),
                           (rho_ref, wrho_ref, orho_ref),
                           (w_ref, ww_ref, ow_ref)):
        lap = _scalar_lap(_rd(wref), jlinv, c2aa, c2ab, c2ba, c2bb, jl,
                          D, S, SdT, DAT, delta, p)
        wr(out, _rd(ref) - dt * nu_s * lap)


def _call(kern_fn, fg, field_in, n_out, shapes, dtype, ac, interpret):
    A, B = fg.A, fg.B
    grid = (fg.npanels, A // ac)

    def spec(K):
        return pl.BlockSpec((K, 1, ac, B), lambda ip, ia: (0, ip, ia, 0),
                            memory_space=pltpu.VMEM)

    def whole(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape,
                            (lambda n: lambda ip, ia: (0,) * n)(nd),
                            memory_space=pltpu.VMEM)

    SdT = jnp.asarray(np.asarray(fg.Sd_b).T, dtype)
    DAT = jnp.asarray(np.asarray(fg.DA_b).T, dtype)
    in_specs = ([spec(a.shape[0]) for a in field_in]
                + [whole(SdT), whole(DAT)])
    return pl.pallas_call(
        kern_fn, grid=grid, in_specs=in_specs,
        out_specs=tuple(spec(s[0]) for s in shapes),
        out_shape=tuple(jax.ShapeDtypeStruct(s, dtype) for s in shapes),
        interpret=interpret,
    )(*field_in, SdT, DAT)


def _m2d(fg, dtype):
    j2 = fg.jac2d
    jl = fg.jac3d[0]
    return jnp.stack([fg.c2_aa, fg.c2_ab, fg.c2_ba, fg.c2_bb,
                      j2, 1.0 / j2, jl, 1.0 / jl]).astype(dtype)


def nu4_pass1(d, fg, ac: int = 8, interpret=None):
    """Work fields {-wu, -wv, lap(Rt), lap(Rho), lap(W)} in one launch."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dtype = d["U"].dtype
    npdt = np.float64 if dtype == jnp.float64 else np.float32
    D = np.asarray(fg.DA_elem, npdt)
    S = np.asarray(fg.S_elem, npdt)
    kern = functools.partial(_pass1_kernel, fg.p, fg.delta, D, S)
    field_in = [d[k] for k in FIELDS] + [_m2d(fg, dtype)]
    shapes = [d[k].shape for k in FIELDS]
    outs = _call(kern, fg, field_in, 5, shapes, dtype, ac, interpret)
    return dict(zip(FIELDS, outs))


def nu4_pass2(d, work, nu_s, nu_d, nu_v, dt, fg, ac: int = 8,
              interpret=None):
    """d +/- dt * nu * Lap(work) for all five fields in one launch."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    dtype = d["U"].dtype
    npdt = np.float64 if dtype == jnp.float64 else np.float32
    D = np.asarray(fg.DA_elem, npdt)
    S = np.asarray(fg.S_elem, npdt)
    kern = functools.partial(_pass2_kernel, fg.p, fg.delta, D, S,
                             float(nu_s), float(nu_d), float(nu_v),
                             float(dt))
    field_in = ([d[k] for k in FIELDS] + [work[k] for k in FIELDS]
                + [_m2d(fg, dtype)])
    shapes = [d[k].shape for k in FIELDS]
    outs = _call(kern, fg, field_in, 5, shapes, dtype, ac, interpret)
    return dict(zip(FIELDS, outs))
