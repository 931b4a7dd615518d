"""Fused Pallas TPU kernel: one explicit RK stage of the NH dynamics.

Split of one RK stage (= the reference's ``StepNonhydrostaticPrimitive``
hot loop, ``HorizontalDynamicsFEM.cpp:701-1786``, plus
``VerticalDynamicsFEM::StepExplicit`` penalty upwinding and the bottom-W
boundary) between XLA and one Pallas kernel:

- XLA pre-pass: the vertical column operators (w_n, du/dxi, dv/dxi,
  xidot, penalty increments) — clean leading-axis GEMMs that XLA already
  executes near bandwidth (Mosaic cannot contract the leading axis of a
  (K, ac, B) block without an unsupported lane-merge reshape, so these
  stay outside).
- Pallas kernel, per (panel, A-chunk) tile: all horizontal derivatives
  (element-local A-contraction unrolled as scaled adds; B-contraction as
  one (K*ac, B) x (B, B) MXU GEMM), the full nonlinear tendency algebra,
  and the axpy ``base + dt_s * tend`` for U/V/Rt/Rho; outputs also the
  vertical-momentum forcing ucz_x.
- XLA post-pass: dW = interp_n2i @ ucz_x (masked), the W axpy, and the
  diagnostic bottom-W boundary from the updated velocities.

The math is the port in ``fast/engine.horizontal_tendency`` /
``apply_w_boundary``; DSS follows separately (``fast/dss_pallas``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .engine import colop


def _db(x, DAT):
    """B-contraction: out[..., i] = sum_s x[..., s] * DAT[s, i] (GEMM)."""
    K, ac, B = x.shape
    out = jax.lax.dot_general(x.reshape(K * ac, B), DAT,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=x.dtype)
    return out.reshape(K, ac, B)


def _da(x, M, delta, p):
    """A-contraction within the chunk, element-local p-point stencil
    unrolled as scaled adds: out_i = sum_s (M[s, i] / delta) * x_s."""
    K, ac, B = x.shape
    pieces = []
    for e in range(ac // p):
        for i in range(p):
            acc = None
            for s in range(p):
                term = (M[s, i] / delta) * x[:, e * p + s:e * p + s + 1, :]
                acc = term if acc is None else acc + term
            pieces.append(acc)
    return jnp.concatenate(pieces, axis=1)


def _kernel(nz, p, delta, D, S, g, two_base, use_sep, xz_zero, ntr,
            refs):
    n_out = 6 if ntr else 5
    ins, outs = refs[:-n_out], refs[-n_out:]
    if ntr:
        # tracer inputs sit right after the 17 base field inputs
        tr_ref, btr1_ref, btr2_ref = ins[17:20]
        ins = ins[:17] + ins[20:]
        otr_ref = outs[5]
    ou_ref, ov_ref, ort_ref, orho_ref, oucz_ref = outs[:5]
    if use_sep:
        (u_ref, v_ref, rt_ref, rho_ref, wn_ref, duxi_ref, dvxi_ref,
         bu_ref, bv_ref, brt_ref, brho_ref,
         b2u_ref, b2v_ref, b2rt_ref, b2rho_ref, pu_ref, pv_ref,
         m2d_ref, s_ref, SdT_ref, DAT_ref, dts_ref) = ins
    else:
        (u_ref, v_ref, rt_ref, rho_ref, wn_ref, duxi_ref, dvxi_ref,
         bu_ref, bv_ref, brt_ref, brho_ref,
         b2u_ref, b2v_ref, b2rt_ref, b2rho_ref, pu_ref, pv_ref,
         caxi_ref, cbxi_ref, cxixi_ref, jac_ref, dra_ref, drb_ref,
         m2d_ref, SdT_ref, DAT_ref, dts_ref) = ins

    def rd(ref):
        x = ref[...]
        return x.reshape(x.shape[0], x.shape[2], x.shape[3])

    dt_s = dts_ref[0, 0]
    cb1 = dts_ref[0, 1]
    cb2 = dts_ref[0, 2]

    def base(ref1, ref2):
        # base = cb1 * b1 + cb2 * b2 (the RK linear combination), fused
        # into the stage so combined bases never round-trip HBM
        if two_base:
            return cb1 * rd(ref1) + cb2 * rd(ref2)
        return rd(ref1)
    u = rd(u_ref)
    v = rd(v_ref)
    rt = rd(rt_ref)
    rho = rd(rho_ref)
    w_n = rd(wn_ref)
    du_dxi = rd(duxi_ref)
    dv_dxi = rd(dvxi_ref)
    if use_sep:
        # (12, ac, B): c2aa..c2bb, fj, Ca, Cb, E, F, dZs/da, dZs/db, jacl
        m2d = rd(m2d_ref)
        s = s_ref[...].reshape(nz, 1, 1)     # (nz, 1) profile -> bcast
        caxi = s * m2d[5:6]
        cbxi = s * m2d[6:7]
        cxixi = m2d[7:8] + (s * s) * m2d[8:9]
        dra = s * m2d[9:10]
        drb = s * m2d[10:11]
        jac = m2d[11:12]
    else:
        caxi = rd(caxi_ref)
        cbxi = rd(cbxi_ref)
        cxixi = rd(cxixi_ref)
        jac = rd(jac_ref)
        dra = rd(dra_ref)
        drb = rd(drb_ref)
        m2d = rd(m2d_ref)        # (5, ac, B): c2aa, c2ab, c2ba, c2bb, fj
    c2aa = m2d[0:1]
    c2ab = m2d[1:2]
    c2ba = m2d[2:3]
    c2bb = m2d[3:4]
    fj = m2d[4:5]
    SdT = SdT_ref[...]
    DAT = DAT_ref[...]

    Cp, Rd, P0, grav = g

    con_ua = c2aa * u + c2ab * v + caxi * w_n
    con_ub = c2ba * u + c2bb * v + cbxi * w_n
    con_ux = caxi * u + cbxi * v + cxixi * w_n

    ke = 0.5 * (con_ua * u + con_ub * v + con_ux * w_n)
    exner = Cp * jnp.exp(Rd / (Cp - Rd) * jnp.log(Rd / P0 * rt))

    dv_da = _da(v, D, delta, p)
    du_db = _db(u, DAT)
    dwn_da = _da(w_n, D, delta, p)
    dwn_db = _db(w_n, DAT)

    jzeta_a = dwn_db - dv_dxi
    jzeta_b = du_dxi - dwn_da
    jzeta_x = dv_da - du_db

    ucz_a = con_ub * jzeta_x - con_ux * jzeta_b
    ucz_b = con_ux * jzeta_a - con_ua * jzeta_x
    ucz_x = -con_ua * dwn_da - con_ub * dwn_db

    base_a = jac * con_ua
    base_b = jac * con_ub
    # weak_div = -(A-part + B-part); A-part element-local, B via SdT GEMM
    div_rho = -(_da(base_a * rho, S.T, delta, p) + _db(base_b * rho, SdT))
    div_rt = -(_da(base_a * rt, S.T, delta, p) + _db(base_b * rt, SdT))

    dke_a = _da(ke, D, delta, p)
    dke_b = _db(ke, DAT)
    dpi_a = _da(exner, D, delta, p)
    dpi_b = _db(exner, DAT)

    theta = rt / rho

    if xz_zero == "U":
        # ab-swapped xz: engine U = physical V, no tendency
        dU = rd(pu_ref)
    else:
        dU = (ucz_a + fj * con_ub
              - (dpi_a * theta + dke_a + grav * dra)) + rd(pu_ref)
    if xz_zero == "V":
        # xz slice: no V tendency; the penalty increment still applies
        dV = rd(pv_ref)
    else:
        dV = (ucz_b - fj * con_ua
              - (dpi_b * theta + dke_b + grav * drb)) + rd(pv_ref)
    dRho = -div_rho / jac
    dRt = -div_rt / jac

    def wr_out(ref, val):
        K, ac, B = val.shape
        ref[...] = val.reshape(K, 1, ac, B)

    wr_out(ou_ref, base(bu_ref, b2u_ref) + dt_s * dU)
    wr_out(ov_ref, base(bv_ref, b2v_ref) + dt_s * dV)
    wr_out(ort_ref, base(brt_ref, b2rt_ref) + dt_s * dRt)
    wr_out(orho_ref, base(brho_ref, b2rho_ref) + dt_s * dRho)
    wr_out(oucz_ref, ucz_x)

    if ntr:
        # tracer advection rides the SAME in-VMEM fluxes as Rho (the
        # reference treats tracers as extra continuity components,
        # HorizontalDynamicsFEM.cpp:1546-1610); the flat species-major
        # block is processed per species so no species-tiled metric
        # tensors ever exist
        trs = rd(tr_ref)                         # (ntr*nz, ac, B)
        btr = base(btr1_ref, btr2_ref)
        pieces = []
        for s_i in range(ntr):
            t = trs[s_i * nz:(s_i + 1) * nz]
            div_t = -(_da(base_a * t, S.T, delta, p)
                      + _db(base_b * t, SdT))
            pieces.append(btr[s_i * nz:(s_i + 1) * nz]
                          + dt_s * (-div_t / jac))
        wr_out(otr_ref, jnp.concatenate(pieces, axis=0))


def fused_stage(base, ueval, dt_s, fg, constants, ac: int = 8,
                interpret=None, defer_w: bool = False):
    """One RK stage update: base + dt_s * tendency(ueval), W boundary
    applied; returns the pre-DSS updated state dict.

    ``base``: a state dict, or ``((c1, d1), (c2, d2))`` — a two-term RK
    linear combination evaluated inside the kernel (for U/V/Rt/Rho) so
    the combined base never round-trips HBM.

    ``defer_w``: skip the XLA W post-pass and return
    ``({U,V,Rt,Rho}, w_finish)`` where ``w_finish`` carries the raw
    ``dW = interp_n2i @ ucz_x`` GEMM plus the base-W terms and surface
    metric rows — the downstream DSS kernel assembles W, applies the
    bottom boundary and DSSes it in the same launch
    (``dss_pallas.dss_uvw``)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    two_base = isinstance(base, tuple)
    if two_base:
        (cb1, base1), (cb2, base2) = base
    else:
        cb1, base1, cb2, base2 = 1.0, base, 0.0, base
    nz, p = fg.nz, fg.p
    A, B = fg.A, fg.B
    dtype = base1["U"].dtype
    assert A % ac == 0 and ac % p == 0
    grid = (fg.npanels, A // ac)

    npdt = np.float64 if dtype == jnp.float64 else np.float32
    D = np.asarray(fg.DA_elem, npdt)
    S = np.asarray(fg.S_elem, npdt)
    delta = fg.delta

    u, v, w = ueval["U"], ueval["V"], ueval["W"]
    use_sep = bool(fg.sep_ok)

    # --- XLA pre-pass: vertical column operators ----------------------
    # NOTE: separate dots per operator, NOT one stacked
    # [diff; interp; penalties] GEMM per field — stacking was measured
    # SLOWER (+0.8 ms/step): the row-slices of the stacked result feed
    # Pallas operands, which forces each slice to materialize as a copy
    w_n = colop(fg.interp_i2n, w)
    du_dxi = colop(fg.diff_n2n, u)
    dv_dxi = colop(fg.diff_n2n, v)
    u_i = colop(fg.interp_n2i, u)
    v_i = colop(fg.interp_n2i, v)
    if use_sep:
        # separable metric: 2-D terrain fields x 1-D profile instead of
        # full (nz+1, 6, A, B) tensors (engine.FastGeometry sep_* docs)
        si = fg.s_int[:, :, None, None]
        xid = (si * (fg.sep_ca[None] * u_i + fg.sep_cb[None] * v_i)
               + (fg.sep_e[None] + si * si * fg.sep_f[None]) * w)
    else:
        xid = (fg.con_a_xi_int * u_i + fg.con_b_xi_int * v_i
               + fg.con_xi_xi_int * w)
    xid = xid.at[0].set(0.0).at[-1].set(0.0)
    if fg.penalty_left is not None and nz // fg.vo > 1:
        wb = jnp.abs(xid[fg.vo:nz:fg.vo])
        wl = colop(fg.wscat_left, wb)
        wr = colop(fg.wscat_right, wb)
        pen_u = colop(fg.penalty_left, u) * wl \
            + colop(fg.penalty_right, u) * wr
        pen_v = colop(fg.penalty_left, v) * wl \
            + colop(fg.penalty_right, v) * wr
    else:
        pen_u = jnp.zeros_like(u)
        pen_v = jnp.zeros_like(v)

    if use_sep:
        m2d = jnp.stack([fg.c2_aa, fg.c2_ab, fg.c2_ba, fg.c2_bb, fg.fj,
                         fg.sep_ca, fg.sep_cb, fg.sep_e, fg.sep_f,
                         fg.sep_da, fg.sep_db, fg.sep_jacl])
    else:
        m2d = jnp.stack([fg.c2_aa, fg.c2_ab, fg.c2_ba, fg.c2_bb, fg.fj])

    def spec(K):
        return pl.BlockSpec((K, 1, ac, B), lambda ip, ia: (0, ip, ia, 0),
                            memory_space=pltpu.VMEM)

    def whole(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, (lambda n: lambda ip, ia: (0,) * n)(nd),
                            memory_space=pltpu.VMEM)

    SdT = jnp.asarray(np.asarray(fg.Sd_b).T, dtype)
    DAT = jnp.asarray(np.asarray(fg.DA_b).T, dtype)
    dts = jnp.asarray([[dt_s, cb1, cb2]], dtype)

    field_in = [u, v, ueval["Rt"], ueval["Rho"], w_n, du_dxi, dv_dxi,
                base1["U"], base1["V"], base1["Rt"], base1["Rho"],
                base2["U"], base2["V"], base2["Rt"], base2["Rho"],
                pen_u, pen_v]
    if use_sep:
        field_in += [m2d]
        small_in = [fg.s_lev, SdT, DAT]
    else:
        field_in += [fg.con_a_xi, fg.con_b_xi, fg.con_xi_xi,
                     fg.jac3d, fg.deriv_r_a, fg.deriv_r_b, m2d]
        small_in = [SdT, DAT]

    def build_in_specs():
        return ([spec(a.shape[0]) for a in field_in]
                + [whole(a) for a in small_in]
                + [pl.BlockSpec((1, 3), lambda ip, ia: (0, 0),
                                memory_space=pltpu.SMEM)])

    g = (float(constants.Cp), float(constants.Rd), float(constants.P0),
         float(constants.g))
    ntr = 0
    if "Tracers" in ueval:
        ntr = ueval["Tracers"].shape[0] // nz
        btr1 = base1.get("Tracers", ueval["Tracers"])
        btr2 = base2.get("Tracers", btr1)
        field_in = field_in[:17] + [ueval["Tracers"], btr1, btr2] \
            + field_in[17:]
    in_specs = build_in_specs()
    kern = lambda *refs: _kernel(nz, p, delta, D, S, g, two_base,
                                 use_sep, fg.xz_zero, ntr, refs)

    shp_n = u.shape
    out_specs = tuple(spec(nz) for _ in range(5))
    out_shape = tuple(jax.ShapeDtypeStruct(shp_n, dtype)
                      for _ in range(5))
    if ntr:
        out_specs = out_specs + (spec(ntr * nz),)
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((ntr * nz,) + shp_n[1:], dtype),)
    outs = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=out_specs, out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*field_in, *small_in, dts)
    out_u, out_v, out_rt, out_rho, ucz_x = outs[:5]
    out_tr = outs[5] if ntr else None

    if defer_w:
        Imat = np.asarray(fg.interp_n2i)
        w_finish = {
            "bw1": base1["W"],
            "bw2": base2["W"] if two_base else None,
            "cb1": cb1, "cb2": cb2, "dt_s": dt_s,
            "dW": colop(fg.interp_n2i, ucz_x),
            "cax0": fg.con_a_xi_int[0], "cbx0": fg.con_b_xi_int[0],
            "cxx0": fg.con_xi_xi_int[0],
            "c00": float(Imat[0, 0]), "c01": float(Imat[0, 1]),
        }
        out = {"U": out_u, "V": out_v, "Rt": out_rt, "Rho": out_rho}
        if ntr:
            out["Tracers"] = out_tr
        return (out, w_finish)

    # --- XLA post-pass: W update + diagnostic bottom boundary ---------
    dW = colop(fg.interp_n2i, ucz_x)
    dW = dW.at[0].set(0.0).at[-1].set(0.0)
    base_w = (cb1 * base1["W"] + cb2 * base2["W"]) if two_base \
        else base1["W"]
    out_w = base_w + dt_s * dW
    u0 = colop(fg.interp_n2i[0:1], out_u)[0]
    v0 = colop(fg.interp_n2i[0:1], out_v)[0]
    w0 = -(fg.con_a_xi_int[0] * u0 + fg.con_b_xi_int[0] * v0) \
        / fg.con_xi_xi_int[0]
    out_w = out_w.at[0].set(w0)

    out = {"U": out_u, "V": out_v, "Rt": out_rt, "Rho": out_rho,
           "W": out_w}
    if ntr:
        out["Tracers"] = out_tr
    return out
