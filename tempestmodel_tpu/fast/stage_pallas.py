"""Fused Pallas TPU kernel: one explicit RK stage of the NH dynamics.

One RK stage (= the reference's ``StepNonhydrostaticPrimitive`` hot
loop, ``HorizontalDynamicsFEM.cpp:701-1786``, plus
``VerticalDynamicsFEM::StepExplicit`` penalty upwinding and the bottom-W
boundary) as ONE Pallas kernel per (panel, A-chunk) tile:

- horizontal derivatives: element-local A-contraction unrolled as
  scaled adds (``_da``); B-contraction as one (K*ac, B) x (B, B) MXU
  GEMM (``_db``);
- vertical column operators (w_n, du/dxi, dv/dxi, u_i, v_i, the
  penalty-upwind increments): applied IN-KERNEL as banded diagonals —
  at vo == 1 every vertical operator is 2-3-diagonal, so each is a
  couple of leading-axis shifts + broadcast multiplies (round 5; the
  former XLA pre-pass cost ~11 HBM-round-trip GEMM fusions per stage).
  Falls back to the XLA pre-pass if any operator is wider than 6
  diagonals (``fold_prepass`` auto-gate);
- the full nonlinear tendency algebra, the two-term RK base
  combination (bases never round-trip HBM), and the tracer advection
  riding the same in-VMEM fluxes as Rho.

The math is the port in ``fast/engine.horizontal_tendency`` /
``apply_w_boundary``; DSS follows separately (``fast/dss_pallas``,
optionally folding the W finish via ``defer_w``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .engine import colop
from .pallas_implicit import _shift_rows, _extract_diags_f


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


def build_stage_diags(fg, dtype):
    """(vd, bmeta) for the stage pre-pass operators, or (None, None) if
    any is wider than 6 diagonals.  vd: (n_vecs, nz+1, 1, 1)."""
    nz = fg.nz
    named = {"Ii2n": fg.interp_i2n, "Dn2n": fg.diff_n2n,
             "In2i": fg.interp_n2i}
    has_pen = fg.penalty_left is not None and nz // fg.vo > 1
    if has_pen:
        named.update({"Wl": fg.wscat_left, "Wr": fg.wscat_right,
                      "Pl": fg.penalty_left, "Pr": fg.penalty_right})
    vecs = []
    bmeta = {}
    for name, M in named.items():
        diags = _extract_diags_f(np.asarray(M))
        if diags is None:
            return None, None
        lst = []
        for o, vec in diags:
            if vec.shape[0] < nz + 1:
                vec = np.pad(vec, (0, nz + 1 - vec.shape[0]))
            lst.append((o, len(vecs)))
            vecs.append(vec)
        bmeta[name] = lst
    vd = np.stack(vecs).astype(dtype)[:, :, None, None]
    return vd, bmeta


def _kernel(nz, p, delta, D, S, g, two_base, use_sep, xz_zero, ntr,
            bmeta, has_pen, refs):
    n_out = 6 if ntr else 5
    ins, outs = list(refs[:-n_out]), refs[-n_out:]
    it = iter(ins)
    fold_pre = bmeta is not None
    if fold_pre:
        (u_ref, v_ref, rt_ref, rho_ref, w_ref,
         bu_ref, bv_ref, brt_ref, brho_ref,
         b2u_ref, b2v_ref, b2rt_ref, b2rho_ref) = [next(it)
                                                   for _ in range(13)]
    else:
        (u_ref, v_ref, rt_ref, rho_ref, wn_ref, duxi_ref, dvxi_ref,
         bu_ref, bv_ref, brt_ref, brho_ref,
         b2u_ref, b2v_ref, b2rt_ref, b2rho_ref,
         pu_ref, pv_ref) = [next(it) for _ in range(17)]
    if ntr:
        tr_ref, btr1_ref, btr2_ref = [next(it) for _ in range(3)]
        otr_ref = outs[5]
    if not use_sep:
        caxi_ref, cbxi_ref, cxixi_ref, jac_ref, dra_ref, drb_ref = \
            [next(it) for _ in range(6)]
        if fold_pre:
            caxii_ref, cbxii_ref, cxixii_ref = [next(it)
                                                for _ in range(3)]
    m2d_ref = next(it)
    if use_sep:
        s_ref = next(it)
        if fold_pre:
            si_ref = next(it)
    SdT_ref = next(it)
    DAT_ref = next(it)
    if fold_pre:
        vd_ref = next(it)
    dts_ref = next(it)
    ou_ref, ov_ref, ort_ref, orho_ref, oucz_ref = outs[:5]

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
    dtype = u.dtype

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

    if fold_pre:
        # --- in-kernel vertical pre-pass (banded diagonals) -----------
        wv = rd(w_ref)                               # (nz+1, ac, B)

        def bapply(name, x, R_out):
            acc = None
            for o, idx in bmeta[name]:
                vvec = vd_ref[idx, 0:R_out]          # (R_out, 1, 1)
                t = vvec * _shift_rows(x, o, R_out)
                acc = t if acc is None else acc + t
            return acc

        w_n = bapply("Ii2n", wv, nz)
        du_dxi = bapply("Dn2n", u, nz)
        dv_dxi = bapply("Dn2n", v, nz)
        u_i = bapply("In2i", u, nz + 1)
        v_i = bapply("In2i", v, nz + 1)
        if use_sep:
            si = si_ref[...].reshape(nz + 1, 1, 1)
            xid = (si * (m2d[5:6] * u_i + m2d[6:7] * v_i)
                   + (m2d[7:8] + si * si * m2d[8:9]) * wv)
        else:
            xid = (rd(caxii_ref) * u_i + rd(cbxii_ref) * v_i
                   + rd(cxixii_ref) * wv)
        ii = jax.lax.broadcasted_iota(jnp.int32, (nz + 1, 1, 1), 0)
        xid = xid * ((ii > 0) & (ii < nz)).astype(dtype)
        if has_pen:
            wb = jnp.abs(xid[1:nz])                  # vo == 1
            wl = bapply("Wl", wb, nz)
            wr = bapply("Wr", wb, nz)
            pen_u = bapply("Pl", u, nz) * wl + bapply("Pr", u, nz) * wr
            pen_v = bapply("Pl", v, nz) * wl + bapply("Pr", v, nz) * wr
        else:
            pen_u = jnp.zeros_like(u)
            pen_v = jnp.zeros_like(v)
    else:
        w_n = rd(wn_ref)
        du_dxi = rd(duxi_ref)
        dv_dxi = rd(dvxi_ref)
        pen_u = rd(pu_ref)
        pen_v = rd(pv_ref)

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
        dU = pen_u
    else:
        dU = (ucz_a + fj * con_ub
              - (dpi_a * theta + dke_a + grav * dra)) + pen_u
    if xz_zero == "V":
        # xz slice: no V tendency; the penalty increment still applies
        dV = pen_v
    else:
        dV = (ucz_b - fj * con_ua
              - (dpi_b * theta + dke_b + grav * drb)) + pen_v
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


def fused_stage(base, ueval, dt_s, fg, constants, ac: int = None,
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
    if ac is None:
        # A-chunk: 8 rows when aligned; a short swapped-xz A (= ney*p)
        # runs as ONE chunk (sublane-underfilled but a single grid step)
        ac = 8 if A % 8 == 0 else A
    assert A % ac == 0 and ac % p == 0
    grid = (fg.npanels, A // ac)

    npdt = np.float64 if dtype == jnp.float64 else np.float32
    D = np.asarray(fg.DA_elem, npdt)
    S = np.asarray(fg.S_elem, npdt)
    delta = fg.delta

    u, v, w = ueval["U"], ueval["V"], ueval["W"]
    use_sep = bool(fg.sep_ok)
    has_pen = fg.penalty_left is not None and nz // fg.vo > 1

    vd = bmeta = None
    if fg.vo == 1:
        vd, bmeta = build_stage_diags(fg, npdt)
    fold_pre = bmeta is not None

    if fold_pre:
        field_in = [u, v, ueval["Rt"], ueval["Rho"], w,
                    base1["U"], base1["V"], base1["Rt"], base1["Rho"],
                    base2["U"], base2["V"], base2["Rt"], base2["Rho"]]
    else:
        # --- XLA pre-pass: vertical column operators ------------------
        w_n = colop(fg.interp_i2n, w)
        du_dxi = colop(fg.diff_n2n, u)
        dv_dxi = colop(fg.diff_n2n, v)
        u_i = colop(fg.interp_n2i, u)
        v_i = colop(fg.interp_n2i, v)
        if use_sep:
            si = fg.s_int[:, :, None, None]
            xid = (si * (fg.sep_ca[None] * u_i + fg.sep_cb[None] * v_i)
                   + (fg.sep_e[None] + si * si * fg.sep_f[None]) * w)
        else:
            xid = (fg.con_a_xi_int * u_i + fg.con_b_xi_int * v_i
                   + fg.con_xi_xi_int * w)
        xid = xid.at[0].set(0.0).at[-1].set(0.0)
        if has_pen:
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
        field_in = [u, v, ueval["Rt"], ueval["Rho"], w_n, du_dxi,
                    dv_dxi,
                    base1["U"], base1["V"], base1["Rt"], base1["Rho"],
                    base2["U"], base2["V"], base2["Rt"], base2["Rho"],
                    pen_u, pen_v]

    ntr = 0
    if "Tracers" in ueval:
        ntr = ueval["Tracers"].shape[0] // nz
        btr1 = base1.get("Tracers", ueval["Tracers"])
        btr2 = base2.get("Tracers", btr1)
        field_in += [ueval["Tracers"], btr1, btr2]

    if use_sep:
        m2d = jnp.stack([fg.c2_aa, fg.c2_ab, fg.c2_ba, fg.c2_bb, fg.fj,
                         fg.sep_ca, fg.sep_cb, fg.sep_e, fg.sep_f,
                         fg.sep_da, fg.sep_db, fg.sep_jacl])
        field_in += [m2d]
    else:
        m2d = jnp.stack([fg.c2_aa, fg.c2_ab, fg.c2_ba, fg.c2_bb, fg.fj])
        field_in += [fg.con_a_xi, fg.con_b_xi, fg.con_xi_xi,
                     fg.jac3d, fg.deriv_r_a, fg.deriv_r_b]
        if fold_pre:
            field_in += [fg.con_a_xi_int, fg.con_b_xi_int,
                         fg.con_xi_xi_int]
        field_in += [m2d]

    SdT = jnp.asarray(np.asarray(fg.Sd_b).T, dtype)
    DAT = jnp.asarray(np.asarray(fg.DA_b).T, dtype)
    dts = jnp.asarray([[dt_s, cb1, cb2]], dtype)

    small_in = []
    if use_sep:
        small_in.append(fg.s_lev)
        if fold_pre:
            small_in.append(fg.s_int)
    small_in += [SdT, DAT]
    if fold_pre:
        small_in.append(jnp.asarray(vd, dtype))

    def spec(K):
        return pl.BlockSpec((K, 1, ac, B), lambda ip, ia: (0, ip, ia, 0),
                            memory_space=pltpu.VMEM)

    def whole(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, (lambda n: lambda ip, ia: (0,) * n)(nd),
                            memory_space=pltpu.VMEM)

    in_specs = ([spec(a.shape[0]) for a in field_in]
                + [whole(a) for a in small_in]
                + [pl.BlockSpec((1, 3), lambda ip, ia: (0, 0),
                                memory_space=pltpu.SMEM)])

    g = (float(constants.Cp), float(constants.Rd), float(constants.P0),
         float(constants.g))
    kern = lambda *refs: _kernel(nz, p, delta, D, S, g, two_base,
                                 use_sep, fg.xz_zero, ntr, bmeta,
                                 has_pen, refs)

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
