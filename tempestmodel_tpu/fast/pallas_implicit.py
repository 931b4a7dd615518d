"""Fused Pallas TPU kernel: HEVI implicit Newton step in one launch.

Per column tile (ct columns resident in VMEM) this kernel computes, with
no HBM round trips in between:

  1. the column aux quantities (interface interpolants/derivatives of
     U, V — ``nonhydro._implicit_aux``),
  2. the column residual F(x) (``nonhydro._column_residual``),
  3. the analytic banded Jacobian (``nonhydro.assemble_bands_analytic``,
     exact or reference mode, driven by the same
     ``band_assembly_statics`` tensors),
  4. a statically-unrolled no-pivot banded LU solve
     (``vertical_banded.banded_solve_t`` algorithm),

and writes the Newton increment (d_rt, d_w, d_rho).  The XLA formulation
of steps 2-3 materializes the (n, 2q+1, ncol) band tensor (~280 MB at
ne30 L30 f32) through several layout-changing copies (~5.5 ms measured);
here bands live only as VMEM values.

Sublane packing (``fold``): the banded-LU row recurrence operates on
per-row values.  In the natural layout those are (1, ct) row vectors
that use 1 of 8 VPU sublanes per vreg — the round-4 profile measured
1.73 ms standalone for ~0.2 ms of useful vector work.  With ``fold=f``
every (K, ncol) operand is fed pre-reshaped to (K*f, ncol/f) — row
``k*f+s`` holds the s-th f-th of level k's columns — so each LU row
value is a FULL (f, ct/f) slab, and the vertical operator matrices
become ``kron(M, I_f)`` (the in-kernel lane-split reshape is
unsupported by Mosaic, so the fold happens OUTSIDE the kernel as a
plain row-major reshape).  ``fold=1`` reproduces the original kernel
bit-for-bit.

Banded operator application: at vo == 1 every vertical operator
(interp/diff/penalty/TA/TB/...) is 2-3-diagonal, so ``M @ x`` is two or
three shifted broadcast-multiplies on the VPU instead of a dense MXU
dot.  The dense dots were measured AT the MXU structural roofline for
3-pass true-f32 (~0.82 ms for the ~35 small dots at ne30 — N-streaming
bound, stacking does not help), while the banded form costs ~2 vreg
passes per diagonal: the diagonals are extracted host-side from the
kron'd matrices (offsets are then f-multiples) and shipped as ONE
(n_vecs, f*(nz+1), 1) value table.  Falls back to dense dots if any
operator is wider than 6 diagonals.

Restrictions: Lorenz staggering, vertical order 1 (vo == 1), q as
derived by ``estimate_bandwidth``.  The interleaved row ordering
[Rt_k, W_k, Rho_k]*, W_nz is implicit in the static row schedule.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclasses.dataclass
class PackedStatics:
    """Band-assembly statics packed into stackable arrays (host-side)."""
    q: int
    nz: int
    fold: int
    offs0: tuple
    offs_p1: tuple
    offs_m1: tuple
    ow: tuple
    has_penalty: bool
    TA: Any          # (n0, f*nz, f*(nz+1))
    TB: Any          # (n0, f*(nz+1), f*nz)
    DDb: Any         # (n0, f*(nz+1), 1)
    Di2n_b: Any      # (nw, f*nz, 1)
    Dn2i_b: Any      # (nm1, f*(nz+1), 1)
    In2i_b: Any      # (nw, f*(nz+1), 1)
    Pl_b: Any        # (n0, f*nz, 1)
    Pr_b: Any        # (n0, f*nz, 1)
    Ul: Any          # (nw, f*nz, f*(nfe-1))
    Ur: Any          # (nw, f*nz, f*(nfe-1))


def pack_statics(statics, dtype=np.float32, fold: int = 1) -> PackedStatics:
    offs0 = tuple(statics["offs0"])
    offs_p1 = tuple(statics["offs_p1"])
    offs_m1 = tuple(statics["offs_m1"])
    ow = tuple(sorted(set(offs_p1) | set(offs_m1)))
    nz = statics["nz"]
    I_f = np.eye(fold, dtype=dtype)

    def stk(dic, offs, vec=False):
        arrs = [np.asarray(dic[o], dtype) for o in offs]
        out = np.stack(arrs)
        if vec:
            # broadcast-over-rows vector: repeat each level entry f times
            out = np.repeat(out, fold, axis=-1)[..., None]
        elif fold > 1:
            out = np.stack([np.kron(a, I_f) for a in out])
        return out

    kw = {}
    if statics["has_penalty"]:
        kw = dict(Pl_b=stk(statics["Pl_b"], offs0, vec=True),
                  Pr_b=stk(statics["Pr_b"], offs0, vec=True),
                  Ul=stk(statics["Ul"], ow), Ur=stk(statics["Ur"], ow))
    else:
        z_n = np.zeros((len(offs0), fold * nz, 1), dtype)
        kw = dict(Pl_b=z_n, Pr_b=z_n,
                  Ul=np.zeros((len(ow), fold * nz, 1), dtype),
                  Ur=np.zeros((len(ow), fold * nz, 1), dtype))
    return PackedStatics(
        q=statics["q"], nz=nz, fold=fold, offs0=offs0, offs_p1=offs_p1,
        offs_m1=offs_m1, ow=ow, has_penalty=statics["has_penalty"],
        TA=stk(statics["TA"], offs0), TB=stk(statics["TB"], offs0),
        DDb=stk(statics["DDb"], offs0, vec=True),
        Di2n_b=stk(statics["Di2n_b"], ow, vec=True),
        Dn2i_b=stk(statics["Dn2i_b"], offs_m1, vec=True),
        In2i_b=stk(statics["In2i_b"], ow, vec=True),
        **kw)


def _shift_rows(b, o, K):
    """out[k] = b[k + o], zero out of range (values, static; no
    zero-size pieces — Mosaic rejects 0-length vectors)."""
    L = b.shape[0]
    k0, k1 = max(0, -o), min(K, L - o)
    parts = []
    if k0 > 0:
        parts.append(jnp.zeros((k0,) + b.shape[1:], b.dtype))
    parts.append(b[k0 + o:k1 + o])
    if K - k1 > 0:
        parts.append(jnp.zeros((K - k1,) + b.shape[1:], b.dtype))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _mask_i(nz, ct, f, dtype):
    i = jax.lax.broadcasted_iota(jnp.int32, (f * (nz + 1), ct), 0) // f
    return ((i > 0) & (i < nz)).astype(dtype)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=a.dtype)


# --- banded operator extraction (host side) --------------------------------

def _extract_diags_f(Mf, max_offsets: int = 6):
    """Diagonal representation of an f-space (kron'd) operator matrix:
    [(offset, value_vector(R_out,))] or None if wider than
    ``max_offsets`` diagonals."""
    Mf = np.asarray(Mf, np.float64)
    R, C = Mf.shape
    rr, cc = np.nonzero(Mf)
    offs = sorted(set(int(c) - int(r) for r, c in zip(rr, cc)))
    if len(offs) > max_offsets:
        return None
    out = []
    for o in offs:
        vec = np.zeros(R)
        for r in range(R):
            c = r + o
            if 0 <= c < C:
                vec[r] = Mf[r, c]
        out.append((o, vec))
    return out


def build_diag_table(ps: PackedStatics, mats, f, dtype):
    """(vd, bmeta) — all operator diagonals in one (n_vecs, f*(nz+1), 1)
    table + {op_key: [(f_space_offset, vd_index)]}; None if any operator
    is too wide for the banded form."""
    nz = ps.nz
    I_f = np.eye(f)

    def kf(m):
        m = np.asarray(m, np.float64)
        return np.kron(m, I_f) if f > 1 else m

    named = {
        "In2i": kf(mats["interp_n2i"]), "Ii2n": kf(mats["interp_i2n"]),
        "Dn2i": kf(mats["diff_n2i"]), "Di2n": kf(mats["diff_i2n"]),
        "DD": kf(mats["diffdiff_i2i"]),
        "Pl": kf(mats["penalty_left"]), "Pr": kf(mats["penalty_right"]),
        "Wl": kf(mats["wscat_left"]), "Wr": kf(mats["wscat_right"]),
    }
    i0 = {o: i for i, o in enumerate(ps.offs0)}
    iw = {o: i for i, o in enumerate(ps.ow)}
    for o in ps.offs0:
        named[f"TA{o}"] = np.asarray(ps.TA[i0[o]])
        named[f"TB{o}"] = np.asarray(ps.TB[i0[o]])
    if ps.has_penalty:
        for o in ps.ow:
            named[f"Ul{o}"] = np.asarray(ps.Ul[iw[o]])
            named[f"Ur{o}"] = np.asarray(ps.Ur[iw[o]])

    vecs = []
    bmeta = {}
    rmax = f * (nz + 1)
    for name, M in named.items():
        diags = _extract_diags_f(M)
        if diags is None:
            return None, None
        lst = []
        for o, vec in diags:
            if vec.shape[0] < rmax:
                vec = np.pad(vec, (0, rmax - vec.shape[0]))
            lst.append((o, len(vecs)))
            vecs.append(vec)
        bmeta[name] = lst
    vd = np.stack(vecs).astype(dtype)[:, :, None]   # (n_vecs, rmax, 1)
    return vd, bmeta


def _kernel(q, nz, f, dt, constants, ps: PackedStatics, ref_jacobian,
            newton_time_term, bmeta, refs):
    c = constants
    ins = list(refs[:-3])
    drt_ref, dw_ref, drho_ref = refs[-3:]
    (rt_ref, w_ref, rho_ref, rt0_ref, w0_ref, rho0_ref,
     un_ref, vn_ref,
     caxi_ref, cbxi_ref, cxixi_ref, caxii_ref, cbxii_ref,
     cxixii_ref, jac_ref, jaci_ref, drdxi_ref, c2_ref) = ins[:18]
    rest = ins[18:]

    dtype = rt_ref.dtype
    ct = rt_ref.shape[1]
    b = 2 * q + 1
    inv_dt = jnp.asarray(1.0 / dt, dtype)

    i0 = {o: i for i, o in enumerate(ps.offs0)}
    ip1 = {o: i for i, o in enumerate(ps.offs_p1)}
    im1 = {o: i for i, o in enumerate(ps.offs_m1)}
    iw = {o: i for i, o in enumerate(ps.ow)}

    if bmeta is not None:
        (vd_ref, DDb_ref, Di2nb_ref, Dn2ib_ref, In2ib_ref,
         Plb_ref, Prb_ref) = rest

        def apply_op(name, x, R_out):
            """M @ x via shifted broadcast-multiplies (banded, VPU)."""
            rows = f * R_out
            acc = None
            for o, idx in bmeta[name]:
                v = vd_ref[idx, 0:rows]
                t = v * _shift_rows(x, o, rows)
                acc = t if acc is None else acc + t
            if acc is None:
                acc = jnp.zeros((rows, ct), dtype)
            return acc
    else:
        (In2i_ref, Ii2n_ref, Dn2i_ref, Di2n_ref, DD_ref,
         Pl_ref, Pr_ref, Wl_ref, Wr_ref,
         TA_ref, TB_ref, DDb_ref, Di2nb_ref, Dn2ib_ref, In2ib_ref,
         Plb_ref, Prb_ref, Ul_ref, Ur_ref) = rest
        dmap = {"In2i": In2i_ref, "Ii2n": Ii2n_ref, "Dn2i": Dn2i_ref,
                "Di2n": Di2n_ref, "DD": DD_ref, "Pl": Pl_ref,
                "Pr": Pr_ref, "Wl": Wl_ref, "Wr": Wr_ref}
        smap = {"TA": (TA_ref, i0), "TB": (TB_ref, i0),
                "Ul": (Ul_ref, iw), "Ur": (Ur_ref, iw)}

        def apply_op(name, x, R_out):
            """M @ x via a dense MXU dot (kron'd operator)."""
            if name[:2] in smap and name[2:].lstrip("-").isdigit():
                ref, idx = smap[name[:2]]
                return _dot(ref[idx[int(name[2:])]], x)
            return _dot(dmap[name][...], x)

    rt = rt_ref[...]
    w = w_ref[...]
    rho = rho_ref[...]
    u_n = un_ref[...]
    v_n = vn_ref[...]

    caxi = caxi_ref[...]
    cbxi = cbxi_ref[...]
    cxixi = cxixi_ref[...]
    caxii = caxii_ref[...]
    cbxii = cbxii_ref[...]
    cXi = cxixii_ref[...]
    jac = jac_ref[...]
    jac_i = jaci_ref[...]
    drdxi = drdxi_ref[...]

    # the 2-D metric c2 broadcasts over levels at f=1 ((1, ct) rows);
    # folded it must be tiled explicitly to the level/interface row counts
    def lev_rows(x):
        return x if f == 1 else jnp.concatenate([x] * nz, axis=0)

    def int_rows(x):
        return x if f == 1 else jnp.concatenate([x] * (nz + 1), axis=0)

    c2_rows = [c2_ref[i * f:(i + 1) * f] for i in range(4)]
    c2aa_n, c2ab_n, c2ba_n, c2bb_n = [lev_rows(x) for x in c2_rows]
    c2aa_i, c2ab_i, c2ba_i, c2bb_i = [int_rows(x) for x in c2_rows]

    mask = _mask_i(nz, ct, f, dtype)
    inv_jac = 1.0 / jac

    # --- aux (nonhydro._implicit_aux) ---------------------------------
    u_i = apply_op("In2i", u_n, nz + 1)
    v_i = apply_op("In2i", v_n, nz + 1)
    du_i = apply_op("Dn2i", u_n, nz + 1)
    dv_i = apply_op("Dn2i", v_n, nz + 1)

    # --- shared primal factors ----------------------------------------
    w_n = apply_op("Ii2n", w, nz)
    rho_i = apply_op("In2i", rho, nz + 1)
    rt_i = apply_op("In2i", rt, nz + 1)
    pi_n = c.Cp * jnp.exp(
        c.Rd / (c.Cp - c.Rd) * jnp.log(c.Rd / c.P0 * rt))
    dpi_drt = (c.Rd / (c.Cp - c.Rd)) * pi_n / rt
    dpi_i = apply_op("Dn2i", pi_n, nz + 1)
    xid_n = caxi * u_n + cbxi * v_n + cxixi * w_n
    xid_i = (caxii * u_i + cbxii * v_i + cXi * w) * mask
    curl_coef = -(caxii * du_i + cbxii * dv_i)
    ddw = apply_op("DD", w, nz + 1) * mask
    upw_c = 0.5 / nz
    if ref_jacobian:
        sgn_xid = jnp.sign(xid_i)
    else:
        sgn_xid = jnp.where(xid_i >= 0, 1.0, -1.0).astype(dtype)

    # penalty weights (vo == 1: interior element edges are rows 1..nz-1)
    wb = jnp.abs(xid_i[f:f * nz])                   # (f*(nfe-1), ct)
    wl = apply_op("Wl", wb, nz)
    wr = apply_op("Wr", wb, nz)
    lrt = apply_op("Pl", rt, nz)
    rrt = apply_op("Pr", rt, nz)
    lrho = apply_op("Pl", rho, nz)
    rrho = apply_op("Pr", rho, nz)
    if ref_jacobian:
        sgn_edge = jnp.sign(xid_i[f:f * nz]) * cXi[f:f * nz]
    else:
        sgn_edge = jnp.where(xid_i[f:f * nz] >= 0, 1.0,
                             -1.0).astype(dtype) * cXi[f:f * nz]

    # --- residual F(x) (nonhydro._column_residual) --------------------
    mf_i = jac_i * rho_i * xid_i
    f_rho = apply_op("Di2n", mf_i, nz) * inv_jac
    pf_i = jac_i * rt_i * xid_i
    f_rt = apply_op("Di2n", pf_i, nz) * inv_jac

    con_ua_n = c2aa_n * u_n + c2ab_n * v_n + caxi * w_n
    con_ub_n = c2ba_n * u_n + c2bb_n * v_n + cbxi * w_n
    ke_n = 0.5 * (con_ua_n * u_n + con_ub_n * v_n + xid_n * w_n)
    dke_i = apply_op("Dn2i", ke_n, nz + 1)
    con_ua_i = c2aa_i * u_i + c2ab_i * v_i + caxii * w
    con_ub_i = c2ba_i * u_i + c2bb_i * v_i + cbxii * w
    curl = -con_ua_i * du_i - con_ub_i * dv_i
    pgf = dpi_i * rt_i / rho_i
    f_w = (pgf + c.g * drdxi + dke_i + curl) * mask
    f_rt = f_rt - lrt * wl - rrt * wr
    f_rho = f_rho - lrho * wl - rrho * wr
    f_w = (f_w - upw_c * jnp.abs(xid_i) * ddw) * mask
    if newton_time_term:
        f_rt = f_rt + (rt - rt0_ref[...]) * inv_dt
        f_w = f_w + (w - w0_ref[...]) * inv_dt
        f_rho = f_rho + (rho - rho0_ref[...]) * inv_dt

    # --- band assembly (nonhydro.assemble_bands_analytic) -------------
    d1 = jac_i * xid_i
    e_rt = jac_i * rt_i * cXi * mask
    e_rho = jac_i * rho_i * cXi * mask
    inv_rho_i = 1.0 / rho_i
    r1 = rt_i * inv_rho_i
    r2 = dpi_i * inv_rho_i
    r3 = -dpi_i * rt_i * inv_rho_i * inv_rho_i

    zn = jnp.zeros((f * nz, ct), dtype)
    zi = jnp.zeros((f * (nz + 1), ct), dtype)
    rt_slots = [zn] * b
    rho_slots = [zn] * b
    w_slots = [zi] * b

    for o in ps.offs0:
        d = q + 3 * o
        val = inv_jac * apply_op(f"TA{o}", d1, nz)
        val = val - wl * Plb_ref[i0[o]] - wr * Prb_ref[i0[o]]
        if o == 0:
            val = val + inv_dt
        rt_slots[d] = rt_slots[d] + val
        rho_slots[d] = rho_slots[d] + val

    for o in ps.offs_p1:
        d = q + 3 * o + 1
        v_rt = inv_jac * Di2nb_ref[iw[o]] * _shift_rows(e_rt, f * o, f * nz)
        if ps.has_penalty:
            v_rt = v_rt - lrt * apply_op(f"Ul{o}", sgn_edge, nz) \
                - rrt * apply_op(f"Ur{o}", sgn_edge, nz)
        rt_slots[d] = rt_slots[d] + v_rt

    for o in ps.offs_m1:
        d = q + 3 * o - 1
        v_rho = inv_jac * Di2nb_ref[iw[o]] \
            * _shift_rows(e_rho, f * o, f * nz)
        if ps.has_penalty:
            v_rho = v_rho - lrho * apply_op(f"Ul{o}", sgn_edge, nz) \
                - rrho * apply_op(f"Ur{o}", sgn_edge, nz)
        rho_slots[d] = rho_slots[d] + v_rho

    for o in ps.offs_m1:
        d = q + 3 * o - 1
        v = mask * (r1 * Dn2ib_ref[im1[o]]
                    * _shift_rows(dpi_drt, f * o, f * (nz + 1))
                    + r2 * In2ib_ref[iw[o]])
        w_slots[d] = w_slots[d] + v

    for o in ps.offs_p1:
        d = q + 3 * o + 1
        w_slots[d] = w_slots[d] + mask * r3 * In2ib_ref[iw[o]]

    for o in ps.offs0:
        d = q + 3 * o
        val = apply_op(f"TB{o}", xid_n, nz + 1)
        val = val - upw_c * jnp.abs(xid_i) * DDb_ref[i0[o]]
        if o == 0:
            val = val - upw_c * sgn_xid * ddw * cXi * mask
            if not ref_jacobian:
                val = val + curl_coef
        val = val * mask
        if o >= 1:
            li = jax.lax.broadcasted_iota(
                jnp.int32, (f * (nz + 1), ct), 0) // f
            last_col = (li == nz - o).astype(dtype)
            w_slots[d - 1] = w_slots[d - 1] + val * last_col
            val = val * (1.0 - last_col)
        if o == 0:
            val = val + inv_dt
        w_slots[d] = w_slots[d] + val

    # --- statically-unrolled no-pivot banded LU -----------------------
    # interleaved rows: i = 3k -> Rt_k, 3k+1 -> W_k, 3k+2 -> Rho_k, 3nz -> W_nz
    n = 3 * nz + 1

    def band_row(i):
        if i == 3 * nz:
            k, slots, rhs = nz, w_slots, f_w
        elif i % 3 == 0:
            k, slots, rhs = i // 3, rt_slots, f_rt
        elif i % 3 == 1:
            k, slots, rhs = i // 3, w_slots, f_w
        else:
            k, slots, rhs = i // 3, rho_slots, f_rho
        # each row value is a (f, ct) slab: at fold>1 a full VPU tile,
        # at fold=1 the original (1, ct) Mosaic-friendly row
        return ([s[f * k:f * (k + 1)] for s in slots],
                rhs[f * k:f * (k + 1)])

    u_hist = [None] * n
    y_hist = [None] * n
    for i in range(n):
        wrow, y_i = band_row(i)
        for t in range(q):
            r = i - q + t
            if r < 0:
                continue
            f_ = wrow[t] / u_hist[r][0]
            for j in range(q):
                wrow[t + 1 + j] = wrow[t + 1 + j] - f_ * u_hist[r][1 + j]
            y_i = y_i - f_ * y_hist[r]
        u_hist[i] = wrow[q:]
        y_hist[i] = y_i

    x_sol = [None] * n
    for i in range(n - 1, -1, -1):
        acc = y_hist[i]
        for dd in range(q):
            if i + dd + 1 < n:
                acc = acc - u_hist[i][dd + 1] * x_sol[i + dd + 1]
        x_sol[i] = acc / u_hist[i][0]

    drt_ref[...] = jnp.concatenate([x_sol[3 * k] for k in range(nz)])
    dw_ref[...] = jnp.concatenate([x_sol[3 * k + 1] for k in range(nz)]
                                  + [x_sol[3 * nz]])
    drho_ref[...] = jnp.concatenate([x_sol[3 * k + 2] for k in range(nz)])


def _fold_cols(x, f, ncol_pad):
    """(K, ncol) -> (K*f, ncol_pad//f): row k*f+s holds the s-th f-th
    of level k's (edge-padded) columns.  Plain row-major reshape."""
    K, ncol = x.shape
    if ncol_pad > ncol:
        x = jnp.pad(x, ((0, 0), (0, ncol_pad - ncol)), mode="edge")
    return x.reshape(K * f, ncol_pad // f)


def _kron_f(m, f, dtype):
    return jnp.asarray(np.kron(np.asarray(m, dtype), np.eye(f, dtype=dtype)))


def fused_implicit_update(x_parts, x0_parts, aux_flat, mats, ps:
                          PackedStatics, dt, constants,
                          ref_jacobian=False, newton_time_term=False,
                          col_tile: int = 512, lane_tile: int = 256,
                          interpret=None):
    """Newton increment (d_rt, d_w, d_rho) = J^{-1} F for every column.

    ``x_parts``/``x0_parts``: (rt, w, rho) with shapes (nz|nz+1, ncol);
    ``aux_flat``: dict of column-flattened aux/geometry arrays; ``mats``:
    dict of the small vertical operator matrices.

    ``ps.fold > 1`` selects the sublane-packed kernel with BANDED
    operator application (see module docstring); ``lane_tile`` is then
    the per-block lane width (the effective column tile is
    fold*lane_tile).  ``col_tile`` applies to the fold=1 path, which
    keeps the original dense-dot kernel bit-for-bit.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    nz = ps.nz
    q = ps.q
    f = ps.fold
    rt, w, rho = x_parts
    ncol = rt.shape[1]
    dtype = rt.dtype
    npdt = np.float32 if dtype == jnp.float32 else np.float64

    bmeta = None
    if f > 1:
        blk = f * lane_tile
        ncol_pad = -(-ncol // blk) * blk
        ct = lane_tile
        grid = ((ncol_pad // f) // ct,)

        folded = {}

        def fold(a):
            key = id(a)
            if key not in folded:
                folded[key] = _fold_cols(a, f, ncol_pad)
            return folded[key]

        col_inputs = [fold(a) for a in (
            rt, w, rho, x0_parts[0], x0_parts[1], x0_parts[2],
            aux_flat["u_n"], aux_flat["v_n"],
            aux_flat["con_a_xi"], aux_flat["con_b_xi"],
            aux_flat["con_xi_xi"], aux_flat["con_a_xi_int"],
            aux_flat["con_b_xi_int"], aux_flat["con_xi_xi_int"],
            aux_flat["jac"], aux_flat["jac_int"],
            aux_flat["deriv_r_int"], aux_flat["c2"])]
        vd, bmeta = build_diag_table(ps, mats, f, npdt)
        if bmeta is not None:
            extra = [jnp.asarray(vd, dtype)] + [
                jnp.asarray(a, dtype) for a in
                (ps.DDb, ps.Di2n_b, ps.Dn2i_b, ps.In2i_b,
                 ps.Pl_b, ps.Pr_b)]
        else:
            extra = ([_kron_f(mats[k], f, npdt) for k in
                      ("interp_n2i", "interp_i2n", "diff_n2i",
                       "diff_i2n", "diffdiff_i2i", "penalty_left",
                       "penalty_right", "wscat_left", "wscat_right")]
                     + [jnp.asarray(a, dtype) for a in
                        (ps.TA, ps.TB, ps.DDb, ps.Di2n_b, ps.Dn2i_b,
                         ps.In2i_b, ps.Pl_b, ps.Pr_b, ps.Ul, ps.Ur)])
        out_rows = (f * nz, f * (nz + 1), f * nz)
    else:
        ct = col_tile
        assert ncol % ct == 0, (ncol, ct)
        grid = (ncol // ct,)
        col_inputs = [
            rt, w, rho, x0_parts[0], x0_parts[1], x0_parts[2],
            aux_flat["u_n"], aux_flat["v_n"],
            aux_flat["con_a_xi"], aux_flat["con_b_xi"],
            aux_flat["con_xi_xi"], aux_flat["con_a_xi_int"],
            aux_flat["con_b_xi_int"], aux_flat["con_xi_xi_int"],
            aux_flat["jac"], aux_flat["jac_int"],
            aux_flat["deriv_r_int"], aux_flat["c2"],
        ]
        extra = ([mats["interp_n2i"], mats["interp_i2n"],
                  mats["diff_n2i"], mats["diff_i2n"],
                  mats["diffdiff_i2i"], mats["penalty_left"],
                  mats["penalty_right"], mats["wscat_left"],
                  mats["wscat_right"]]
                 + [jnp.asarray(a, dtype) for a in
                    (ps.TA, ps.TB, ps.DDb, ps.Di2n_b, ps.Dn2i_b,
                     ps.In2i_b, ps.Pl_b, ps.Pr_b, ps.Ul, ps.Ur)])
        out_rows = (nz, nz + 1, nz)

    def colspec(rows):
        return pl.BlockSpec((rows, ct), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    def whole(a):
        nd = a.ndim
        return pl.BlockSpec(a.shape, (lambda nd_: lambda i: (0,) * nd_)(nd),
                            memory_space=pltpu.VMEM)

    in_specs = ([colspec(a.shape[0]) for a in col_inputs]
                + [whole(a) for a in extra])

    ncol_out = col_inputs[0].shape[1]
    kern = lambda *refs: _kernel(q, nz, f, float(dt), constants, ps,
                                 bool(ref_jacobian),
                                 bool(newton_time_term), bmeta, refs)
    outs = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=tuple(colspec(r) for r in out_rows),
        out_shape=tuple(jax.ShapeDtypeStruct((r, ncol_out), dtype)
                        for r in out_rows),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*col_inputs, *extra)
    if f > 1:
        d_rt, d_w, d_rho = outs
        d_rt = d_rt.reshape(nz, -1)[:, :ncol]
        d_w = d_w.reshape(nz + 1, -1)[:, :ncol]
        d_rho = d_rho.reshape(nz, -1)[:, :ncol]
        return d_rt, d_w, d_rho
    return outs
