"""Compressible nonhydrostatic dynamics (RhoTheta-Pi formulation, Lorenz).

TPU-native re-design of the reference's nonhydrostatic core:

- horizontal tendencies: ``HorizontalDynamicsFEM::StepNonhydrostaticPrimitive``
  (``src/atm/HorizontalDynamicsFEM.cpp:701-1786``), vector-invariant form in
  covariant components, variational (stiffness) flux divergences.
- vertical explicit terms: ``VerticalDynamicsFEM::StepExplicit``
  (``src/atm/VerticalDynamicsFEM.cpp:616-1160``): flow-dependent
  discontinuous-penalty upwinding of the horizontal velocities.
- vertical implicit residual: ``VerticalDynamicsFEM::BuildF``
  (``src/atm/VerticalDynamicsFEM.cpp:2183-2780``), solved per column by one
  Newton step with the exact Jacobian obtained by automatic differentiation
  (replacing the reference's hand-coded banded Jacobian + LAPACK DGBSV,
  ``:3191`` / ``:1437-1464``) — batched over every column at once.

State dict (Lorenz staggering, ``--vstagger LOR`` default):
  U, V     (P, A, B, nz)    covariant horizontal velocities on levels
  Rt       (P, A, B, nz)    rho*theta on levels ("P" component)
  W        (P, A, B, nz+1)  covariant vertical velocity on interfaces
  Rho      (P, A, B, nz)    density on levels
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import sem


# ---------------------------------------------------------------------------
# Column-operator application helpers (contract the trailing level axis)
# ---------------------------------------------------------------------------

def colop(M, f):
    """Apply a (K_out, K_in) vertical operator over the last axis."""
    return jnp.einsum("KL,...L->...K", M, f)


def penalty_apply(geom, f_n, xidot_i):
    """Flow-dependent discontinuous penalty on a level field.

    Reference ``LinearColumnDiscPenaltyFEM::Apply``
    (``LinearColumnOperatorFEM.cpp:1863-1890``) with weights
    |u^xi| at interior vertical element boundaries
    (``VerticalDynamicsFEM.cpp:2680-2700``).
    """
    vo = geom.vo
    nz = f_n.shape[-1]
    nfe = nz // vo
    if nfe <= 1 or geom.penalty_left is None:
        # single element, or a continuous vertical basis (INT staggering)
        # with no inter-element discontinuity to penalize
        return jnp.zeros_like(f_n)
    # per-boundary weights: |xidot| at interface (a+1)*vo, a = 0..nfe-2
    wb = jnp.abs(xidot_i[..., vo:nz:vo])              # (..., nfe-1)
    wl = jnp.einsum("KA,...A->...K", geom.wscat_left, wb)
    wr = jnp.einsum("KA,...A->...K", geom.wscat_right, wb)
    return (colop(geom.penalty_left, f_n) * wl
            + colop(geom.penalty_right, f_n) * wr)


def exner_from_rhotheta(rt, constants):
    """Exner pressure from rho*theta (PhysicalConstants.h:404-411)."""
    c = constants
    return c.Cp * jnp.exp(
        c.Rd / (c.Cp - c.Rd) * jnp.log(c.Rd / c.P0 * rt))


# ---------------------------------------------------------------------------
# Diagnostics shared by tendencies
# ---------------------------------------------------------------------------

def contravariant_on_levels(geom, u, v, w_n):
    """(u^a, u^b, u^xi) on levels from covariant components."""
    c2 = geom.con2d
    con_ua = (c2[..., 0, 0, None] * u + c2[..., 0, 1, None] * v
              + geom.con_a_xi * w_n)
    con_ub = (c2[..., 1, 0, None] * u + c2[..., 1, 1, None] * v
              + geom.con_b_xi * w_n)
    con_ux = (geom.con_a_xi * u + geom.con_b_xi * v
              + geom.con_xi_xi * w_n)
    return con_ua, con_ub, con_ux


def xidot_interfaces(geom, u_i, v_i, w):
    """u^xi on interfaces with zero top/bottom (no-flux BCs)."""
    xid = (geom.con_a_xi_int * u_i + geom.con_b_xi_int * v_i
           + geom.con_xi_xi_int * w)
    return xid.at[..., 0].set(0.0).at[..., -1].set(0.0)


# ---------------------------------------------------------------------------
# Horizontal (explicit) tendency
# ---------------------------------------------------------------------------

def horizontal_tendency(state, geom, constants):
    """Element-local nonhydrostatic tendencies (no DSS, no dt).

    Returns tendencies for U, V, Rt, W (interior interfaces), Rho.
    Reference: ``StepNonhydrostaticPrimitive``; vertical-advection terms of
    W and the vertical flux divergences stay in the implicit operator.
    """
    nea, neb, p = geom.nea, geom.neb, geom.p
    da, db = geom.delta_a, geom.delta_b
    D, S = geom.deriv, geom.stiff

    u, v = state["U"], state["V"]
    rt, w, rho = state["Rt"], state["W"], state["Rho"]
    stagger = infer_stagger(state, geom.nz)
    cph = stagger == "CPH"
    rt_n = colop(geom.interp_i2n, rt) if cph else rt

    w_n = w if stagger == "LEV" else colop(geom.interp_i2n, w)

    con_ua, con_ub, con_ux = contravariant_on_levels(geom, u, v, w_n)
    ke = 0.5 * (con_ua * u + con_ub * v + con_ux * w_n)
    exner = exner_from_rhotheta(rt_n, constants)

    # vertical derivatives of the covariant horizontal velocity
    du_dxi = colop(geom.diff_n2n, u)
    dv_dxi = colop(geom.diff_n2n, v)

    # horizontal derivatives
    dv_da = sem.deriv_a(v, D, nea, neb, p, da)
    du_db = sem.deriv_b(u, D, nea, neb, p, db)
    dwn_da = sem.deriv_a(w_n, D, nea, neb, p, da)
    dwn_db = sem.deriv_b(w_n, D, nea, neb, p, db)

    # relative vorticity (times J)
    jzeta_a = dwn_db - dv_dxi
    jzeta_b = du_dxi - dwn_da
    jzeta_x = dv_da - du_db

    ucz_a = con_ub * jzeta_x - con_ux * jzeta_b
    ucz_b = con_ux * jzeta_a - con_ua * jzeta_x
    ucz_x = -con_ua * dwn_da - con_ub * dwn_db

    # fluxes (variational divergence)
    base_a = geom.jac3d * con_ua
    base_b = geom.jac3d * con_ub
    div_rho = sem.weak_div(base_a * rho, base_b * rho, S,
                           nea, neb, p, da, db)
    if cph:
        # CPH: RhoTheta advects on interfaces (GetVarLocation(PIx) ==
        # DataLocation_REdge branch, HorizontalDynamicsFEM.cpp:1664+)
        u_i = colop(geom.interp_n2i, u)
        v_i = colop(geom.interp_n2i, v)
        c2 = geom.con2d
        con_ua_i = (c2[..., 0, 0, None] * u_i + c2[..., 0, 1, None] * v_i
                    + geom.con_a_xi_int * w)
        con_ub_i = (c2[..., 1, 0, None] * u_i + c2[..., 1, 1, None] * v_i
                    + geom.con_b_xi_int * w)
        div_rt = sem.weak_div(geom.jac3d_int * con_ua_i * rt,
                              geom.jac3d_int * con_ub_i * rt, S,
                              nea, neb, p, da, db)
    else:
        div_rt = sem.weak_div(base_a * rt, base_b * rt, S,
                              nea, neb, p, da, db)

    dke_a, dke_b = sem.deriv_both(ke, D, nea, neb, p, da, db)
    dpi_a, dpi_b = sem.deriv_both(exner, D, nea, neb, p, da, db)

    theta = rt_n / rho
    fj = (geom.coriolis * geom.jac2d)[..., None]

    dU = (ucz_a + fj * con_ub
          - (dpi_a * theta + dke_a
             + constants.g * geom.deriv_r[..., 0]))
    if geom.is_xz:
        dV = jnp.zeros_like(v)
    else:
        dV = (ucz_b - fj * con_ua
              - (dpi_b * theta + dke_b
                 + constants.g * geom.deriv_r[..., 1]))

    dRho = -div_rho / geom.jac3d
    dRt = -div_rt / (geom.jac3d_int if cph else geom.jac3d)

    # W on interior interfaces: interpolate U x zeta (xi component);
    # LEV keeps W on levels (HorizontalDynamicsFEM.cpp:1612 node branch)
    dW = ucz_x if stagger == "LEV" else colop(geom.interp_n2i, ucz_x)
    dW = dW.at[..., 0].set(0.0).at[..., -1].set(0.0)

    out = {"U": dU, "V": dV, "Rt": dRt, "W": dW, "Rho": dRho}

    if "Tracers" in state:
        tr = jnp.moveaxis(state["Tracers"], 0, -1)   # (P, A, B, nz, ntr)
        dtr = -sem.weak_div(
            base_a[..., None] * tr, base_b[..., None] * tr, S,
            nea, neb, p, da, db) / geom.jac3d[..., None]
        out["Tracers"] = jnp.moveaxis(dtr, -1, 0)
    return out


def vertical_explicit_increment(state, geom, dt):
    """Explicit vertical terms: penalty upwinding of U and V (times dt).

    Reference ``VerticalDynamicsFEM::StepExplicit`` default configuration
    (UPWIND_HORIZONTAL_VELOCITIES; hyperviscosity/uniform diffusion off).
    """
    u_i = colop(geom.interp_n2i, state["U"])
    v_i = colop(geom.interp_n2i, state["V"])
    w = state["W"]
    if w.shape[-1] == geom.nz:                       # LEV: W on levels
        w = colop(geom.interp_n2i, w)
    xid = xidot_interfaces(geom, u_i, v_i, w)
    return {
        "U": dt * penalty_apply(geom, state["U"], xid),
        "V": dt * penalty_apply(geom, state["V"], xid),
    }


def vertical_explicit_tendency(state, geom, constants):
    """Fully-explicit vertical tendencies of (Rt, W, Rho).

    The ``--explicitvertical`` path (reference ``VerticalDynamicsFEM::
    StepExplicit`` with ``m_fFullyExplicit``, ``:754-815``): evaluate the
    implicit residual F at the current state with no time term; the
    tendency is -F.
    """
    nz = geom.nz
    stagger = infer_stagger(state, nz)
    x0, aux, gmats, (P, A, B) = _implicit_aux(state, geom)

    def resid(x, a):
        # dt=inf removes the (x - x0)/dt time term
        fn = {"CPH": _column_residual_cph,
              "LEV": _column_residual_lev,
              "LOR": _column_residual}[stagger]
        return fn(x, a, gmats, constants, jnp.inf, nz)

    f = jax.vmap(resid)(x0, aux)
    n = nz + 1 if stagger == "CPH" else nz
    n_w = nz if stagger == "LEV" else nz + 1
    return {
        "Rt": -f[:, :n].reshape(P, A, B, n),
        "W": -f[:, n:n + n_w].reshape(P, A, B, n_w),
        "Rho": -f[:, n + n_w:].reshape(P, A, B, nz),
    }


def apply_w_boundary(state, geom):
    """Diagnostic bottom boundary condition on W: u^xi(surface) = 0.

    Reference ``StepNonhydrostaticPrimitive``
    (``HorizontalDynamicsFEM.cpp:1600-1625``): the bottom interface W is set
    from the (updated) horizontal velocity so the contravariant vertical
    velocity vanishes at the terrain.
    """
    if state["W"].shape[-1] == geom.nz:              # LEV: W on levels
        w0 = -(geom.con_a_xi[..., 0] * state["U"][..., 0]
               + geom.con_b_xi[..., 0] * state["V"][..., 0]) \
            / geom.con_xi_xi[..., 0]
        return dict(state, W=state["W"].at[..., 0].set(w0))
    u0 = colop(geom.interp_n2i[0:1], state["U"])[..., 0]
    v0 = colop(geom.interp_n2i[0:1], state["V"])[..., 0]
    w0 = -(geom.con_a_xi_int[..., 0] * u0
           + geom.con_b_xi_int[..., 0] * v0) / geom.con_xi_xi_int[..., 0]
    return dict(state, W=state["W"].at[..., 0].set(w0))


# ---------------------------------------------------------------------------
# Vertical implicit solve
# ---------------------------------------------------------------------------

def _column_residual(x, aux, geom_mats, constants, dt, nz):
    """Residual F of the HEVI column system for one column.

    ``x``: flat vector [Rt (nz), W (nz+1), Rho (nz)].
    ``aux``: dict of fixed per-column arrays (U/V on levels+interfaces,
    metric columns, initial state x0).
    Reference: ``VerticalDynamicsFEM::PrepareColumn`` + ``BuildF``.
    """
    g = geom_mats
    rt = x[:nz]
    w = x[nz:2 * nz + 1]
    rho = x[2 * nz + 1:]

    u_n, v_n = aux["u_n"], aux["v_n"]
    u_i, v_i = aux["u_i"], aux["v_i"]

    w_n = g["interp_i2n"] @ w
    rho_i = g["interp_n2i"] @ rho
    rt_i = g["interp_n2i"] @ rt

    exner_n = exner_from_rhotheta(rt, constants)
    dpi_i = g["diff_n2i"] @ exner_n

    xid_n = (aux["con_a_xi"] * u_n + aux["con_b_xi"] * v_n
             + aux["con_xi_xi"] * w_n)
    xid_i = (aux["con_a_xi_int"] * u_i + aux["con_b_xi_int"] * v_i
             + aux["con_xi_xi_int"] * w)
    xid_i = xid_i.at[0].set(0.0).at[-1].set(0.0)

    # mass and rhotheta fluxes on interfaces -> flux divergence on levels
    mf_i = aux["jac_int"] * rho_i * xid_i
    mf_i = mf_i.at[0].set(0.0).at[-1].set(0.0)
    f_rho = (g["diff_i2n"] @ mf_i) / aux["jac"]

    pf_i = aux["jac_int"] * rt_i * xid_i
    pf_i = pf_i.at[0].set(0.0).at[-1].set(0.0)
    f_rt = (g["diff_i2n"] @ pf_i) / aux["jac"]

    # W equation (Clark form, implicit): KE gradient + curl + PGF + gravity
    con_ua_n = (aux["con2d_aa"] * u_n + aux["con2d_ab"] * v_n
                + aux["con_a_xi"] * w_n)
    con_ub_n = (aux["con2d_ab"] * u_n + aux["con2d_bb"] * v_n
                + aux["con_b_xi"] * w_n)
    ke_n = 0.5 * (con_ua_n * u_n + con_ub_n * v_n + xid_n * w_n)
    dke_i = g["diff_n2i"] @ ke_n

    du_i = aux["du_i"]        # d(U)/dxi on interfaces (fixed)
    dv_i = aux["dv_i"]
    con_ua_i = (aux["con2d_aa_i"] * u_i + aux["con2d_ab_i"] * v_i
                + aux["con_a_xi_int"] * w)
    con_ub_i = (aux["con2d_ab_i"] * u_i + aux["con2d_bb_i"] * v_i
                + aux["con_b_xi_int"] * w)
    curl = -con_ua_i * du_i - con_ub_i * dv_i

    rho_i_safe = rho_i
    pgf = dpi_i * rt_i / rho_i_safe
    f_w = pgf + constants.g * aux["deriv_r_int"] + dke_i + curl
    f_w = f_w.at[0].set(0.0).at[-1].set(0.0)

    # upwinding (only at interior element edges, so nfe == 1 has none)
    if g["penalty_left"] is not None and nz // g["vo"] > 1:
        wb = jnp.abs(xid_i[g["vo"]:nz:g["vo"]])
        wl = g["wscat_left"] @ wb
        wr = g["wscat_right"] @ wb
        f_rt = f_rt - (g["penalty_left"] @ rt) * wl \
                    - (g["penalty_right"] @ rt) * wr
        f_rho = f_rho - (g["penalty_left"] @ rho) * wl \
                      - (g["penalty_right"] @ rho) * wr
    # W upwinding: 2nd-derivative damping with |u^xi| coefficient
    ddw = g["diffdiff_i2i"] @ w
    ddw = ddw.at[0].set(0.0).at[-1].set(0.0)
    upwind_coeff = 0.5 / nz
    f_w = f_w - upwind_coeff * jnp.abs(xid_i) * ddw
    f_w = f_w.at[0].set(0.0).at[-1].set(0.0)

    f = jnp.concatenate([f_rt, f_w, f_rho])
    return f + (x - aux["x0"]) / dt


def _column_residual_cph(x, aux, geom_mats, constants, dt, nz):
    """Charney-Phillips column residual: Rt AND W on interfaces.

    ``x``: flat vector [Rt (nz+1), W (nz+1), Rho (nz)].  Reference:
    ``BuildF`` with ``GetVarLocation(PIx) == DataLocation_REdge``
    (``VerticalDynamicsFEM.cpp:2299-2620``, staggering table
    ``Grid.cpp:289-295``).  The Exner gradient is differentiated
    interface-to-interface (native), the RhoTheta flux divergence is
    conservative on interfaces, and Rt upwinding uses the interface
    second-derivative damping (the reference's REdge diffdiff operator,
    ``VerticalDynamicsFEM.cpp:1717+``) since the level penalty operator
    does not apply to interface fields.
    """
    g = geom_mats
    rt = x[:nz + 1]
    w = x[nz + 1:2 * nz + 2]
    rho = x[2 * nz + 2:]

    u_n, v_n = aux["u_n"], aux["v_n"]
    u_i, v_i = aux["u_i"], aux["v_i"]

    w_n = g["interp_i2n"] @ w
    rho_i = g["interp_n2i"] @ rho

    exner_i = exner_from_rhotheta(rt, constants)
    dpi_i = g["diff_i2i"] @ exner_i

    xid_n = (aux["con_a_xi"] * u_n + aux["con_b_xi"] * v_n
             + aux["con_xi_xi"] * w_n)
    xid_i = (aux["con_a_xi_int"] * u_i + aux["con_b_xi_int"] * v_i
             + aux["con_xi_xi_int"] * w)
    xid_i = xid_i.at[0].set(0.0).at[-1].set(0.0)

    mf_i = aux["jac_int"] * rho_i * xid_i
    mf_i = mf_i.at[0].set(0.0).at[-1].set(0.0)
    f_rho = (g["diff_i2n"] @ mf_i) / aux["jac"]

    # conservative RhoTheta flux divergence on interfaces
    pf_i = aux["jac_int"] * rt * xid_i
    f_rt = (g["diff_i2i"] @ pf_i) / aux["jac_int"]

    con_ua_n = (aux["con2d_aa"] * u_n + aux["con2d_ab"] * v_n
                + aux["con_a_xi"] * w_n)
    con_ub_n = (aux["con2d_ab"] * u_n + aux["con2d_bb"] * v_n
                + aux["con_b_xi"] * w_n)
    ke_n = 0.5 * (con_ua_n * u_n + con_ub_n * v_n + xid_n * w_n)
    dke_i = g["diff_n2i"] @ ke_n

    con_ua_i = (aux["con2d_aa_i"] * u_i + aux["con2d_ab_i"] * v_i
                + aux["con_a_xi_int"] * w)
    con_ub_i = (aux["con2d_ab_i"] * u_i + aux["con2d_bb_i"] * v_i
                + aux["con_b_xi_int"] * w)
    curl = -con_ua_i * aux["du_i"] - con_ub_i * aux["dv_i"]

    pgf = dpi_i * rt / rho_i
    f_w = pgf + constants.g * aux["deriv_r_int"] + dke_i + curl
    f_w = f_w.at[0].set(0.0).at[-1].set(0.0)

    if g["penalty_left"] is not None and nz // g["vo"] > 1:
        wb = jnp.abs(xid_i[g["vo"]:nz:g["vo"]])
        wl = g["wscat_left"] @ wb
        wr = g["wscat_right"] @ wb
        f_rho = f_rho - (g["penalty_left"] @ rho) * wl \
                      - (g["penalty_right"] @ rho) * wr
    upwind_coeff = 0.5 / nz
    ddw = g["diffdiff_i2i"] @ w
    ddw = ddw.at[0].set(0.0).at[-1].set(0.0)
    f_w = f_w - upwind_coeff * jnp.abs(xid_i) * ddw
    f_w = f_w.at[0].set(0.0).at[-1].set(0.0)
    ddrt = g["diffdiff_i2i"] @ rt
    f_rt = f_rt - upwind_coeff * jnp.abs(xid_i) * ddrt

    f = jnp.concatenate([f_rt, f_w, f_rho])
    return f + (x - aux["x0"]) / dt


def _column_residual_lev(x, aux, geom_mats, constants, dt, nz):
    """LEV-staggered column residual: ALL variables on model levels.

    ``x``: flat vector [Rt (nz), W (nz), Rho (nz)].  Reference: ``BuildF``
    with ``GetVarLocation(WIx) == DataLocation_Node`` (mass flux on
    levels, ``VerticalDynamicsFEM.cpp:2230-2243``; W update on interior
    nodes only, ``:2470-2500``).  W at the boundary levels is held by
    the zero rows (the reference's loop runs k = 1..nRElements-2).
    """
    g = geom_mats
    rt = x[:nz]
    w = x[nz:2 * nz]
    rho = x[2 * nz:]

    u_n, v_n = aux["u_n"], aux["v_n"]

    exner_n = exner_from_rhotheta(rt, constants)
    dpi_n = g["diff_n2n"] @ exner_n

    xid_n = (aux["con_a_xi"] * u_n + aux["con_b_xi"] * v_n
             + aux["con_xi_xi"] * w)

    mf_n = aux["jac"] * rho * xid_n
    f_rho = (g["diff_n2n"] @ mf_n) / aux["jac"]
    pf_n = aux["jac"] * rt * xid_n
    f_rt = (g["diff_n2n"] @ pf_n) / aux["jac"]

    con_ua_n = (aux["con2d_aa"] * u_n + aux["con2d_ab"] * v_n
                + aux["con_a_xi"] * w)
    con_ub_n = (aux["con2d_ab"] * u_n + aux["con2d_bb"] * v_n
                + aux["con_b_xi"] * w)
    ke_n = 0.5 * (con_ua_n * u_n + con_ub_n * v_n + xid_n * w)
    dke_n = g["diff_n2n"] @ ke_n
    curl = -con_ua_n * aux["du_n"] - con_ub_n * aux["dv_n"]

    pgf = dpi_n * rt / rho
    f_w = pgf + constants.g * aux["deriv_r_n"] + dke_n + curl
    # W on the boundary levels is carried by the horizontal dynamics /
    # boundary condition; zero residual rows hold it at x0
    f_w = f_w.at[0].set(0.0).at[-1].set(0.0)

    if g["penalty_left"] is not None and nz // g["vo"] > 1:
        xid_i = aux["con_xi_xi_int"] * (g["interp_n2i"] @ w) \
            + aux["con_a_xi_int"] * aux["u_i"] \
            + aux["con_b_xi_int"] * aux["v_i"]
        wb = jnp.abs(xid_i[g["vo"]:nz:g["vo"]])
        wl = g["wscat_left"] @ wb
        wr = g["wscat_right"] @ wb
        f_rt = f_rt - (g["penalty_left"] @ rt) * wl \
                    - (g["penalty_right"] @ rt) * wr
        f_rho = f_rho - (g["penalty_left"] @ rho) * wl \
                      - (g["penalty_right"] @ rho) * wr
        f_w = f_w - (g["penalty_left"] @ w) * wl \
                  - (g["penalty_right"] @ w) * wr
        f_w = f_w.at[0].set(0.0).at[-1].set(0.0)

    f = jnp.concatenate([f_rt, f_w, f_rho])
    return f + (x - aux["x0"]) / dt


def convert_stagger(state, geom, stagger: str):
    """Convert a Lorenz-form state dict to another staggering.

    Fallback for test cases without a ``stagger`` parameter on
    ``initial_state``: level fields were already evaluated at the
    staggering's level positions (``geom.z_lev`` is staggering-aware),
    so only array shapes move — W to levels (LEV/INT) by interface
    interpolation, Rt to interfaces (CPH) by level interpolation.
    Cases needing pointwise-exact non-Lorenz initialization implement
    the ``stagger`` parameter instead (e.g. InertiaGravityWave).
    """
    if stagger == "LOR":
        return state
    out = dict(state)
    if stagger in ("LEV", "INT"):
        out["W"] = colop(geom.interp_i2n, state["W"])
        return out
    if stagger == "CPH":
        out["Rt"] = colop(geom.interp_n2i, state["Rt"])
        return out
    raise ValueError(stagger)


def infer_stagger(state, nz: int) -> str:
    """Staggering from state shapes: LOR (default), CPH, or LEV."""
    n_rt = state["Rt"].shape[-1]
    n_w = state["W"].shape[-1]
    if n_w == nz:
        return "LEV"
    if n_rt == nz + 1:
        return "CPH"
    return "LOR"


def is_cph_state(state) -> bool:
    """Charney-Phillips if Rt lives on interfaces (same length as W)."""
    return (state["Rt"].shape[-1] == state["W"].shape[-1]
            and state["Rt"].shape[-1] > state["Rho"].shape[-1])


def _implicit_aux(state, geom):
    """Flattened per-column fixed inputs + initial vector for the solve."""
    nz = geom.nz
    P, A, B = state["Rho"].shape[:3]
    ncol = P * A * B

    u = state["U"]
    v = state["V"]
    u_i = colop(geom.interp_n2i, u)
    v_i = colop(geom.interp_n2i, v)
    du_i = colop(geom.diff_n2i, u)
    dv_i = colop(geom.diff_n2i, v)
    du_n = colop(geom.diff_n2n, u)
    dv_n = colop(geom.diff_n2n, v)

    def flat(f):
        return f.reshape(ncol, f.shape[-1])

    c2 = geom.con2d
    bshape = (P, A, B)
    aux = {
        "u_n": flat(u), "v_n": flat(v),
        "u_i": flat(u_i), "v_i": flat(v_i),
        "du_i": flat(du_i), "dv_i": flat(dv_i),
        "du_n": flat(du_n), "dv_n": flat(dv_n),
        "deriv_r_n": flat(geom.deriv_r[..., 2]),
        "con_a_xi": flat(geom.con_a_xi), "con_b_xi": flat(geom.con_b_xi),
        "con_xi_xi": flat(geom.con_xi_xi),
        "con_a_xi_int": flat(geom.con_a_xi_int),
        "con_b_xi_int": flat(geom.con_b_xi_int),
        "con_xi_xi_int": flat(geom.con_xi_xi_int),
        "jac": flat(geom.jac3d), "jac_int": flat(geom.jac3d_int),
        "deriv_r_int": flat(geom.deriv_r_int[..., 2]),
        "con2d_aa": jnp.broadcast_to(
            c2[..., 0, 0, None], bshape + (nz,)).reshape(ncol, nz),
        "con2d_ab": jnp.broadcast_to(
            c2[..., 0, 1, None], bshape + (nz,)).reshape(ncol, nz),
        "con2d_bb": jnp.broadcast_to(
            c2[..., 1, 1, None], bshape + (nz,)).reshape(ncol, nz),
        "con2d_aa_i": jnp.broadcast_to(
            c2[..., 0, 0, None], bshape + (nz + 1,)).reshape(ncol, nz + 1),
        "con2d_ab_i": jnp.broadcast_to(
            c2[..., 0, 1, None], bshape + (nz + 1,)).reshape(ncol, nz + 1),
        "con2d_bb_i": jnp.broadcast_to(
            c2[..., 1, 1, None], bshape + (nz + 1,)).reshape(ncol, nz + 1),
    }

    x0 = jnp.concatenate(
        [flat(state["Rt"]), flat(state["W"]), flat(state["Rho"])], axis=-1)
    aux["x0"] = x0

    gmats = {
        "interp_n2i": geom.interp_n2i, "interp_i2n": geom.interp_i2n,
        "diff_n2i": geom.diff_n2i, "diff_i2n": geom.diff_i2n,
        "diff_i2i": geom.diff_i2i, "diff_n2n": geom.diff_n2n,
        "diffdiff_i2i": geom.diffdiff_i2i,
        "penalty_left": geom.penalty_left,
        "penalty_right": geom.penalty_right,
        "wscat_left": geom.wscat_left, "wscat_right": geom.wscat_right,
        "vo": geom.vo,
    }
    return x0, aux, gmats, (P, A, B)


def estimate_bandwidth(geom, constants) -> int:
    """Half-bandwidth of the interleaved column Jacobian (host-side, once).

    The analog of the reference's hand-maintained bandwidth table
    (``VerticalDynamicsFEM.cpp:165-200``), derived numerically from the AD
    Jacobian of one synthetic column instead.
    """
    from . import vertical_banded as vb
    nz = geom.nz
    P, A, B = geom.jac3d.shape[:3]
    i, j = A // 2, B // 2
    rng = np.random.default_rng(0)
    shape3 = geom.jac3d.shape[:3]
    lev = jnp.asarray(
        np.broadcast_to(1.0 + 0.3 * rng.random(nz), shape3 + (nz,)))
    state = {
        "U": 10.0 * lev, "V": 5.0 * lev,
        "Rt": 300.0 * lev,
        "W": jnp.asarray(np.broadcast_to(
            0.1 * (1.0 + rng.random(nz + 1)), shape3 + (nz + 1,))),
        "Rho": lev,
    }
    x0, aux, gmats, _ = _implicit_aux(state, geom)
    col = P * A * B // 2
    aux_one = {k: (v[col] if hasattr(v, "ndim") and v.ndim > 1 else v)
               for k, v in aux.items()}

    def resid_one(x):
        return _column_residual(x, aux_one, gmats, constants, 100.0, nz)

    return vb.compute_bandwidth(resid_one, x0[col])


def column_residual_multi_jvp(x0, aux, g, constants, dt, nz, tangents):
    """Analytic JVP of ``_column_residual`` applied to S tangents at once.

    ``x0``: (ncol, n) base point; ``tangents``: (S, ncol, n).
    Returns (S, ncol, n).  All shared (primal) factors are computed once
    and every column operator application is batched over S — one sweep
    over the column data instead of S separate linearized evaluations.
    Validated against jax.jvp in tests (exact to roundoff).
    """
    c = constants
    n = 3 * nz + 1

    def split(x):
        return x[..., :nz], x[..., nz:2 * nz + 1], x[..., 2 * nz + 1:]

    rt0, w0, rho0 = split(x0)
    # --- primal factors (once) ---
    w_n0 = colop(g["interp_i2n"], w0)
    rho_i0 = colop(g["interp_n2i"], rho0)
    rt_i0 = colop(g["interp_n2i"], rt0)
    pi_n0 = exner_from_rhotheta(rt0, c)
    dpi_drt = (c.Rd / (c.Cp - c.Rd)) * pi_n0 / rt0
    dpi_i0 = colop(g["diff_n2i"], pi_n0)
    cX = aux["con_xi_xi"]
    cXi = aux["con_xi_xi_int"]
    xid_n0 = (aux["con_a_xi"] * aux["u_n"] + aux["con_b_xi"] * aux["v_n"]
              + cX * w_n0)
    xid_i0 = (aux["con_a_xi_int"] * aux["u_i"]
              + aux["con_b_xi_int"] * aux["v_i"] + cXi * w0)
    mask_i = jnp.ones(nz + 1, x0.dtype).at[0].set(0.0).at[-1].set(0.0)
    xid_i0 = xid_i0 * mask_i
    jac, jac_i = aux["jac"], aux["jac_int"]
    inv_jac = 1.0 / jac
    curl_coef = -(aux["con_a_xi_int"] * aux["du_i"]
                  + aux["con_b_xi_int"] * aux["dv_i"])
    ddw0 = colop(g["diffdiff_i2i"], w0) * mask_i
    upw_c = 0.5 / nz
    vo = g["vo"]
    nfe = nz // vo
    if nfe > 1:
        edge_sl = slice(vo, nz, vo)
        wb0 = jnp.abs(xid_i0[..., edge_sl])
        wl0 = jnp.einsum("KA,...A->...K", g["wscat_left"], wb0)
        wr0 = jnp.einsum("KA,...A->...K", g["wscat_right"], wb0)
        lrt0 = colop(g["penalty_left"], rt0)
        rrt0 = colop(g["penalty_right"], rt0)
        lrho0 = colop(g["penalty_left"], rho0)
        rrho0 = colop(g["penalty_right"], rho0)
        # subgradient of |x| at 0 is +1 to match AD (lax.abs jvp), so the
        # banded path stays bit-comparable with the dense jacfwd path
        sgn_edge = jnp.where(xid_i0[..., edge_sl] >= 0, 1.0, -1.0) \
            * cXi[..., edge_sl]

    # --- tangents (batched over S) ---
    drt, dw, drho = split(tangents)
    dw_n = colop(g["interp_i2n"], dw)
    drho_i = colop(g["interp_n2i"], drho)
    drt_i = colop(g["interp_n2i"], drt)
    dpi_n = dpi_drt * drt
    ddpi_i = colop(g["diff_n2i"], dpi_n)
    dxid_n = cX * dw_n
    dxid_i = cXi * dw * mask_i

    dmf_i = jac_i * (drho_i * xid_i0 + rho_i0 * dxid_i) * mask_i
    df_rho = colop(g["diff_i2n"], dmf_i) * inv_jac
    dpf_i = jac_i * (drt_i * xid_i0 + rt_i0 * dxid_i) * mask_i
    df_rt = colop(g["diff_i2n"], dpf_i) * inv_jac

    dke_n = xid_n0 * dw_n
    ddke_i = colop(g["diff_n2i"], dke_n)
    dcurl = curl_coef * dw
    dpgf = (ddpi_i * rt_i0 / rho_i0 + dpi_i0 * drt_i / rho_i0
            - dpi_i0 * rt_i0 * drho_i / (rho_i0 * rho_i0))
    df_w = (dpgf + ddke_i + dcurl) * mask_i

    # W upwinding tangent
    dddw = colop(g["diffdiff_i2i"], dw) * mask_i
    sgn_xid = jnp.where(xid_i0 >= 0, 1.0, -1.0)   # AD's d|x|/dx at 0 = +1
    df_w = df_w - upw_c * (sgn_xid * dxid_i * ddw0
                           + jnp.abs(xid_i0) * dddw)
    df_w = df_w * mask_i

    # penalty upwinding tangents
    if nfe > 1:
        dwb = sgn_edge * dw[..., edge_sl]
        dwl = jnp.einsum("KA,...A->...K", g["wscat_left"], dwb)
        dwr = jnp.einsum("KA,...A->...K", g["wscat_right"], dwb)
        df_rt = df_rt - (colop(g["penalty_left"], drt) * wl0
                         + colop(g["penalty_right"], drt) * wr0
                         + lrt0 * dwl + rrt0 * dwr)
        df_rho = df_rho - (colop(g["penalty_left"], drho) * wl0
                           + colop(g["penalty_right"], drho) * wr0
                           + lrho0 * dwl + rrho0 * dwr)

    out = jnp.concatenate([df_rt, df_w, df_rho], axis=-1)
    return out + tangents / dt


def band_assembly_statics(geom, q: int, upwind_thermo: bool = True):
    """Host-side static tensors for the analytic banded-Jacobian assembly.

    Every Jacobian block of the HEVI column system has the form
    ``diag(a) . M . diag(b)`` or ``diag(a) . M1 . diag(d) . M2`` with M
    static (the column operators): its band at block offset ``o`` is an
    elementwise scaling of the static band ``M[k, k+o]``, or a tiny
    static matmul ``T_o @ d`` with ``T_o[k, m] = M1[k, m] * M2[m, k+o]``.
    This replaces the (2q+1)-coloring JVP sweeps of ``extract_bands_t``
    (the round-1 hot spot: ~25 GB of HLO traffic per implicit solve at
    ne30 L30) with a handful of small matmuls — the analytic analog of
    the reference's hand-coded ``BuildJacobianF``
    (``VerticalDynamicsFEM.cpp:3191``).

    Requires a concrete (non-traced) ``geom``; call once per model build.
    """
    Di2n = np.asarray(geom.diff_i2n)        # (nz, nz+1)
    In2i = np.asarray(geom.interp_n2i)      # (nz+1, nz)
    Dn2i = np.asarray(geom.diff_n2i)        # (nz+1, nz)
    Ii2n = np.asarray(geom.interp_i2n)      # (nz, nz+1)
    DD = np.asarray(geom.diffdiff_i2i)      # (nz+1, nz+1)
    nz = Di2n.shape[0]
    vo = geom.vo
    nfe = nz // vo

    def offs(delta):
        import math
        lo = math.ceil((-q - delta) / 3)
        hi = math.floor((q - delta) / 3)
        return list(range(lo, hi + 1))

    def sband(M, o):
        """Static band M[k, k+o] as a (rows,) vector, zero out of range."""
        K, L = M.shape
        out = np.zeros(K, dtype=M.dtype)
        k0, k1 = max(0, -o), min(K, L - o)
        if k1 > k0:
            out[k0:k1] = M[np.arange(k0, k1), np.arange(k0, k1) + o]
        return out

    def tprod(M1, M2, o):
        """T_o[k, m] = M1[k, m] * M2[m, k+o] (zero where k+o out of range)."""
        K, Mm = M1.shape
        L = M2.shape[1]
        T = np.zeros((K, Mm), dtype=M1.dtype)
        for k in range(K):
            j = k + o
            if 0 <= j < L:
                T[k] = M1[k] * M2[:, j]
        return T

    # Interleaved column indices: Rt_k -> 3k, W_k -> 3k+1, Rho_k -> 3k+2
    # (k < nz), W_nz -> 3nz.  A block coupling at level offset o lands at
    # band slot q + 3o + delta with delta = col_shift - row_shift; note
    # delta differs per ROW type: (rt,w) has delta=+1 but (rho,w) has
    # delta=-1, and the special last column W_nz sits at delta-1.
    ow = sorted(set(offs(1)) | set(offs(-1)))
    st = {"q": q, "nz": nz, "vo": vo, "offs0": offs(0),
          "offs_p1": offs(1), "offs_m1": offs(-1)}
    # (rt,rt)/(rho,rho): inv_jac . [Di2n diag(d1) In2i] - penalties + I/dt
    st["TA"] = {o: tprod(Di2n, In2i, o) for o in offs(0)}
    # (w,w): Dn2i diag(xid_n0) Ii2n + diag terms - upw |xid| DD
    st["TB"] = {o: tprod(Dn2i, Ii2n, o) for o in offs(0)}
    st["DDb"] = {o: sband(DD, o) for o in offs(0)}
    # (rt,w) [delta +1] and (rho,w) [delta -1]: inv_jac . Di2n diag(e)
    st["Di2n_b"] = {o: sband(Di2n, o) for o in ow}
    # (w,rt): diag(r) Dn2i diag(dpi_drt), diag(r) In2i [delta -1]
    st["Dn2i_b"] = {o: sband(Dn2i, o) for o in offs(-1)}
    st["In2i_b"] = {o: sband(In2i, o) for o in ow}
    if geom.penalty_left is not None and nfe > 1 and upwind_thermo:
        Pl = np.asarray(geom.penalty_left)
        Pr = np.asarray(geom.penalty_right)
        Wl = np.asarray(geom.wscat_left)    # (nz, nfe-1)
        Wr = np.asarray(geom.wscat_right)
        st["Pl_b"] = {o: sband(Pl, o) for o in offs(0)}
        st["Pr_b"] = {o: sband(Pr, o) for o in offs(0)}
        # U_o[k, a] = W[k, a] * [(a+1)*vo - k == o]  (weight-derivative
        # coupling of the penalty to W at the element edges; rt rows use
        # offs(1), rho rows offs(-1))
        edges = (np.arange(nfe - 1) + 1) * vo
        Ul, Ur = {}, {}
        for o in ow:
            m = (edges[None, :] - np.arange(nz)[:, None]) == o
            Ul[o] = Wl * m
            Ur[o] = Wr * m
        st["Ul"], st["Ur"] = Ul, Ur
        st["has_penalty"] = True
    else:
        st["has_penalty"] = False
    return st


def _shift_cols(b, o, K):
    """out[..., k] = b[..., k+o] for k in [0, K), zero out of range."""
    L = b.shape[-1]
    k0, k1 = max(0, -o), min(K, L - o)
    pre = jnp.zeros(b.shape[:-1] + (k0,), b.dtype)
    post = jnp.zeros(b.shape[:-1] + (K - k1,), b.dtype)
    return jnp.concatenate([pre, b[..., k0 + o:k1 + o], post], axis=-1)


def assemble_bands_analytic(x0, aux, g, statics, constants, dt, nz,
                            ref_jacobian: bool = False):
    """Banded Jacobian (n, 2q+1, ncol) of the column residual, directly.

    Exact same matrix as ``extract_bands_t`` + ``column_residual_multi_jvp``
    (tested to roundoff), built from primal factors and the static
    tensors of :func:`band_assembly_statics` — one pass over the column
    data instead of 2q+1 tangent sweeps.

    ``ref_jacobian=True`` reproduces the reference's hand-coded
    approximate Jacobian (``BuildJacobianF_LOR_RhoTheta_Pi``,
    ``VerticalDynamicsFEM.cpp:2977-3190``) entry-for-entry instead of
    the exact one.  The reference drops two contributions the exact
    Jacobian has: (a) the curl-term diagonal d(curl)/dW in the W rows,
    and (b) it uses sign(0) = 0 in the two sign-weighted upwinding
    couplings (``BuildJacobianF_Diffusion``, ``:2884-2950``) where AD's
    subgradient is +1.  With this mode the single Newton step matches
    the reference's to roundoff, giving long-horizon trajectory parity.
    """
    c = constants
    q = statics["q"]
    b = 2 * q + 1
    ncol = x0.shape[0]
    dtype = x0.dtype

    rt0 = x0[..., :nz]
    w0 = x0[..., nz:2 * nz + 1]
    rho0 = x0[..., 2 * nz + 1:]

    # --- primal factors (mirror of column_residual_multi_jvp) ----------
    w_n0 = colop(g["interp_i2n"], w0)
    rho_i0 = colop(g["interp_n2i"], rho0)
    rt_i0 = colop(g["interp_n2i"], rt0)
    pi_n0 = exner_from_rhotheta(rt0, c)
    dpi_drt = (c.Rd / (c.Cp - c.Rd)) * pi_n0 / rt0
    dpi_i0 = colop(g["diff_n2i"], pi_n0)
    cX = aux["con_xi_xi"]
    cXi = aux["con_xi_xi_int"]
    xid_n0 = (aux["con_a_xi"] * aux["u_n"] + aux["con_b_xi"] * aux["v_n"]
              + cX * w_n0)
    xid_i0 = (aux["con_a_xi_int"] * aux["u_i"]
              + aux["con_b_xi_int"] * aux["v_i"] + cXi * w0)
    mask = jnp.ones(nz + 1, dtype).at[0].set(0.0).at[-1].set(0.0)
    xid_i0 = xid_i0 * mask
    jac_i = aux["jac_int"]
    inv_jac = 1.0 / aux["jac"]
    curl_coef = -(aux["con_a_xi_int"] * aux["du_i"]
                  + aux["con_b_xi_int"] * aux["dv_i"])
    ddw0 = colop(g["diffdiff_i2i"], w0) * mask
    upw_c = 0.5 / nz
    if ref_jacobian:
        sgn_xid = jnp.sign(xid_i0)           # reference: sign(0) = 0
    else:
        sgn_xid = jnp.where(xid_i0 >= 0, 1.0, -1.0)   # AD subgradient

    d1 = jac_i * xid_i0                      # already masked via xid_i0
    e_rt = jac_i * rt_i0 * cXi * mask
    e_rho = jac_i * rho_i0 * cXi * mask
    inv_rho_i = 1.0 / rho_i0
    r1 = rt_i0 * inv_rho_i
    r2 = dpi_i0 * inv_rho_i
    r3 = -dpi_i0 * rt_i0 * inv_rho_i * inv_rho_i

    has_pen = statics["has_penalty"]
    if has_pen:
        vo = statics["vo"]
        edge_sl = slice(vo, nz, vo)
        wb0 = jnp.abs(xid_i0[..., edge_sl])
        wl0 = jnp.einsum("KA,...A->...K", g["wscat_left"], wb0)
        wr0 = jnp.einsum("KA,...A->...K", g["wscat_right"], wb0)
        lrt0 = colop(g["penalty_left"], rt0)
        rrt0 = colop(g["penalty_right"], rt0)
        lrho0 = colop(g["penalty_left"], rho0)
        rrho0 = colop(g["penalty_right"], rho0)
        if ref_jacobian:
            sgn_edge = jnp.sign(xid_i0[..., edge_sl]) * cXi[..., edge_sl]
        else:
            sgn_edge = jnp.where(xid_i0[..., edge_sl] >= 0, 1.0, -1.0) \
                * cXi[..., edge_sl]

    def npa(a):
        return jnp.asarray(a, dtype)

    zrow_n = jnp.zeros((ncol, nz), dtype)
    zrow_i = jnp.zeros((ncol, nz + 1), dtype)
    rt_slots = [zrow_n] * b     # also rho rows (block-diagonal twins)
    rho_slots = [zrow_n] * b
    w_slots = [zrow_i] * b

    # --- (rt,rt) and (rho,rho) — identical blocks -----------------------
    for o in statics["offs0"]:
        d = q + 3 * o
        val = inv_jac * jnp.einsum("km,cm->ck", npa(statics["TA"][o]), d1)
        if has_pen:
            val = val - wl0 * npa(statics["Pl_b"][o]) \
                      - wr0 * npa(statics["Pr_b"][o])
        if o == 0:
            val = val + 1.0 / dt
        rt_slots[d] = rt_slots[d] + val
        rho_slots[d] = rho_slots[d] + val

    # --- (rt,w): delta = +1 (col W_j = 3j+1, row Rt_k = 3k) ---------------
    for o in statics["offs_p1"]:
        d = q + 3 * o + 1
        v_rt = inv_jac * npa(statics["Di2n_b"][o]) * _shift_cols(e_rt, o, nz)
        if has_pen:
            v_rt = v_rt - lrt0 * jnp.einsum(
                "ka,ca->ck", npa(statics["Ul"][o]), sgn_edge) \
                - rrt0 * jnp.einsum(
                "ka,ca->ck", npa(statics["Ur"][o]), sgn_edge)
        rt_slots[d] = rt_slots[d] + v_rt

    # --- (rho,w): delta = -1 (col W_j = 3j+1, row Rho_k = 3k+2) -----------
    for o in statics["offs_m1"]:
        d = q + 3 * o - 1
        v_rho = inv_jac * npa(statics["Di2n_b"][o]) \
            * _shift_cols(e_rho, o, nz)
        if has_pen:
            v_rho = v_rho - lrho0 * jnp.einsum(
                "ka,ca->ck", npa(statics["Ul"][o]), sgn_edge) \
                - rrho0 * jnp.einsum(
                "ka,ca->ck", npa(statics["Ur"][o]), sgn_edge)
        rho_slots[d] = rho_slots[d] + v_rho

    # --- (w,rt): delta = -1 ----------------------------------------------
    for o in statics["offs_m1"]:
        d = q + 3 * o - 1
        v = mask * (r1 * npa(statics["Dn2i_b"][o])
                    * _shift_cols(dpi_drt, o, nz + 1)
                    + r2 * npa(statics["In2i_b"][o]))
        w_slots[d] = w_slots[d] + v

    # --- (w,rho): delta = +1 ----------------------------------------------
    for o in statics["offs_p1"]:
        d = q + 3 * o + 1
        v2 = mask * r3 * npa(statics["In2i_b"][o])
        w_slots[d] = w_slots[d] + v2

    # --- (w,w) ------------------------------------------------------------
    # col W_j sits at 3j+1 except j = nz (at 3nz): the entry whose column
    # is W_nz (row i = nz - o, o >= 1) belongs one slot LEFT of q + 3o.
    for o in statics["offs0"]:
        d = q + 3 * o
        val = jnp.einsum("im,cm->ci", npa(statics["TB"][o]), xid_n0)
        val = val - upw_c * jnp.abs(xid_i0) * npa(statics["DDb"][o])
        if o == 0:
            # the reference drops the curl-term diagonal entirely
            val = val - upw_c * sgn_xid * ddw0 * cXi * mask
            if not ref_jacobian:
                val = val + curl_coef
        val = val * mask
        if o >= 1:
            last_col = jnp.zeros(nz + 1, dtype).at[nz - o].set(1.0)
            w_slots[d - 1] = w_slots[d - 1] + val * last_col
            val = val * (1.0 - last_col)
        if o == 0:
            val = val + 1.0 / dt
        w_slots[d] = w_slots[d] + val

    # --- interleave into (n, b, ncol) -------------------------------------
    rt_t = jnp.stack(rt_slots, axis=0).transpose(2, 0, 1)     # (nz, b, ncol)
    rho_t = jnp.stack(rho_slots, axis=0).transpose(2, 0, 1)
    w_t = jnp.stack(w_slots, axis=0).transpose(2, 0, 1)       # (nz+1, b, ncol)
    trip = jnp.stack([rt_t, w_t[:nz], rho_t], axis=1)         # (nz, 3, b, ncol)
    return jnp.concatenate(
        [trip.reshape(3 * nz, b, ncol), w_t[nz:]], axis=0)


def vertical_implicit(state, geom, constants, dt, newton_iters: int = 1,
                      solver: str = "dense", q: int = 4,
                      band_statics=None, ref_jacobian: bool = False,
                      upwind_thermo: bool = True):
    """Batched HEVI implicit column update of (Rt, W, Rho).

    One Newton step with the AD-exact Jacobian; ``solver`` selects the
    dense per-column LU (robust; tests) or the banded-coloring path
    (TPU fast path; see ``vertical_banded``).  Reference: ``StepImplicit``
    (``VerticalDynamicsFEM.cpp:1230-1464``) with USE_DIRECTSOLVE.

    ``ref_jacobian``: on the banded/pallas path, assemble the reference's
    approximate Jacobian entry-for-entry instead of the exact one (see
    :func:`assemble_bands_analytic`) — single-Newton solves then match
    the reference's bit-for-bit, the long-horizon parity mode.
    """
    nz = geom.nz
    stagger = infer_stagger(state, nz)
    x0, aux, gmats, (P, A, B) = _implicit_aux(state, geom)
    if not upwind_thermo:
        # disable the implicit Rt/Rho upwind penalty (the reference's
        # UPWIND_THERMO / UPWIND_RHO_AND_TRACERS compile flags,
        # VerticalDynamicsFEM.cpp:38-40); the explicit U/V upwinding and
        # the W interface upwinding are separate flags and stay on
        gmats = dict(gmats, penalty_left=None, penalty_right=None)

    if stagger != "LOR":
        # the banded interleave permutation and analytic band assembly
        # are Lorenz layouts; CPH/LEV solve dense (the AD Jacobian is
        # exact for any residual) — reference parallel:
        # BuildJacobianF_LOR_* also supports only Lorenz
        # (VerticalDynamicsFEM.cpp:3065-3067)
        solver = "dense"
        fn = (_column_residual_cph if stagger == "CPH"
              else _column_residual_lev)

        def resid(x, a):
            return fn(x, a, gmats, constants, dt, nz)
    else:
        def resid(x, a):
            return _column_residual(x, a, gmats, constants, dt, nz)

    x = x0
    if solver in ("banded", "pallas"):
        from . import vertical_banded as vb

        def batched_resid(xs):
            return jax.vmap(resid)(xs, aux)

        def multi_jvp(tangents):
            return column_residual_multi_jvp(
                x, aux, gmats, constants, dt, nz, tangents)

        bands_fn = None
        if band_statics is not None:
            def bands_fn(xx):
                return assemble_bands_analytic(
                    xx, aux, gmats, band_statics, constants, dt, nz,
                    ref_jacobian=ref_jacobian)

        for _ in range(newton_iters):
            x = vb.banded_newton_update(batched_resid, x, q, nz,
                                        use_pallas=(solver == "pallas"),
                                        multi_jvp=multi_jvp,
                                        bands_fn=bands_fn)
    elif solver == "schur":
        # Schur elimination of W (reference --vmethod SCHUR)
        from .vertical_schur import schur_newton_update

        def batched_resid(xs):
            return jax.vmap(resid)(xs, aux)

        for _ in range(newton_iters):
            xx = x

            def multi_jvp(tangents):
                return column_residual_multi_jvp(
                    xx, aux, gmats, constants, dt, nz, tangents)

            x = schur_newton_update(batched_resid, x, q, nz, geom.vo,
                                    multi_jvp=multi_jvp)
    elif solver == "jfnk":
        # matrix-free Newton-Krylov (reference USE_JFNK_GMRES path)
        from .jfnk import jfnk_newton_update

        def batched_resid(xs):
            return jax.vmap(resid)(xs, aux)

        for _ in range(newton_iters):
            xx = x

            def jv(t):
                return column_residual_multi_jvp(
                    xx, aux, gmats, constants, dt, nz, t[None])[0]

            x = jfnk_newton_update(batched_resid, x, jv=jv)
    elif solver == "dense":
        def newton_one(xx, a):
            f = resid(xx, a)
            J = jax.jacfwd(lambda y: resid(y, a))(xx)
            return xx - jnp.linalg.solve(J, f)

        for _ in range(newton_iters):
            x = jax.vmap(newton_one)(x, aux)
    else:
        raise ValueError(
            f"unknown vertical solver {solver!r}: expected 'banded', "
            "'pallas', 'schur', 'jfnk', or 'dense'")

    n = nz + 1 if stagger == "CPH" else nz
    n_w = nz if stagger == "LEV" else nz + 1
    rt = x[:, :n].reshape(P, A, B, n)
    w = x[:, n:n + n_w].reshape(P, A, B, n_w)
    rho = x[:, n + n_w:].reshape(P, A, B, nz)
    out = dict(state, Rt=rt, W=w, Rho=rho)

    if "Tracers" in state:
        out["Tracers"] = update_column_tracers(
            state, w, geom, dt)
    return out


def update_column_tracers(state, w_new, geom, dt):
    """Implicit vertical tracer-density update with LU reuse semantics.

    Reference ``VerticalDynamicsFEM::UpdateColumnTracers``
    (``VerticalDynamicsFEM.cpp:3783-4262``): the tracer system is linear,
    J = I/dt + (1/J_n) D_i2n diag(J_i u^xi_new) I_n2i - upwind(|u^xi_0|),
    with F built from the initial tracer density and the updated u^xi;
    q_new = q_0 - J^{-1} F.  Solved batched-dense over columns (nz x nz).
    """
    nz = geom.nz
    tr = state["Tracers"]                      # (ntr, P, A, B, nz)
    u_i = colop(geom.interp_n2i, state["U"])
    v_i = colop(geom.interp_n2i, state["V"])
    xid0 = xidot_interfaces(geom, u_i, v_i, state["W"])
    xid_new = xidot_interfaces(geom, u_i, v_i, w_new)

    jac_i = geom.jac3d_int
    inv_jac = 1.0 / geom.jac3d

    # Flux operator rows: M0 = (1/J_n) D_i2n diag(J_i xid) I_n2i, batched
    # over grid points via einsum (K=node out, M=interface, L=node in).
    flux_op = jnp.einsum(
        "...K,KM,...M,ML->...KL", inv_jac, geom.diff_i2n,
        jac_i * xid_new, geom.interp_n2i)

    # upwinding (weights from the *initial* xidot)
    vo = geom.vo
    nfe = nz // vo
    if nfe > 1:
        wb = jnp.abs(xid0[..., vo:nz:vo])
        wl = jnp.einsum("KA,...A->...K", geom.wscat_left, wb)
        wr = jnp.einsum("KA,...A->...K", geom.wscat_right, wb)
        pen_op = (wl[..., None] * geom.penalty_left
                  + wr[..., None] * geom.penalty_right)
    else:
        pen_op = 0.0

    J = (flux_op - pen_op
         + jnp.eye(nz, dtype=tr.dtype) / dt)

    # F: flux divergence of the initial tracer with updated velocity,
    # minus the upwinding penalty of the initial tracer.
    tr_i = colop(geom.interp_n2i, tr)
    mf = (jac_i * xid_new)[None] * tr_i
    mf = mf.at[..., 0].set(0.0).at[..., -1].set(0.0)
    F = colop(geom.diff_i2n, mf) * inv_jac[None]
    if nfe > 1:
        F = F - (colop(geom.penalty_left, tr) * wl[None]
                 + colop(geom.penalty_right, tr) * wr[None])

    sol = jnp.linalg.solve(
        jnp.broadcast_to(J[None], (tr.shape[0],) + J.shape),
        F[..., None])[..., 0]
    return tr - sol


def filter_negative_tracers_horizontal(tracers, geom):
    """Mass-conservative per-element horizontal positivity filter.

    Reference ``HorizontalDynamicsFEM::FilterNegativeTracers``
    (``HorizontalDynamicsFEM.cpp:213-320``): per spectral element and level,
    zero negative nodes and rescale the positive ones to conserve the
    element mass.
    """
    nea, neb, p = geom.nea, geom.neb, geom.p
    ntr = tracers.shape[0]
    shp = tracers.shape
    area = jnp.broadcast_to(geom.area3d[None], shp)

    def split(f):
        return f.reshape(ntr, shp[1], nea, p, neb, p, shp[-1])

    tr_e = split(tracers)
    ar_e = split(area)
    total = jnp.sum(tr_e * ar_e, axis=(3, 5), keepdims=True)
    pos = jnp.maximum(tr_e, 0.0)
    pos_mass = jnp.sum(pos * ar_e, axis=(3, 5), keepdims=True)
    ratio = jnp.where(pos_mass > 0.0, total / pos_mass, 0.0)
    return (pos * jnp.maximum(ratio, 0.0)).reshape(shp)


def apply_rayleigh(state, geom, ref_state, dt, n_cycles: int = 10):
    """Subcycled backward-Euler Rayleigh relaxation towards the reference.

    Reference ``HorizontalDynamicsFEM::ApplyRayleighFriction``
    (``HorizontalDynamicsFEM.cpp:2420-2570``): 10 subcycles of
    u <- u/(1 + dt nu / 10) + (1 - 1/(1 + dt nu / 10)) u_ref, applied to
    U, V (not on XZ slices), Rt and W — never Rho.
    """
    fac_lev = (1.0 / (1.0 + dt * geom.rayleigh_lev / n_cycles)) ** n_cycles
    fac_int = (1.0 / (1.0 + dt * geom.rayleigh_int / n_cycles)) ** n_cycles
    out = dict(state)
    comps = ["U", "Rt"] if geom.is_xz else ["U", "V", "Rt"]
    for c in comps:
        out[c] = fac_lev * state[c] + (1.0 - fac_lev) * ref_state[c]
    out["W"] = fac_int * state["W"] + (1.0 - fac_int) * ref_state["W"]
    return out


def filter_negative_tracers_column(tracers, geom):
    """Mass-conservative column positivity filter.

    Reference ``VerticalDynamicsFEM::FilterNegativeTracers``
    (``VerticalDynamicsFEM.cpp:4286-4349``): negative nodes are zeroed and
    the lost mass is removed proportionally from the positive nodes of the
    same column.
    """
    area = geom.area3d[None]
    total = jnp.sum(tracers * area, axis=-1, keepdims=True)
    pos = jnp.maximum(tracers, 0.0)
    pos_mass = jnp.sum(pos * area, axis=-1, keepdims=True)
    ratio = jnp.where(pos_mass > 0.0, total / pos_mass, 0.0)
    return pos * jnp.maximum(ratio, 0.0)
