"""Batched banded Newton solve for the HEVI vertical implicit system.

TPU-native replacement of the reference's per-column LAPACK ``DGBSV`` path
(``VerticalDynamicsFEM.cpp:1437-1464``, bandwidth table ``:165-200``):

- the column unknowns are permuted to the interleaved ordering
  (Rt_k, W_k, Rho_k per level) under which the Jacobian is banded with
  half-bandwidth q (q = 4 at vertical order 1, matching the reference's
  ``m_nJacobianFOffD``);
- the band diagonals are extracted with (2q+1)-coloring: 2q+1 jvp
  evaluations of the batched residual recover the exact AD Jacobian band
  for every column simultaneously;
- the banded systems are solved by a no-pivot banded LU via ``lax.scan``
  over rows, vectorized across all columns.

TPU layout note: all banded tensors keep the huge column axis LAST
(lanes-aligned); the row/diagonal axes are major.  Storing the diagonal
axis minor instead pads 2q+1 -> 128 lanes (a ~14x memory blowup measured
at ne30 L30) — this layout is the difference between ~1 s and ~ms.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def interleave_perm(nz: int) -> np.ndarray:
    """Permutation from block layout [Rt(nz), W(nz+1), Rho(nz)] to
    interleaved [Rt_0, W_0, Rho_0, Rt_1, ..., W_nz]."""
    perm = []
    for k in range(nz + 1):
        if k < nz:
            perm.append(k)                   # Rt_k
        perm.append(nz + k)                  # W_k
        if k < nz:
            perm.append(2 * nz + 1 + k)      # Rho_k
    return np.asarray(perm, dtype=np.int64)


def compute_bandwidth(resid_one, x_sample) -> int:
    """Half-bandwidth q of the interleaved Jacobian (host-side, once)."""
    n = x_sample.shape[-1]
    nz = (n - 1) // 3
    perm = interleave_perm(nz)
    J = np.asarray(jax.jit(jax.jacfwd(resid_one))(x_sample))
    Jp = J[np.ix_(perm, perm)]
    mask = np.abs(Jp) > 1e-30
    ii, jj = np.nonzero(mask)
    return int(max(np.max(ii - jj), np.max(jj - ii)))


def extract_bands_t(batched_resid, x, q: int, perm, inv_perm,
                    multi_jvp=None):
    """Exact banded Jacobian via jvp coloring, column-minor layout.

    ``batched_resid``: (ncol, n) -> (ncol, n), columns independent.
    Returns bands (n, 2q+1, ncol) with band[i, d] = Jp[i, i+d-q] per column
    (out-of-range diagonals zero), in the interleaved row ordering.
    ``multi_jvp``: optional hand-fused tangent evaluator
    (S, ncol, n) -> (S, ncol, n) in BLOCK coordinates (one data sweep for
    all colorings; ~3x the AD-linearize path).
    """
    ncol, n = x.shape
    b = 2 * q + 1
    cols = jnp.arange(n)

    xp = x[:, perm]
    seeds = jnp.stack(
        [jnp.broadcast_to((cols % b == c).astype(x.dtype), xp.shape)
         for c in range(b)])                          # (b, ncol, n)
    if multi_jvp is not None:
        jvs = multi_jvp(seeds[:, :, inv_perm])[:, :, perm]
    else:
        def resid_perm(xpp):
            return batched_resid(xpp[:, inv_perm])[:, perm]
        _, jvp_fn = jax.linearize(resid_perm, xp)
        jvs = jax.vmap(jvp_fn)(seeds)                 # (b, ncol, n)
    stacked = jnp.swapaxes(jvs, 1, 2)                 # (b, n, ncol)

    rows = np.arange(n)
    band_rows = []
    for d in range(b):
        col_idx = rows + d - q
        color = np.mod(col_idx, b)
        valid = (col_idx >= 0) & (col_idx < n)
        sel = stacked[jnp.asarray(color), jnp.asarray(rows)]   # (n, ncol)
        band_rows.append(sel * jnp.asarray(valid,
                                           dtype=x.dtype)[:, None])
    return jnp.stack(band_rows, axis=1)               # (n, b, ncol)


def banded_solve_t(bands, rhs, q: int):
    """Solve banded systems A x = rhs for every column (no pivoting).

    ``bands``: (n, 2q+1, ncol) with band[i, d] = A[i, i+d-q];
    ``rhs``: (n, ncol).  Returns (n, ncol).
    The systems carry a strong I/dt diagonal (Newton of backward Euler),
    so pivot-free elimination is stable here.
    """
    n, b, ncol = bands.shape
    dtype = bands.dtype

    # carry: last q U-rows, each (q+1, ncol), plus last q y values (ncol,)
    # (init derived from the data so its sharding varyingness matches the
    # scan output under shard_map — a constant init trips the vma check)
    zvar = bands[0, 0] * 0.0                          # (ncol,) varying zero
    u_init = zvar + jnp.zeros((q, q + 1, 1), dtype)
    u_init = u_init.at[:, 0].set(1.0)                 # dummy identity rows
    y_init = zvar + jnp.zeros((q, 1), dtype)

    def fwd(carry, row):
        u_prev, y_prev = carry
        w, rhs_i = row                                # (2q+1, ncol), (ncol,)
        y_i = rhs_i
        for t in range(q):
            f = w[t] / u_prev[t, 0]
            w = w.at[t + 1:t + q + 1].add(-f[None, :] * u_prev[t, 1:])
            y_i = y_i - f * y_prev[t]
        u_i = w[q:]                                   # (q+1, ncol)
        u_next = jnp.concatenate([u_prev[1:], u_i[None]], axis=0)
        y_next = jnp.concatenate([y_prev[1:], y_i[None]], axis=0)
        return (u_next, y_next), (u_i, y_i)

    (_, _), (U, Y) = jax.lax.scan(fwd, (u_init, y_init), (bands, rhs))
    # U: (n, q+1, ncol), Y: (n, ncol)

    x_init = zvar + jnp.zeros((q, 1), dtype)

    def bwd(x_next, row):
        u_i, y_i = row
        acc = y_i
        for d in range(q):
            acc = acc - u_i[d + 1] * x_next[d]
        x_i = acc / u_i[0]
        return jnp.concatenate([x_i[None], x_next[:-1]], axis=0), x_i

    _, X = jax.lax.scan(bwd, x_init, (U, Y), reverse=True)
    return X                                          # (n, ncol)


def banded_solve_multi_t(bands, rhs, q: int):
    """Shared-matrix multi-RHS banded solve: ``bands`` (n, 2q+1, ncol),
    ``rhs`` (n, R, ncol) -> (n, R, ncol).  One elimination per column,
    R substitutions (the reference's DGETRF-once / DGETRS-per-species
    tracer semantics, ``VerticalDynamicsFEM.cpp:4028-4262``)."""
    n, b, ncol = bands.shape
    R = rhs.shape[1]
    dtype = bands.dtype

    zvar = bands[0, 0] * 0.0                          # (ncol,)
    u_init = zvar + jnp.zeros((q, q + 1, 1), dtype)
    u_init = u_init.at[:, 0].set(1.0)
    y_init = zvar + jnp.zeros((q, R, 1), dtype)

    def fwd(carry, row):
        u_prev, y_prev = carry
        w, rhs_i = row                          # (2q+1, ncol), (R, ncol)
        y_i = rhs_i
        for t in range(q):
            f = w[t] / u_prev[t, 0]
            w = w.at[t + 1:t + q + 1].add(-f[None, :] * u_prev[t, 1:])
            y_i = y_i - f[None, :] * y_prev[t]
        u_i = w[q:]
        u_next = jnp.concatenate([u_prev[1:], u_i[None]], axis=0)
        y_next = jnp.concatenate([y_prev[1:], y_i[None]], axis=0)
        return (u_next, y_next), (u_i, y_i)

    (_, _), (U, Y) = jax.lax.scan(fwd, (u_init, y_init), (bands, rhs))

    x_init = zvar + jnp.zeros((q, R, 1), dtype)

    def bwd(x_next, row):
        u_i, y_i = row
        acc = y_i
        for d in range(q):
            acc = acc - u_i[d + 1][None] * x_next[d]
        x_i = acc / u_i[0][None]
        return jnp.concatenate([x_i[None], x_next[:-1]], axis=0), x_i

    _, X = jax.lax.scan(bwd, x_init, (U, Y), reverse=True)
    return X                                          # (n, R, ncol)


def banded_newton_update(batched_resid, x0, q: int, nz: int,
                         use_pallas: bool = False, multi_jvp=None,
                         bands_fn=None):
    """One Newton step x0 - J^-1 F(x0) using the banded path.

    ``use_pallas``: solve with the fused Pallas TPU kernel
    (``ops/pallas_banded``, 2.3x the XLA scan on v5e) instead of the
    lax.scan formulation.  ``multi_jvp``: hand-fused band extraction.
    ``bands_fn``: x -> (n, 2q+1, ncol) analytic band assembly (fastest:
    no tangent sweeps at all; see ``nonhydro.assemble_bands_analytic``).
    """
    perm = jnp.asarray(interleave_perm(nz))
    inv_perm = jnp.argsort(perm)
    f = batched_resid(x0)[:, perm].T                  # (n, ncol)
    if bands_fn is not None:
        bands = bands_fn(x0)
    else:
        bands = extract_bands_t(batched_resid, x0, q, perm, inv_perm,
                                multi_jvp=multi_jvp)
    if use_pallas:
        from ..ops.pallas_banded import banded_solve_pallas
        dx_p = banded_solve_pallas(bands, f, q)
    else:
        dx_p = banded_solve_t(bands, f, q)            # (n, ncol)
    return x0 - dx_p.T[:, inv_perm]
