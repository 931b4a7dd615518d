"""Batched banded Newton solve for the HEVI vertical implicit system.

TPU-native replacement of the reference's per-column LAPACK ``DGBSV`` path
(``VerticalDynamicsFEM.cpp:1437-1464``, bandwidth table ``:165-200``):

- the column unknowns are permuted to the interleaved ordering
  (Rt_k, W_k, Rho_k per level) under which the Jacobian is banded with
  half-bandwidth q (q = 4 at vertical order 1, matching the reference's
  ``m_nJacobianFOffD``);
- the band diagonals are extracted with q-coloring: 2q+1 jvp evaluations of
  the batched residual recover the exact AD Jacobian band for every column
  simultaneously (instead of per-column jacfwd: ~10x fewer passes);
- the banded systems are solved by a no-pivot banded LU via ``lax.scan``
  over rows, fully vectorized across all columns (the TPU-friendly shape:
  each scan step is elementwise math on (ncol,) vectors).
"""

from __future__ import annotations

import functools

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
    J = np.asarray(jax.jacfwd(resid_one)(x_sample))
    Jp = J[np.ix_(perm, perm)]
    mask = np.abs(Jp) > 1e-30
    ii, jj = np.nonzero(mask)
    return int(max(np.max(ii - jj), np.max(jj - ii)))


def extract_bands(batched_resid, x, q: int, perm, inv_perm):
    """Exact banded Jacobian of the batched residual via jvp coloring.

    ``batched_resid``: (ncol, n) -> (ncol, n), columns independent.
    Returns bands (ncol, n, 2q+1) with band[c, i, d] = Jp[c, i, i+d-q]
    in the interleaved ordering (out-of-range entries zero).
    """
    ncol, n = x.shape
    b = 2 * q + 1
    cols = jnp.arange(n)

    def resid_perm(xp):
        return batched_resid(xp[:, inv_perm])[:, perm]

    xp = x[:, perm]

    def one_color(c):
        seed = (cols % b == c).astype(x.dtype)
        _, jv = jax.jvp(resid_perm, (xp,), (jnp.broadcast_to(seed, xp.shape),))
        return jv                                    # (ncol, n)

    jvs = [one_color(c) for c in range(b)]           # b x (ncol, n)

    rows = jnp.arange(n)
    band_list = []
    for d in range(b):
        col_idx = rows + d - q                       # column hit for row i
        color = col_idx % b
        valid = (col_idx >= 0) & (col_idx < n)
        stacked = jnp.stack(jvs, axis=-1)            # (ncol, n, b)
        vals = jnp.take_along_axis(
            stacked, jnp.broadcast_to(color[None, :, None], (ncol, n, 1)),
            axis=-1)[..., 0]
        band_list.append(jnp.where(valid[None, :], vals, 0.0))
    return jnp.stack(band_list, axis=-1)             # (ncol, n, b)


def banded_solve(bands, rhs, q: int):
    """Solve banded systems A x = rhs for every column (no pivoting).

    ``bands``: (ncol, n, 2q+1), band[c, i, d] = A[i, i+d-q].
    The systems carry a strong I/dt diagonal (Newton of backward Euler), so
    pivot-free elimination is stable here (the reference's DGBSV pivots, but
    its fill pattern is equally dominated by the 1/dt diagonal).
    """
    ncol, n, b = bands.shape
    dtype = bands.dtype

    # Forward: eliminate sub-diagonal entries row by row.
    # carry: last q U-rows, each of length q+1: U[i-q+t, i-q+t .. i-q+t+q]
    u_init = jnp.zeros((q, ncol, q + 1), dtype)
    u_init = u_init.at[:, :, 0].set(1.0)             # dummy identity rows

    def fwd(carry, row):
        u_prev, y_prev = carry                        # (q, ncol, q+1), (q, ncol)
        w, rhs_i = row                                # (ncol, 2q+1), (ncol,)
        y_i = rhs_i
        # eliminate columns i-q+t, t = 0..q-1
        for t in range(q):
            f = w[:, t] / u_prev[t][:, 0]             # (ncol,)
            # w positions t+1..t+q align with u_prev[t][1..q]
            w = w.at[:, t + 1:t + q + 1].add(-f[:, None] * u_prev[t][:, 1:])
            y_i = y_i - f * y_prev[t]
        u_i = w[:, q:]                                # (ncol, q+1)
        u_next = jnp.concatenate([u_prev[1:], u_i[None]], axis=0)
        y_next = jnp.concatenate([y_prev[1:], y_i[None]], axis=0)
        return (u_next, y_next), (u_i, y_i)

    y_init = jnp.zeros((q, ncol), dtype)
    (_, _), (U, Y) = jax.lax.scan(
        fwd, (u_init, y_init),
        (jnp.swapaxes(bands, 0, 1), jnp.swapaxes(rhs, 0, 1)))
    # U: (n, ncol, q+1), Y: (n, ncol)

    # Backward substitution (reverse scan)
    x_init = jnp.zeros((q, ncol), dtype)

    def bwd(x_next, row):
        u_i, y_i = row
        acc = y_i
        for d in range(q):
            acc = acc - u_i[:, d + 1] * x_next[d]
        x_i = acc / u_i[:, 0]
        return jnp.concatenate([x_i[None], x_next[:-1]], axis=0), x_i

    _, X = jax.lax.scan(bwd, x_init, (U, Y), reverse=True)
    return jnp.swapaxes(X, 0, 1)                      # (ncol, n)


def banded_newton_update(batched_resid, x0, q: int, nz: int):
    """One Newton step x0 - J^-1 F(x0) using the banded path."""
    perm = jnp.asarray(interleave_perm(nz))
    inv_perm = jnp.argsort(perm)
    f = batched_resid(x0)[:, perm]
    bands = extract_bands(batched_resid, x0, q, perm, inv_perm)
    dx_p = banded_solve(bands, f, q)
    return x0 - dx_p[:, inv_perm]
