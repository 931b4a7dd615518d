"""Pallas TPU kernel: batched no-pivot banded LU solve.

The "batched Thomas/banded vertical solver" of the north star
(BASELINE.json): each of ~1e5 independent column systems (the HEVI
vertical implicit Newton systems, half-bandwidth q) is solved entirely in
VMEM.  The row recurrence runs in on-chip ``fori_loop``s over a
column-tile, so the whole solve is ONE kernel launch instead of an XLA
scan of 2n dependent HBM-roundtrip steps.

Layout contract matches ``models/vertical_banded.banded_solve_t``:
bands (n, 2q+1, ncol) with band[i, d] = A[i, i+d-q], rhs (n, ncol).
Out-of-range band entries must be zero (guaranteed by the extractor) —
the kernel exploits this so no masking is needed at the boundaries.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _banded_kernel(q, n, bands_ref, rhs_ref, out_ref, u_ref, y_ref):
    """Forward elimination + back substitution for one column tile.

    u_ref: (n, q+1, tile) U-factor rows; y_ref: (n, tile) forward solution.
    """
    dtype = bands_ref.dtype

    # Boundary rows read clamped (not-yet-written) scratch entries with a
    # zero multiplier; initialize so 0 * x and 0 / x stay finite.
    u_ref[...] = jnp.zeros_like(u_ref)
    u_ref[:, 0, :] = jnp.ones_like(u_ref[:, 0, :])
    y_ref[...] = jnp.zeros_like(y_ref)
    out_ref[...] = jnp.zeros_like(out_ref)

    def fwd(i, _):
        w = bands_ref[i]                       # (2q+1, tile)
        y_i = rhs_ref[i]                       # (tile,)
        for t in range(q):
            # eliminate column i-q+t using U row (i-q+t); for i-q+t < 0 the
            # band entry w[t] is zero so the clamped read is harmless
            row = jnp.maximum(i - q + t, 0)
            u_prev = u_ref[row]                # (q+1, tile)
            f = w[t] / u_prev[0]
            # static-slice concat (Mosaic has no scatter-add on values)
            w = jnp.concatenate(
                [w[:t + 1],
                 w[t + 1:t + q + 1] - f[None, :] * u_prev[1:],
                 w[t + q + 1:]], axis=0)
            y_i = y_i - f * y_ref[row]
        u_ref[i] = w[q:]
        y_ref[i] = y_i
        return 0

    jax.lax.fori_loop(0, n, fwd, 0)

    def bwd(j, _):
        i = n - 1 - j
        u_i = u_ref[i]                         # (q+1, tile)
        acc = y_ref[i]
        for d in range(q):
            # rows beyond n-1: u_i[d+1] is zero there (band guarantee)
            nxt = jnp.minimum(i + d + 1, n - 1)
            acc = acc - u_i[d + 1] * out_ref[nxt]
        out_ref[i] = acc / u_i[0]
        return 0

    jax.lax.fori_loop(0, n, bwd, 0)


def _banded_multi_kernel(q, n, R, bands_ref, rhs_ref, out_ref, u_ref,
                         y_ref):
    """Forward elimination ONCE per column + back substitution for R
    right-hand sides sharing the band matrix (the reference's
    DGETRF-once / DGETRS-per-species tracer update,
    ``VerticalDynamicsFEM.cpp:4028-4262``).

    rhs_ref/out_ref: (n, R, tile); u_ref: (n, q+1, tile); y_ref:
    (n, R, tile).
    """
    u_ref[...] = jnp.zeros_like(u_ref)
    u_ref[:, 0, :] = jnp.ones_like(u_ref[:, 0, :])
    y_ref[...] = jnp.zeros_like(y_ref)
    out_ref[...] = jnp.zeros_like(out_ref)

    def fwd(i, _):
        w = bands_ref[i]                       # (2q+1, tile)
        y_i = rhs_ref[i]                       # (R, tile)
        for t in range(q):
            row = jnp.maximum(i - q + t, 0)
            u_prev = u_ref[row]                # (q+1, tile)
            f = w[t] / u_prev[0]               # (tile,)
            w = jnp.concatenate(
                [w[:t + 1],
                 w[t + 1:t + q + 1] - f[None, :] * u_prev[1:],
                 w[t + q + 1:]], axis=0)
            y_i = y_i - f[None, :] * y_ref[row]
        u_ref[i] = w[q:]
        y_ref[i] = y_i
        return 0

    jax.lax.fori_loop(0, n, fwd, 0)

    def bwd(j, _):
        i = n - 1 - j
        u_i = u_ref[i]                         # (q+1, tile)
        acc = y_ref[i]                         # (R, tile)
        for d in range(q):
            nxt = jnp.minimum(i + d + 1, n - 1)
            acc = acc - u_i[d + 1][None, :] * out_ref[nxt]
        out_ref[i] = acc / u_i[0][None, :]
        return 0

    jax.lax.fori_loop(0, n, bwd, 0)


def banded_solve_multi_pallas(bands, rhs, q: int, col_tile: int = 512,
                              interpret: bool = None):
    """Solve the batched banded systems for R shared-matrix RHS in one
    kernel: ``bands`` (n, 2q+1, ncol), ``rhs`` (n, R, ncol) ->
    (n, R, ncol).  The elimination runs ONCE per column; each RHS only
    pays the forward/backward substitution."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, b, ncol = bands.shape
    R = rhs.shape[1]
    assert b == 2 * q + 1 and rhs.shape == (n, R, ncol)
    if ncol % col_tile != 0:
        pad = col_tile - ncol % col_tile
        bands = jnp.pad(bands, ((0, 0), (0, 0), (0, pad)))
        bands = bands.at[:, q, ncol:].set(1.0)
        rhs = jnp.pad(rhs, ((0, 0), (0, 0), (0, pad)))
        out = banded_solve_multi_pallas(bands, rhs, q, col_tile, interpret)
        return out[:, :, :ncol]

    grid = (ncol // col_tile,)
    kernel = functools.partial(_banded_multi_kernel, q, n, R)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, b, col_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, R, col_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, R, col_tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, R, ncol), bands.dtype),
        scratch_shapes=[
            pltpu.VMEM((n, q + 1, col_tile), bands.dtype),
            pltpu.VMEM((n, R, col_tile), bands.dtype),
        ],
        interpret=interpret,
    )(bands, rhs)


def banded_solve_pallas(bands, rhs, q: int, col_tile: int = 512,
                        interpret: bool = None):
    """Solve the batched banded systems with one Pallas kernel.

    ``bands``: (n, 2q+1, ncol); ``rhs``: (n, ncol) -> (n, ncol).
    Pads ``ncol`` up to a multiple of ``col_tile`` internally.
    ``interpret``: force interpreter mode (auto: on for CPU backend).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, b, ncol = bands.shape
    assert b == 2 * q + 1
    if ncol % col_tile != 0:
        pad = col_tile - ncol % col_tile
        bands = jnp.pad(bands, ((0, 0), (0, 0), (0, pad)))
        # padded columns get identity diagonals to avoid 0/0
        bands = bands.at[:, q, ncol:].set(1.0)
        rhs = jnp.pad(rhs, ((0, 0), (0, pad)))
        out = banded_solve_pallas(bands, rhs, q, col_tile, interpret)
        return out[:, :ncol]

    grid = (ncol // col_tile,)
    kernel = functools.partial(_banded_kernel, q, n)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, b, col_tile), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, col_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, col_tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ncol), bands.dtype),
        scratch_shapes=[
            pltpu.VMEM((n, q + 1, col_tile), bands.dtype),
            pltpu.VMEM((n, col_tile), bands.dtype),
        ],
        interpret=interpret,
    )(bands, rhs)
