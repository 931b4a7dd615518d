"""Pallas TPU kernel: cubed-sphere DSS in one launch per field.

The DSS of ``parallel/dss.py`` (interior element pair-sums + 24
neighbor-panel edge contributions + multiplicity normalization) compiled
as ONE kernel over the full (z, 6, A, B) field: the reference-layout
formulation launches ~500 XLA kernels per state DSS (strided updates,
per-edge slices/DUS), and even the batched gather/scatter formulation
costs ~2 ms/call in XLA fusions; here the whole operation is VMEM-local
arithmetic per z-block.

Scalar fields DSS independently; (U, V) covariant pairs rotate
neighbor-edge contributions with the per-node 2x2 panel transforms
(``TransformHaloVelocities`` analog — tables from
``grid/geometry.edge_mats``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..grid.geometry import EDGE_LEFT, EDGE_RIGHT, EDGE_BOTTOM, EDGE_TOP


def _pair_masks(A: int, p: int, dtype):
    a = jax.lax.broadcasted_iota(jnp.int32, (A, 1), 0)
    m_hi = ((a % p == p - 1) & (a < A - 1)).astype(dtype)     # (A, 1)
    m_lo = ((a % p == 0) & (a > 0)).astype(dtype)
    return m_hi, m_lo


def _rev_matrix(A: int, dtype):
    """(A, A) anti-diagonal flip matrix, built from iota in-kernel."""
    i = jax.lax.broadcasted_iota(jnp.int32, (A, A), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (A, A), 1)
    return (i + j == A - 1).astype(dtype)


def _pair_sum(x, p: int):
    """Interior element pair sums along axes 2 (A) and 3 (B) of a
    (cb, 6, A, B) block; equals parallel/dss._pair_sum_interior."""
    A, B = x.shape[2], x.shape[3]
    dt = x.dtype
    m_hi_a, m_lo_a = _pair_masks(A, p, dt)
    # pltpu.roll requires non-negative shifts: shift A-1 == shift -1
    x = (x + pltpu.roll(x, A - 1, 2) * m_hi_a
         + pltpu.roll(x, 1, 2) * m_lo_a)
    m_hi_b, m_lo_b = _pair_masks(B, p, dt)
    m_hi_b = m_hi_b.reshape(1, B)
    m_lo_b = m_lo_b.reshape(1, B)
    x = (x + pltpu.roll(x, B - 1, 3) * m_hi_b
         + pltpu.roll(x, 1, 3) * m_lo_b)
    return x


def _read_edge(x, panel: int, edge: int):
    """Edge line of one panel in canonical row form (cb, 1, L)."""
    A, B = x.shape[2], x.shape[3]
    if edge == EDGE_LEFT:
        line = x[:, panel, 0:1, :]
    elif edge == EDGE_RIGHT:
        line = x[:, panel, A - 1:A, :]
    elif edge == EDGE_BOTTOM:
        line = jnp.swapaxes(x[:, panel, :, 0:1], 1, 2)
    elif edge == EDGE_TOP:
        line = jnp.swapaxes(x[:, panel, :, B - 1:B], 1, 2)
    else:
        raise ValueError(edge)
    return line


def _flip_row(line, rev):
    """Reverse a row-form line (cb, 1, L) along lanes via the flip matrix
    (negative-stride slicing is not available in Mosaic)."""
    cb, _, L = line.shape
    flat = line.reshape(cb, L)
    return jax.lax.dot_general(
        flat, rev, (((1,), (0,)), ((), ())),
        preferred_element_type=flat.dtype).reshape(cb, 1, L)


def _add_edge(out_ref, panel: int, edge: int, line):
    """Accumulate a row-form line into an output edge (read-modify-write)."""
    A = out_ref.shape[2]
    B = out_ref.shape[3]
    if edge == EDGE_LEFT:
        out_ref[:, panel, 0:1, :] += line
    elif edge == EDGE_RIGHT:
        out_ref[:, panel, A - 1:A, :] += line
    elif edge == EDGE_BOTTOM:
        out_ref[:, panel, :, 0:1] += jnp.swapaxes(line, 1, 2)
    elif edge == EDGE_TOP:
        out_ref[:, panel, :, B - 1:B] += jnp.swapaxes(line, 1, 2)
    else:
        raise ValueError(edge)


def _scalar_kernel(p, links, x_ref, imult_ref, out_ref):
    x = _pair_sum(x_ref[...], p)
    A = x.shape[2]
    rev = _rev_matrix(A, x.dtype)
    out_ref[...] = x
    for (pa, e, qa, qe, flip) in links:
        line = _read_edge(x, qa, qe)
        if flip:
            line = _flip_row(line, rev)
        _add_edge(out_ref, pa, e, line)
    out_ref[...] = out_ref[...] * imult_ref[...][None]


def _vector_kernel(p, links, u_ref, v_ref, imult_ref, rot_ref,
                   uout_ref, vout_ref):
    u = _pair_sum(u_ref[...], p)
    v = _pair_sum(v_ref[...], p)
    A = u.shape[2]
    rev = _rev_matrix(A, u.dtype)
    uout_ref[...] = u
    vout_ref[...] = v
    for i, (pa, e, qa, qe, flip) in enumerate(links):
        lu = _read_edge(u, qa, qe)
        lv = _read_edge(v, qa, qe)
        if flip:
            lu = _flip_row(lu, rev)
            lv = _flip_row(lv, rev)
        m00 = rot_ref[0, i:i + 1, :][None]           # (1, 1, A)
        m01 = rot_ref[1, i:i + 1, :][None]
        m10 = rot_ref[2, i:i + 1, :][None]
        m11 = rot_ref[3, i:i + 1, :][None]
        _add_edge(uout_ref, pa, e, m00 * lu + m01 * lv)
        _add_edge(vout_ref, pa, e, m10 * lu + m11 * lv)
    w = imult_ref[...][None]
    uout_ref[...] = uout_ref[...] * w
    vout_ref[...] = vout_ref[...] * w


def _grid_spec(K, cb, A, B, n_data: int, extras):
    grid = (pl.cdiv(K, cb),)
    data_spec = pl.BlockSpec((cb, 6, A, B), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    whole = [pl.BlockSpec(e.shape, (lambda nd: lambda i: (0,) * nd)(e.ndim),
                          memory_space=pltpu.VMEM) for e in extras]
    return grid, [data_spec] * n_data + whole, data_spec


def dss_scalar(f, imult, links, p: int, cb: int = 4, interpret=None):
    """DSS of a scalar (K, 6, A, B) field; one kernel launch."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    K, _, A, B = f.shape
    grid, in_specs, out_spec = _grid_spec(K, cb, A, B, 1, [imult])
    kern = functools.partial(_scalar_kernel, p, tuple(links))
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(f.shape, f.dtype),
        interpret=interpret,
    )(f, imult)


def dss_vector(u, v, imult, rot, links, p: int, cb: int = 2,
               interpret=None):
    """DSS of a covariant vector pair (K, 6, A, B) x2; one launch."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    K, _, A, B = u.shape
    grid, in_specs, out_spec = _grid_spec(K, cb, A, B, 2, [imult, rot])
    kern = functools.partial(_vector_kernel, p, tuple(links))
    uo, vo = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct(u.shape, u.dtype),
                   jax.ShapeDtypeStruct(v.shape, v.dtype)),
        interpret=interpret,
    )(u, v, imult, rot)
    return uo, vo
