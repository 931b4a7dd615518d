"""Gather-formulated DSS: scatter-free direct stiffness summation.

The slice/scatter DSS in ``dss.py`` is algebraically right but lowers to
~840 full-buffer ``dynamic-update-slice`` ops per model step on TPU
(measured: ~8.8 GB/step of pure buffer rewriting, ~30% of step time at
ne30 L30).  TPU-native fix: DSS is a fixed linear operator, so precompute
the coincident-node table once and evaluate

    out[n] = sum_k  W[n, k] * f[ idx[n, k] ]          (scalars)
    out_u[n] = sum_k  (T00 f_u + T01 f_v)[ idx[n, k] ]  (covariant vectors)

with K = 4 slots (max node multiplicity: interior element corners).  The
apply is K static row-gathers + a weighted sum — no scatters, no
dynamic-update-slice, fully fusable.

The table is built numerically: nodes are grouped by their unit-sphere
position (coincident copies agree to ~1e-15; GLL spacing is >=1e-5 rad),
and the per-copy covariant transforms are the exact chain rule through
the sphere basis (same construction as ``geometry._edge_cov_transforms``,
generalized from edge lines to arbitrary coincident pairs).  Equality
with the reference-validated ``dss.apply_dss_*`` is tested to roundoff
(``tests/test_dss.py``).

Reference: ``GridCSGLL::ApplyDSS`` (``src/atm/GridCSGLL.cpp:435-780``).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any

import numpy as np
import jax.numpy as jnp

from ..grid import cubed_sphere as cst


@dataclass(frozen=True)
class DSSTables:
    idx: Any    # (N, K) int32 flat source node per slot; slot 0 = self
    ws: Any     # (N, K) scalar weights (1/multiplicity; 0 on pad slots)
    wv: Any     # (N, K, 2, 2) covariant-transform weights
    A: int


@functools.lru_cache(maxsize=8)
def _build_tables_np(ne: int, p: int):
    from ..grid.geometry import gll_axis
    A = ne * p
    N = 6 * A * A
    alpha, _ = gll_axis(ne, p)
    X = np.tan(alpha)
    xx, yy = np.meshgrid(X, X, indexing="ij")

    xyz = np.zeros((6, A, A, 3))
    for pa in range(6):
        xyz[pa] = np.stack(cst.xyz_from_xyp(xx, yy, pa), axis=-1)
    key = np.round(xyz.reshape(N, 3), 10)

    _, inverse, counts = np.unique(
        key, axis=0, return_inverse=True, return_counts=True)
    inverse = inverse.ravel()
    K = int(counts.max())
    assert K <= 4, K

    order = np.argsort(inverse, kind="stable")
    starts = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])

    idx = np.tile(np.arange(N, dtype=np.int64)[:, None], (1, K))
    ws = np.zeros((N, K))
    mult = counts[inverse].astype(np.float64)
    ws[:, 0] = 1.0 / mult
    # fill slots 1.. with the other group members
    for n_ in range(N):
        g = inverse[n_]
        members = order[starts[g]:starts[g + 1]]
        slot = 1
        for m in members:
            if m == n_:
                continue
            idx[n_, slot] = m
            ws[n_, slot] = 1.0 / mult[n_]
            slot += 1

    # --- covariant vector transforms per slot --------------------------
    # same panel (incl. self): identity; cross panel: chain rule through
    # the sphere basis at the shared physical point.
    wv = np.zeros((N, K, 2, 2))
    wv[:, :, 0, 0] = ws
    wv[:, :, 1, 1] = ws

    panel_of = idx // (A * A)
    self_panel = np.arange(N) // (A * A)
    Xn = np.broadcast_to(xx, (6, A, A)).reshape(N)
    Yn = np.broadcast_to(yy, (6, A, A)).reshape(N)

    for pn in range(6):
        for qm in range(6):
            if pn == qm:
                continue
            sel = np.nonzero((self_panel[:, None] == pn)
                             & (panel_of == qm) & (ws > 0))
            if len(sel[0]) == 0:
                continue
            n_, k_ = sel
            src = idx[n_, k_]
            Xp, Yp = Xn[n_], Yn[n_]
            Xq, Yq = Xn[src], Yn[src]
            M = np.zeros((len(n_), 2, 2))
            for col, (ua, ub) in enumerate(
                    ((np.ones(len(n_)), np.zeros(len(n_))),
                     (np.zeros(len(n_)), np.ones(len(n_))))):
                ulon, ulat = cst.vec_sphere_from_cov(Xq, Yq, qm, ua, ub)
                ca, cb = cst.vec_cov_from_sphere(Xp, Yp, pn, ulon, ulat)
                M[:, 0, col] = ca
                M[:, 1, col] = cb
            wv[n_, k_] = M * ws[n_, k_, None, None]

    return idx.astype(np.int32), ws, wv, A


def build_dss_tables(geom, dtype=None) -> DSSTables:
    """Coincidence/transform tables for this grid (cached by (ne, p))."""
    idx, ws, wv, A = _build_tables_np(geom.ne, geom.p)
    dtype = dtype or jnp.asarray(geom.jac2d).dtype
    return DSSTables(idx=jnp.asarray(idx), ws=jnp.asarray(ws, dtype=dtype),
                     wv=jnp.asarray(wv, dtype=dtype), A=A)


def _bshape(w, flat):
    return w.reshape(w.shape + (1,) * (flat.ndim - 1))


def dss_scalar_gather(f, tab: DSSTables):
    """DSS of a scalar (6, A, B, ...) field — K gathers, no scatter."""
    N, K = tab.idx.shape
    flat = f.reshape((N,) + f.shape[3:])
    out = _bshape(tab.ws[:, 0], flat) * flat          # slot 0 = self
    for k in range(1, K):
        out = out + _bshape(tab.ws[:, k], flat) * flat[tab.idx[:, k]]
    return out.reshape(f.shape)


def dss_vector_gather(fu, fv, tab: DSSTables, wv=None):
    """DSS of a covariant vector pair with panel-edge transforms.

    ``wv``: override the (N, K, 2, 2) transform table (contravariant
    momenta use the inverse-transpose set, see ``highspeed.py``).
    """
    if wv is None:
        wv = tab.wv
    N, K = tab.idx.shape
    u = fu.reshape((N,) + fu.shape[3:])
    v = fv.reshape((N,) + fv.shape[3:])
    ou = _bshape(wv[:, 0, 0, 0], u) * u + _bshape(wv[:, 0, 0, 1], v) * v
    ov = _bshape(wv[:, 0, 1, 0], u) * u + _bshape(wv[:, 0, 1, 1], v) * v
    for k in range(1, K):
        gu = u[tab.idx[:, k]]
        gv = v[tab.idx[:, k]]
        ou = ou + _bshape(wv[:, k, 0, 0], u) * gu \
                + _bshape(wv[:, k, 0, 1], v) * gv
        ov = ov + _bshape(wv[:, k, 1, 0], u) * gu \
                + _bshape(wv[:, k, 1, 1], v) * gv
    return ou.reshape(fu.shape), ov.reshape(fv.shape)


def build_contra_wv(geom) -> Any:
    """(N, K, 2, 2) transform table for CONTRAVARIANT vector pairs.

    Contravariant components rotate with the inverse-transpose of the
    covariant matrices; weights (1/multiplicity) are reapplied after
    inverting the unweighted transforms.
    """
    idx, ws, wv, A = _build_tables_np(geom.ne, geom.p)
    raw = np.array(wv)
    safe = np.where(ws[..., None, None] > 0, ws[..., None, None], 1.0)
    unweighted = raw / safe
    # pad slots hold zero matrices; substitute identity before inverting
    zero = ws <= 0
    unweighted[zero] = np.eye(2)
    contra = np.swapaxes(np.linalg.inv(unweighted), -1, -2)
    contra[zero] = 0.0
    contra = contra * np.where(ws[..., None, None] > 0,
                               ws[..., None, None], 0.0)
    dtype = jnp.asarray(geom.jac2d).dtype
    return jnp.asarray(contra, dtype=dtype)
