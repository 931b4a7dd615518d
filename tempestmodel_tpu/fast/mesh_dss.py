"""Mesh-distributed DSS for the z-first fast engine.

The TPU-native analog of the reference's per-patch-pair exchange buffers
(``/root/reference/src/atm/Connectivity.h:67``, ``Connectivity.cpp:47-749``):
every message between two devices is computed STATICALLY from the cube
edge table (``grid/geometry.edge_meta``) and the mesh shape, grouped per
ordered device pair (the reference aggregates per-peer-rank byte buffers
the same way, ``Connectivity.h:429-444``), and scheduled into ppermute
rounds by greedy edge coloring of the device-pair graph.  Unlike the
round-2 ``parallel/dss_shardmap`` layer, the 24 panel-edge lines are
never replicated by a mesh-wide psum — each device receives exactly the
line segments its own panel-edge nodes need (O(surface / n_devices)
bytes), the byte-optimal routing the round-3 verdict asked for.

Layout: z-first local blocks ``(K, 6, a, b)`` per field, where
``a = A/mx`` and ``b = A/my`` are the per-device extents of the two
horizontal axes.  All five state fields ride in one exchange payload,
stacked along the leading (level) axis, so one Strang-stage DSS costs
one round-set of ppermutes regardless of field count.

Semantics are the exact DSS of ``fast/dss_pallas`` (pair sums, then
panel-edge adds with the covariant U/V rotation of
``TransformHaloVelocities``, ``GridPatchCSGLL.cpp:1783``, then 1/mult
normalization); sharded and single-device trajectories agree to
near-roundoff (``tests/test_fast_mesh.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..grid.geometry import EDGE_LEFT, EDGE_RIGHT, EDGE_BOTTOM, EDGE_TOP

FIELDS = ("U", "V", "Rt", "Rho", "W")


# ---------------------------------------------------------------------------
# static routing (host side)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Msg:
    """One statically-routed segment of one panel-edge link."""
    link: int            # index into edge_meta
    src: tuple           # (ix, iy) source device
    dst: tuple           # (ix, iy) destination device
    src_lo: int          # offsets within the source device's line chunk
    src_hi: int
    dst_lo: int          # offsets within the destination device's chunk
    dst_hi: int
    g0: int              # GLOBAL dest-line positions (rotation slicing)
    g1: int
    flip: bool


def _edge_chunks(e: int, mx: int, my: int, A: int):
    """(n_chunks, chunk_len) of an edge line over the mesh."""
    if e in (EDGE_LEFT, EDGE_RIGHT):
        return my, A // my
    return mx, A // mx


def _edge_dev(e: int, j: int, mx: int, my: int):
    """Device coords owning chunk j of a panel edge line."""
    if e == EDGE_LEFT:
        return (0, j)
    if e == EDGE_RIGHT:
        return (mx - 1, j)
    if e == EDGE_BOTTOM:
        return (j, 0)
    return (j, my - 1)


def build_edge_routing(edge_meta, mx: int, my: int, A: int):
    """Static message list + ppermute round schedule.

    Returns (local_msgs, rounds) where ``rounds`` is a list of rounds,
    each a list of ``((src, dst), [Msg, ...])`` with distinct sources and
    distinct destinations (a partial permutation — one ppermute each).
    """
    msgs = []
    for li, (pa, e, qa, qe, flip) in enumerate(edge_meta):
        nd, cld = _edge_chunks(e, mx, my, A)
        ns, cls_ = _edge_chunks(qe, mx, my, A)
        for j in range(nd):
            t0, t1 = j * cld, (j + 1) * cld
            s0, s1 = (A - t1, A - t0) if flip else (t0, t1)
            for i in range(ns):
                c0, c1 = i * cls_, (i + 1) * cls_
                lo, hi = max(s0, c0), min(s1, c1)
                if lo >= hi:
                    continue
                g0, g1 = (A - hi, A - lo) if flip else (lo, hi)
                msgs.append(Msg(
                    link=li, src=_edge_dev(qe, i, mx, my),
                    dst=_edge_dev(e, j, mx, my),
                    src_lo=lo - c0, src_hi=hi - c0,
                    dst_lo=g0 - t0, dst_hi=g1 - t0, g0=g0, g1=g1,
                    flip=flip))

    local = [m for m in msgs if m.src == m.dst]
    pairs = {}
    for m in msgs:
        if m.src != m.dst:
            pairs.setdefault((m.src, m.dst), []).append(m)
    # deterministic per-pair message order (payload packing order)
    for v in pairs.values():
        v.sort(key=lambda m: (m.link, m.g0))

    # greedy edge coloring: each round is a partial permutation
    rounds = []
    for key in sorted(pairs):
        for r in rounds:
            if all(k[0] != key[0] and k[1] != key[1] for k, _ in r):
                r.append((key, pairs[key]))
                break
        else:
            rounds.append([(key, pairs[key])])
    return local, rounds


def expected_exchange_bytes(edge_meta, mx: int, my: int, A: int,
                            ktot: int, itemsize: int) -> int:
    """EXACT collective-permute bytes of ONE inline-schedule DSS call
    (the per-shard HLO operand bytes, matching what
    ``parallel.analyze.collective_report`` tallies): 2 cross-pair line
    ppermutes per partitioned axis plus one (ktot, L_round) ppermute per
    routed edge round.  Lets tests pin the exchange volume to the exact
    static routing instead of a loose bound."""
    _, rounds = build_edge_routing(edge_meta, mx, my, A)
    a, b = A // mx, A // my
    total = 0
    if mx > 1:
        total += 2 * ktot * 6 * b * itemsize
    if my > 1:
        total += 2 * ktot * 6 * a * itemsize
    for rnd in rounds:
        L = max(sum(m.src_hi - m.src_lo for m in ms) for _, ms in rnd)
        total += ktot * L * itemsize
    return total


def routing_stats(edge_meta, mx: int, my: int, A: int):
    """(n_rounds, n_messages, line_units_moved) — for analyze/docs.

    ``line_units_moved`` counts exchanged line elements (x K levels x
    dtype bytes gives exchange bytes); the psum formulation moves
    24*A units per device per call regardless of mesh size.
    """
    local, rounds = build_edge_routing(edge_meta, mx, my, A)
    n_msgs = sum(len(ms) for r in rounds for _, ms in r)
    units = sum(m.src_hi - m.src_lo for r in rounds for _, ms in r
                for m in ms)
    return len(rounds), n_msgs, units


# ---------------------------------------------------------------------------
# traced building blocks (run inside shard_map on (K, 6, a, b) blocks)
# ---------------------------------------------------------------------------

def local_pair_sum(f, p: int):
    """Element-boundary pair sums interior to the local block (z-first)."""
    a, b = f.shape[2], f.shape[3]
    if a > p:
        hi = f[:, :, p - 1:-1:p]
        lo = f[:, :, p::p]
        s = hi + lo
        f = f.at[:, :, p - 1:-1:p].set(s).at[:, :, p::p].set(s)
    if b > p:
        hi = f[..., p - 1:-1:p]
        lo = f[..., p::p]
        s = hi + lo
        f = f.at[..., p - 1:-1:p].set(s).at[..., p::p].set(s)
    return f


def _extract_edge(s, pa: int, e: int):
    """Local chunk of a panel edge line, (K, clen)."""
    if e == EDGE_LEFT:
        return s[:, pa, 0, :]
    if e == EDGE_RIGHT:
        return s[:, pa, -1, :]
    if e == EDGE_BOTTOM:
        return s[:, pa, :, 0]
    return s[:, pa, :, -1]


def _add_edge(s, pa: int, e: int, line):
    if e == EDGE_LEFT:
        return s.at[:, pa, 0, :].add(line)
    if e == EDGE_RIGHT:
        return s.at[:, pa, -1, :].add(line)
    if e == EDGE_BOTTOM:
        return s.at[:, pa, :, 0].add(line)
    return s.at[:, pa, :, -1].add(line)


def _pair_sum_line(ln, p: int):
    """1-D element pair sums along axis 2 of a (K, 6, L) line tensor.
    Identical slice expressions to ``local_pair_sum`` so line-level and
    block-level results agree BITWISE."""
    L = ln.shape[2]
    if L > p:
        hi = ln[:, :, p - 1:-1:p]
        lo = ln[:, :, p::p]
        s = hi + lo
        ln = ln.at[:, :, p - 1:-1:p].set(s).at[:, :, p::p].set(s)
    return ln


def make_state_dss_mesh(edge_meta, e_rot, mx: int, my: int, A: int,
                        p: int, nz: int, overlap: bool = False):
    """Build ``dss_state(s_dict, inv_mult_local) -> s_dict`` for use
    inside a shard_map over mesh axes ("x", "y").

    ``e_rot``: host numpy (4, n_links, A) destination-edge covariant
    rotation rows [m00, m01, m10, m11] (``fast/engine.build_fast_geometry``).

    ``overlap``: emit the halo-overlap schedule — every collective's
    operands are computed from O(surface) line-only arithmetic issued
    BEFORE the O(volume) interior pair-sum compute, so XLA's async
    collectives (collective-permute-start/done) and the latency-hiding
    scheduler can run the exchange concurrently with interior compute —
    the TPU analog of the reference's Isend-early / Wait-late overlap
    (``/root/reference/src/atm/Grid.cpp:627-665``,
    ``Connectivity.cpp:928``).  Results are BITWISE equal to the inline
    schedule (``tests/test_fast_mesh.py::test_overlap_schedule_bit_equal``).
    """
    e_rot = np.asarray(e_rot)
    local_msgs, rounds = build_edge_routing(edge_meta, mx, my, A)

    def _layout(d):
        """Payload row layout, computed at trace time from the state:
        U | V | Rt | Rho | W [| Tracers] — extra scalar fields (the flat
        species-major tracer block) ride after W and need no rotation."""
        flds = list(FIELDS) + [k for k in d if k not in FIELDS]
        sizes = {f: d[f].shape[0] for f in flds}
        offs = {}
        o = 0
        for f in flds:
            offs[f] = o
            o += sizes[f]
        return flds, sizes, offs, o

    def _lin(dev):
        return dev[0] * my + dev[1]

    def _is_dev(dev):
        return ((lax.axis_index("x") == dev[0])
                & (lax.axis_index("y") == dev[1]))

    def _pack_lines(s, flds):
        lines = {}
        for pa in range(6):
            for e in range(4):
                lines[(pa, e)] = jnp.concatenate(
                    [_extract_edge(s[f], pa, e) for f in flds], axis=0)
        return lines

    def _rotate_and_slot(m: Msg, seg, dtype):
        """Flip to dest order, rotate the U/V rows with the destination
        edge transforms, return (ktot, L) contribution in dest order."""
        if m.flip:
            seg = seg[:, ::-1]
        su = seg[0:nz]
        sv = seg[nz:2 * nz]
        m00 = jnp.asarray(e_rot[0, m.link, m.g0:m.g1], dtype)
        m01 = jnp.asarray(e_rot[1, m.link, m.g0:m.g1], dtype)
        m10 = jnp.asarray(e_rot[2, m.link, m.g0:m.g1], dtype)
        m11 = jnp.asarray(e_rot[3, m.link, m.g0:m.g1], dtype)
        ru = m00[None] * su + m01[None] * sv
        rv = m10[None] * su + m11[None] * sv
        return jnp.concatenate([ru, rv, seg[2 * nz:]], axis=0)

    def _cross_pairs(s, flds, sizes, offs):
        """Cross-shard element pair sums (width-1 line ppermutes)."""
        if mx > 1:
            first = jnp.concatenate([s[f][:, :, 0, :] for f in flds], 0)
            last = jnp.concatenate([s[f][:, :, -1, :] for f in flds], 0)
            recv_r = lax.ppermute(first, "x",
                                  [(i, i - 1) for i in range(1, mx)])
            recv_l = lax.ppermute(last, "x",
                                  [(i, i + 1) for i in range(mx - 1)])
            nl = last + recv_r
            nf = recv_l + first
            for f in flds:
                k0 = offs[f]
                k1 = k0 + sizes[f]
                s[f] = s[f].at[:, :, -1, :].set(nl[k0:k1]) \
                           .at[:, :, 0, :].set(nf[k0:k1])
        if my > 1:
            first = jnp.concatenate([s[f][..., 0] for f in flds], 0)
            last = jnp.concatenate([s[f][..., -1] for f in flds], 0)
            recv_r = lax.ppermute(first, "y",
                                  [(i, i - 1) for i in range(1, my)])
            recv_l = lax.ppermute(last, "y",
                                  [(i, i + 1) for i in range(my - 1)])
            nl = last + recv_r
            nf = recv_l + first
            for f in flds:
                k0 = offs[f]
                k1 = k0 + sizes[f]
                s[f] = s[f].at[..., -1].set(nl[k0:k1]) \
                           .at[..., 0].set(nf[k0:k1])
        return s

    def _edge_contribs(lines, ktot, dtype):
        """Routed exchange of the panel-edge lines: ppermute rounds +
        locally-satisfied segments.  Returns [(Msg, (ktot, L) seg)]."""
        contribs = []
        for rnd in rounds:
            pl_len = {key: sum(m.src_hi - m.src_lo for m in ms)
                      for key, ms in rnd}
            L = max(pl_len.values())
            buf = jnp.zeros((ktot, L), dtype)
            for key, ms in rnd:
                parts = []
                for m in ms:
                    qa, qe = edge_meta[m.link][2], edge_meta[m.link][3]
                    parts.append(lines[(qa, qe)][:, m.src_lo:m.src_hi])
                payload = jnp.concatenate(parts, axis=1)
                if payload.shape[1] < L:
                    payload = jnp.pad(payload,
                                      ((0, 0), (0, L - payload.shape[1])))
                buf = jnp.where(_is_dev(key[0]), payload, buf)
            perm = [(_lin(key[0]), _lin(key[1])) for key, _ in rnd]
            recv = lax.ppermute(buf, ("x", "y"), perm)
            for key, ms in rnd:
                off = 0
                for m in ms:
                    ln = m.src_hi - m.src_lo
                    contribs.append((m, recv[:, off:off + ln]))
                    off += ln
        for m in local_msgs:
            qa, qe = edge_meta[m.link][2], edge_meta[m.link][3]
            contribs.append((m, lines[(qa, qe)][:, m.src_lo:m.src_hi]))
        return contribs

    def _apply_edges(s, contribs, flds, sizes, offs, ktot, dtype):
        """Accumulate contributions per destination edge (one link per
        (pa, e)), masked to the destination device, in edge_meta order."""
        contribs = sorted(contribs, key=lambda t: (t[0].link, t[0].g0))
        edge_add = {}
        for m, seg in contribs:
            pa, e = edge_meta[m.link][0], edge_meta[m.link][1]
            val = _rotate_and_slot(m, seg, dtype)
            val = jnp.where(_is_dev(m.dst), val, jnp.zeros_like(val))
            acc = edge_add.get((pa, e))
            if acc is None:
                _, cl = _edge_chunks(e, mx, my, A)
                acc = jnp.zeros((ktot, cl), dtype)
            edge_add[(pa, e)] = acc.at[:, m.dst_lo:m.dst_hi].add(val)
        for (pa, e), acc in edge_add.items():
            for f in flds:
                k0 = offs[f]
                k1 = k0 + sizes[f]
                s[f] = _add_edge(s[f], pa, e, acc[k0:k1])
        return s

    def dss_state_inline(d, inv_mult):
        dtype = d["U"].dtype
        flds, sizes, offs, ktot = _layout(d)
        s = {f: local_pair_sum(d[f], p) for f in flds}
        s = _cross_pairs(s, flds, sizes, offs)
        lines = _pack_lines(s, flds)
        contribs = _edge_contribs(lines, ktot, dtype)
        s = _apply_edges(s, contribs, flds, sizes, offs, ktot, dtype)
        w3 = inv_mult[None]
        return {f: s[f] * w3 for f in flds}

    def dss_state_overlap(d, inv_mult):
        """Same arithmetic as the inline schedule, reordered so every
        collective depends only on O(surface) line compute: the
        boundary-line pair sums and cross-shard/edge exchanges are all
        issued before the interior block pair-sum, which XLA may then
        execute while the permutes are in flight."""
        dtype = d["U"].dtype
        flds, sizes, offs, ktot = _layout(d)

        def pack(sel):
            return jnp.concatenate([sel(d[f]) for f in flds], axis=0)

        # column boundary lines (a = 0 / a = -1), pair-summed along b
        ncf = _pair_sum_line(pack(lambda f: f[:, :, 0, :]), p)
        ncl = _pair_sum_line(pack(lambda f: f[:, :, -1, :]), p)
        if mx > 1:
            recv_r = lax.ppermute(ncf, "x",
                                  [(i, i - 1) for i in range(1, mx)])
            recv_l = lax.ppermute(ncl, "x",
                                  [(i, i + 1) for i in range(mx - 1)])
            ncf, ncl = recv_l + ncf, ncl + recv_r
        # row boundary lines, pair-summed along a, corners patched with
        # the cross-x results (the inline schedule's cross-y operands
        # carry the cross-x contributions at shard corners)
        nrf = _pair_sum_line(pack(lambda f: f[..., 0]), p)
        nrl = _pair_sum_line(pack(lambda f: f[..., -1]), p)
        nrf = nrf.at[:, :, 0].set(ncf[:, :, 0]) \
                 .at[:, :, -1].set(ncl[:, :, 0])
        nrl = nrl.at[:, :, 0].set(ncf[:, :, -1]) \
                 .at[:, :, -1].set(ncl[:, :, -1])
        if my > 1:
            recv_r = lax.ppermute(nrf, "y",
                                  [(i, i - 1) for i in range(1, my)])
            recv_l = lax.ppermute(nrl, "y",
                                  [(i, i + 1) for i in range(my - 1)])
            nrf, nrl = recv_l + nrf, nrl + recv_r
        # panel-edge lines assembled from line-level results only (the
        # row lines carry final corner values; columns get them patched)
        lines = {}
        for pa in range(6):
            lines[(pa, EDGE_LEFT)] = ncf[:, pa] \
                .at[:, 0].set(nrf[:, pa, 0]).at[:, -1].set(nrl[:, pa, 0])
            lines[(pa, EDGE_RIGHT)] = ncl[:, pa] \
                .at[:, 0].set(nrf[:, pa, -1]) \
                .at[:, -1].set(nrl[:, pa, -1])
            lines[(pa, EDGE_BOTTOM)] = nrf[:, pa]
            lines[(pa, EDGE_TOP)] = nrl[:, pa]
        contribs = _edge_contribs(lines, ktot, dtype)

        # interior block compute — independent of every collective above
        s = {f: local_pair_sum(d[f], p) for f in flds}
        for f in flds:
            k0 = offs[f]
            k1 = k0 + sizes[f]
            s[f] = s[f].at[:, :, 0, :].set(ncf[k0:k1]) \
                       .at[:, :, -1, :].set(ncl[k0:k1]) \
                       .at[..., 0].set(nrf[k0:k1]) \
                       .at[..., -1].set(nrl[k0:k1])
        s = _apply_edges(s, contribs, flds, sizes, offs, ktot, dtype)
        w3 = inv_mult[None]
        return {f: s[f] * w3 for f in flds}

    return dss_state_overlap if overlap else dss_state_inline
