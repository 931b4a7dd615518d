"""GSPMD collective analysis: what XLA actually emits for the DSS.

The reference's halo-exchange layer is explicit MPI point-to-point
(``src/atm/Connectivity.cpp:928-1100``).  Ours is GSPMD partitioning of
static gathers; the correctness tests (``tests/test_multidevice.py``)
prove the answer is right, and this module proves the *communication
volume* is right: it compiles a function under a sharding, walks the
optimized HLO, and tallies every collective op with the byte volume of
its operands — so "GSPMD is not all-gathering whole panels" is a
measurable statement, not a hope.

Usage::

    from tempestmodel_tpu.parallel.analyze import collective_report
    rep = collective_report(step_fn, (state,), mesh, P(None, "x", "y"))
    print(format_report(rep))
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np
import jax


_COLLECTIVE_OPS = (
    "all-gather", "all-reduce", "collective-permute", "all-to-all",
    "reduce-scatter", "collective-broadcast",
)

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "s64": 8, "u64": 8, "pred": 1, "s8": 1, "u8": 1}


def _shape_bytes(shape_str: str) -> int:
    """Bytes of an HLO shape string like 'f64[6,16,16,6]' or a tuple."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 8)
    return total


@dataclass
class CollectiveReport:
    counts: dict = field(default_factory=dict)    # op kind -> count
    bytes_: dict = field(default_factory=dict)    # op kind -> total bytes
    largest: list = field(default_factory=list)   # (bytes, kind, shape)
    input_bytes: int = 0                          # total (global) arg bytes


def collective_report(fn: Callable, args: tuple, mesh, spec,
                      donate: bool = False) -> CollectiveReport:
    """Compile ``fn(*args)`` with args sharded by ``spec`` over ``mesh``
    and tally the collectives in the optimized (SPMD-partitioned) HLO."""
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, spec)
    sharded = jax.tree.map(lambda a: jax.device_put(a, sh), args)
    with mesh:
        lowered = jax.jit(fn).lower(*sharded)
        compiled = lowered.compile()
    hlo = compiled.as_text()

    rep = CollectiveReport()
    leaves = jax.tree.leaves(args)
    rep.input_bytes = int(sum(np.asarray(a).nbytes for a in leaves))
    for line in hlo.splitlines():
        ls = line.strip()
        m = re.match(r"(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\([^)]*\)|\S+)\s+"
                     r"([\w-]+)\(", ls)
        if not m:
            continue
        shape_str, opname = m.group(1), m.group(2)
        if opname not in _COLLECTIVE_OPS:
            continue
        b = _shape_bytes(shape_str)
        rep.counts[opname] = rep.counts.get(opname, 0) + 1
        rep.bytes_[opname] = rep.bytes_.get(opname, 0) + b
        rep.largest.append((b, opname, shape_str))
    rep.largest.sort(reverse=True)
    rep.largest = rep.largest[:10]
    return rep


def format_report(rep: CollectiveReport, label: str = "") -> str:
    lines = [f"collective report {label}".rstrip()]
    lines.append(f"  global input bytes: {rep.input_bytes:,}")
    total = sum(rep.bytes_.values())
    if not rep.counts:
        lines.append("  (no collectives emitted)")
    for k in sorted(rep.counts):
        lines.append(f"  {k:22s} x{rep.counts[k]:<4d} {rep.bytes_[k]:,} B")
    lines.append(f"  total collective bytes: {total:,} "
                 f"({total / max(rep.input_bytes, 1):.3f}x of input)")
    for b, kind, shape in rep.largest[:5]:
        lines.append(f"    largest: {kind} {shape} = {b:,} B")
    return "\n".join(lines)
