"""Device-side phase timing via the JAX profiler.

Wall-clock timing of individual phases through the axon TPU tunnel is
dominated by per-call dispatch latency (~0.5-5 ms), so phase ranking
uses the device trace instead: run the phase once under
``jax.profiler.trace`` and sum the duration of every kernel event on
the device timeline (excluding the jit umbrella event).
"""

from __future__ import annotations

import glob
import gzip
import json
import shutil
import tempfile


def device_time_ms(fn, *args):
    """(device_ms, n_kernels) for one invocation of ``fn(*args)``."""
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    d = tempfile.mkdtemp(prefix="tm_devprof_")
    try:
        with jax.profiler.trace(d):
            out = fn(*args)
            jax.block_until_ready(out)
        files = glob.glob(d + "/plugins/profile/*/*.trace.json.gz")
        if not files:
            return float("nan"), 0
        with gzip.open(files[0]) as fh:
            data = json.load(fh)
        pids = {e["pid"]: e["args"].get("name", "")
                for e in data["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"}
        total, n = 0.0, 0
        for e in data["traceEvents"]:
            if e.get("ph") != "X" or "dur" not in e:
                continue
            pname = pids.get(e["pid"], "")
            if "TPU" not in pname and "GPU" not in pname:
                continue
            if e["name"].startswith("jit_"):
                continue
            total += e["dur"]
            n += 1
        return total / 1000.0, n
    finally:
        shutil.rmtree(d, ignore_errors=True)
