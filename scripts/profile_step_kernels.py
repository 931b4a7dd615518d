"""Per-kernel breakdown of one fast-engine step from the device trace:
groups kernels by name prefix and prints the top contributors, total
device time and kernel count.  The attribution tool behind the round-5
kernel burn-down."""
import glob
import gzip
import json
import re
import sys
import tempfile
import shutil
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

from tempestmodel_tpu.config import ModelConfig, GridKind
from tempestmodel_tpu.models import nh_model
from tempestmodel_tpu.testcases.nonhydro_sphere import BaroclinicWaveUMJS
from tempestmodel_tpu import fast

ne = int(sys.argv[1]) if len(sys.argv) > 1 else 30
nz = int(sys.argv[2]) if len(sys.argv) > 2 else 30
ntr = int(sys.argv[3]) if len(sys.argv) > 3 else 0

tc = BaroclinicWaveUMJS(pert="exp")
cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=ne, order=4,
                  nz=nz, ztop=tc.ztop, dt=100.0, hyperdiffusion=True,
                  nu_scalar=1e15, nu_div=1e15, nu_vort=1e15,
                  vertical_solver="pallas", dtype=jnp.float32)
geom = nh_model.build_nh_sphere_geometry(cfg, ztop=tc.ztop)
state = tc.initial_state(geom, cfg.constants, dtype=jnp.float32)
if ntr:
    rng = np.random.default_rng(0)
    A = cfg.ne * cfg.order
    state = dict(state, Tracers=jnp.asarray(np.abs(
        rng.standard_normal((ntr, 6, A, A, nz))) * 1e-3, jnp.float32))
fs, st = fast.make_fast_step(cfg, geom, ntracers=ntr)
X, c = fs(fast.pack_state(state))
jax.block_until_ready((X, c))
out = st(X, c)
jax.block_until_ready(out)

d = tempfile.mkdtemp(prefix="tm_stepprof_")
try:
    with jax.profiler.trace(d):
        out = st(X, c)
        jax.block_until_ready(out)
    f = glob.glob(d + "/plugins/profile/*/*.trace.json.gz")[0]
    with gzip.open(f) as fh:
        data = json.load(fh)
    pids = {e["pid"]: e["args"].get("name", "")
            for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    groups = defaultdict(lambda: [0.0, 0])
    total, n = 0.0, 0
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in pids.get(e["pid"], ""):
            continue
        name = e["name"]
        if name.startswith("jit_"):
            continue
        key = name if "step_fn" in name else re.sub(r"[.\d]+$", "", name)
        groups[key][0] += e["dur"]
        groups[key][1] += 1
        total += e["dur"]
        n += 1
finally:
    shutil.rmtree(d, ignore_errors=True)

print(f"total device {total/1000.0:.3f} ms, {n} kernels")
for k, (dur, cnt) in sorted(groups.items(), key=lambda x: -x[1][0])[:28]:
    print(f"{dur/1000.0:8.3f} ms  x{cnt:4d}  {k[:90]}")
