"""Per-kernel breakdown of one fast-engine xz step (Schar bench size)."""
import glob
import gzip
import json
import re
import tempfile
import shutil
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

from tempestmodel_tpu.config import ModelConfig, GridKind, EquationSet
from tempestmodel_tpu.models import nh_model
from tempestmodel_tpu.testcases.nonhydro_xz import ScharMountain
from tempestmodel_tpu import fast

tc = ScharMountain()
nex, nz = 100, 40
cfg = ModelConfig(grid_kind=GridKind.CARTESIAN_XZ, nex=nex, ney=1,
                  order=4, nz=nz, ztop=tc.ztop,
                  x_extent=tc.x_extent, y_extent=tc.y_extent,
                  dt=0.5, hyperdiffusion=True,
                  nu_scalar=1e7, nu_div=1e7, nu_vort=1e7,
                  rayleigh_damping=True, vertical_solver="pallas",
                  equation_set=EquationSet.PRIMITIVE_NONHYDRO,
                  dtype=jnp.float32)
geom = nh_model.build_nh_cartesian_geometry(
    cfg, topography=tc.topography, ztop=tc.ztop,
    rayleigh=tc.rayleigh_strength, bc_x="periodic", bc_y="periodic")
state = tc.initial_state(geom, cfg.constants, dtype=jnp.float32)
ref = tc.reference_state(geom, cfg.constants, dtype=jnp.float32)
fs, st = fast.make_fast_step(cfg, geom, ref_state=ref)
X, c = fs(fast.pack_state(state))
jax.block_until_ready((X, c))
out = st(X, c)
jax.block_until_ready(out)

d = tempfile.mkdtemp(prefix="tm_xzprof_")
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
for k, (dur, cnt) in sorted(groups.items(), key=lambda x: -x[1][0])[:20]:
    print(f"{dur/1000.0:8.3f} ms  x{cnt:4d}  {k[:90]}")
