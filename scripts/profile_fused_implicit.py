"""Microbench of the fused Pallas implicit kernel: fold=1 (row-vector
LU, 1/8 sublane utilization) vs fold=8 (sublane-packed) across lane
tiles, standalone on the current backend.  Reports wall ms and device ms
(the round-4 diagnosed sublane fix, docs/PERF.md)."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from tempestmodel_tpu.config import ModelConfig, GridKind
from tempestmodel_tpu.models import nh_model, nonhydro
from tempestmodel_tpu.testcases.nonhydro_sphere import BaroclinicWaveUMJS
from tempestmodel_tpu import fast
from tempestmodel_tpu.fast import engine, implicit as fimp
from tempestmodel_tpu.fast import pallas_implicit as pim
from tempestmodel_tpu.utils.devprof import device_time_ms

ne = int(sys.argv[1]) if len(sys.argv) > 1 else 30
nz = int(sys.argv[2]) if len(sys.argv) > 2 else 30

tc = BaroclinicWaveUMJS(pert="exp")
cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=ne, order=4,
                  nz=nz, ztop=tc.ztop, dt=100.0, hyperdiffusion=False,
                  dtype=jnp.float32)
geom = nh_model.build_nh_sphere_geometry(cfg, ztop=tc.ztop)
state = tc.initial_state(geom, cfg.constants, dtype=jnp.float32)
fg = engine.build_fast_geometry(geom, dtype=jnp.float32)
X = fast.pack_state(state)
q = nonhydro.estimate_bandwidth(geom, cfg.constants)
statics = nonhydro.band_assembly_statics(geom, q)
saux = fimp.static_aux(fg)
x_parts, aux = jax.jit(lambda d: fimp._prep_aux(d, fg, saux))(X)
x_parts = tuple(jax.block_until_ready(x) for x in x_parts)
ncol = x_parts[0].shape[1]
print(f"backend={jax.default_backend()} ncol={ncol} q={q}")

mats = {
    "interp_n2i": fg.interp_n2i, "interp_i2n": fg.interp_i2n,
    "diff_n2i": fg.diff_n2i, "diff_i2n": fg.diff_i2n,
    "diffdiff_i2i": fg.diffdiff_i2i,
    "penalty_left": fg.penalty_left, "penalty_right": fg.penalty_right,
    "wscat_left": fg.wscat_left, "wscat_right": fg.wscat_right,
}


def timeit(f, *args, reps=20):
    out = f(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best * 1e3


ref = None
for fold, tile in [(1, 640), (8, 128), (8, 256), (4, 128), (4, 256),
                   (4, 512), (2, 256), (2, 512)]:
    ps = pim.pack_statics(statics, dtype=np.float32, fold=fold)

    @jax.jit
    def run(xp):
        return pim.fused_implicit_update(
            xp, xp, aux, mats, ps, 0.5 * cfg.dt, cfg.constants,
            col_tile=tile if fold == 1 else 512,
            lane_tile=tile if fold > 1 else 256)

    try:
        out = jax.block_until_ready(run(x_parts))
    except Exception as e:
        print(f"fold={fold} tile={tile}: FAILED {type(e).__name__}: {e}")
        continue
    if ref is None:
        ref = out
        err = 0.0
    else:
        err = max(float(jnp.max(jnp.abs(a - b))
                        / (jnp.max(jnp.abs(b)) + 1e-30))
                  for a, b in zip(out, ref))
    wall = timeit(run, x_parts)
    dev, nk = device_time_ms(run, x_parts)
    print(f"fold={fold} tile={tile:5d}: wall {wall:7.3f} ms  "
          f"device {dev:7.3f} ms  kernels {nk:3d}  maxrel {err:.2e}")
