"""Per-phase profiling of the flagship step on the current backend.

Mirrors the reference's FunctionTimer taxonomy (Model.cpp:520-689):
HorizontalStep / VerticalStepExplicit / VerticalStepImplicit /
StepAfterSubCycle (hyperdiffusion) / Communicate (DSS).
"""
import time
import json
import sys

import jax
import jax.numpy as jnp

from tempestmodel_tpu.config import ModelConfig, GridKind
from tempestmodel_tpu.models import nh_model, nonhydro, hyperdiff
from tempestmodel_tpu.testcases.nonhydro_sphere import BaroclinicWaveUMJS

ne = int(sys.argv[1]) if len(sys.argv) > 1 else 30
nz = int(sys.argv[2]) if len(sys.argv) > 2 else 30
solver = sys.argv[3] if len(sys.argv) > 3 else (
    "pallas" if jax.default_backend() != "cpu" else "banded")

tc = BaroclinicWaveUMJS(pert="exp")
cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=ne, order=4,
                  nz=nz, ztop=tc.ztop, dt=200.0, hyperdiffusion=True,
                  nu_scalar=1e15, nu_div=1e15, nu_vort=1e15,
                  vertical_solver=solver, dtype=jnp.float32)
geom = nh_model.build_nh_sphere_geometry(cfg, ztop=tc.ztop)
state = tc.initial_state(geom, cfg.constants, dtype=jnp.float32)
constants = cfg.constants
dss_state = nh_model.make_sphere_dss(geom)

q = nonhydro.estimate_bandwidth(geom, constants)

phases = {}
phases["HorizontalTendency"] = jax.jit(
    lambda s: nonhydro.horizontal_tendency(s, geom, constants))
phases["VerticalStepExplicit"] = jax.jit(
    lambda s: nonhydro.vertical_explicit_increment(s, geom, cfg.dt))
phases["VerticalStepImplicit"] = jax.jit(
    lambda s: nonhydro.vertical_implicit(
        s, geom, constants, 0.5 * cfg.dt,
        newton_iters=cfg.newton_iterations, solver=solver, q=q))
phases["Communicate(DSS)"] = jax.jit(lambda s: dss_state(s))
phases["StepAfterSubCycle"] = jax.jit(
    lambda s: hyperdiff.step_after_subcycle_nh(
        s, cfg.dt, cfg, geom, dss_state, None))

first_step, step = nh_model.make_nh_step(cfg, geom)
s1, carry = first_step(state)
s1, carry = step(s1, carry)
jax.block_until_ready(s1)


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
    return best, out


results = {}
for name, fn in phases.items():
    t, _ = timeit(fn, s1)
    comp = fn.lower(s1).compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    results[name] = {
        "ms": t * 1e3,
        "gflop": ca.get("flops", 0) / 1e9,
        "gbytes": ca.get("bytes accessed", 0) / 1e9,
    }

t_step, _ = timeit(lambda s: step(s, carry)[0], s1, reps=10)
comp = step.lower(s1, carry).compile()
ca = comp.cost_analysis()
if isinstance(ca, list):
    ca = ca[0]
results["FullStep"] = {
    "ms": t_step * 1e3,
    "gflop": ca.get("flops", 0) / 1e9,
    "gbytes": ca.get("bytes accessed", 0) / 1e9,
}

for name, r in results.items():
    print(f"{name:28s} {r['ms']:9.3f} ms  {r['gflop']:8.2f} GF "
          f"{r['gbytes']:8.3f} GB  "
          f"{r['gflop']/r['ms']:7.1f} TF/s  {r['gbytes']/r['ms']:7.2f} TB/s"
          if r['ms'] > 0 else name)
print(json.dumps({k: v["ms"] for k, v in results.items()}))
