"""Headline benchmark: grid-point-steps/sec/chip on the flagship config.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Flagship: nonhydrostatic UMJS baroclinic wave, cubed sphere ne30 p4 L30
(the BASELINE.json headline config), float32, Strang-HEVI with nu4
hyperdiffusion and the batched banded vertical implicit solve.

The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against the first recorded run of this bench on this metric
(bench_baseline.json); >1.0 = faster than the round-1 recording.
"""

import json
import os
import time

METRIC = "gridpoint-steps/sec/chip (nonhydro sphere ne30 p4 L30 f32)"


def main():
    import jax
    import jax.numpy as jnp
    from tempestmodel_tpu.config import ModelConfig, GridKind
    from tempestmodel_tpu.models import nh_model
    from tempestmodel_tpu.testcases.nonhydro_sphere import BaroclinicWaveUMJS

    ne, nz = 30, 30
    inner = int(os.environ.get("TM_BENCH_STEPS", "10"))

    tc = BaroclinicWaveUMJS(pert="exp")
    solver = "pallas" if jax.default_backend() != "cpu" else "banded"
    cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=ne, order=4,
                      nz=nz, ztop=tc.ztop, dt=200.0, hyperdiffusion=True,
                      nu_scalar=1e15, nu_div=1e15, nu_vort=1e15,
                      vertical_solver=solver, dtype=jnp.float32)
    geom = nh_model.build_nh_sphere_geometry(cfg, ztop=tc.ztop)
    state = tc.initial_state(geom, cfg.constants, dtype=jnp.float32)
    first_step, step = nh_model.make_nh_step(cfg, geom)

    # warmup / compile
    state, carry = first_step(state)
    state, carry = step(state, carry)
    jax.block_until_ready(state)

    # async dispatch pipelines the per-call latency away
    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        s, c = state, carry
        for _ in range(inner):
            s, c = step(s, c)
        jax.block_until_ready(s)
        best = min(best, (time.perf_counter() - t0) / inner)

    npts = 6 * (ne * 4) ** 2 * nz
    gps = npts / best

    baseline_file = os.path.join(os.path.dirname(__file__),
                                 "bench_baseline.json")
    vs = None
    base = None
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            base = json.load(f)
        if base.get("metric") != METRIC:
            base = None
    if base is None:
        with open(baseline_file, "w") as f:
            json.dump({"value": gps, "metric": METRIC}, f)
        vs = 1.0
    else:
        vs = gps / base["value"]

    print(json.dumps({
        "metric": METRIC,
        "value": gps,
        "unit": "gridpoint-steps/s",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
