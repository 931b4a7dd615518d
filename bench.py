"""Headline benchmark: grid-point-steps/sec/chip on the flagship config.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline is the
ratio against the first recorded run of this bench (stored in
bench_baseline.json on first successful run) — i.e. it tracks our own
progress; >1.0 means faster than the round-1 recording.

Flagship: shallow-water sphere ne30 p4 (upgraded to nonhydro ne30 p4 L30
once the nonhydro core lands) in float32, steps fused under lax.scan.
"""

import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp
    import tempestmodel_tpu as tm
    from tempestmodel_tpu.models import sw_model
    from tempestmodel_tpu.testcases.shallow_water import Williamson2

    ne, order = 30, 4
    inner = int(os.environ.get("TM_BENCH_STEPS", "20"))
    dtype = jnp.float32

    cfg = tm.ModelConfig(ne=ne, order=order, dt=120.0, hyperdiffusion=True,
                         dtype=dtype)
    geom = sw_model.build_sw_geometry(cfg)
    state = Williamson2().initial_state(geom, cfg.constants, dtype=dtype)
    multi = sw_model.make_sw_multistep(cfg, geom, inner)

    # warmup / compile
    out = multi(state)
    jax.block_until_ready(out)

    reps = 3
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = multi(state)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)

    npts = 6 * (ne * order) ** 2  # horizontal grid points (nz=1)
    gps = npts * inner / best

    baseline_file = os.path.join(os.path.dirname(__file__),
                                 "bench_baseline.json")
    vs = None
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            base = json.load(f)
        if base.get("value"):
            vs = gps / base["value"]
    else:
        with open(baseline_file, "w") as f:
            json.dump({"value": gps, "metric": "grid-point-steps/sec/chip",
                       "config": f"sw ne{ne} p{order} f32"}, f)
        vs = 1.0

    print(json.dumps({
        "metric": "grid-point-steps/sec/chip (sw ne30 p4 f32)",
        "value": gps,
        "unit": "gridpoint-steps/s",
        "vs_baseline": vs,
    }))


if __name__ == "__main__":
    main()
