"""Headline benchmark: grid-point-steps/sec/chip on the flagship config.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

Flagship: nonhydrostatic UMJS baroclinic wave, cubed sphere ne30 p4 L30
(the BASELINE.json headline config), float32, Strang-HEVI with nu4
hyperdiffusion and the fused implicit vertical solve.

Engine: the z-first TPU engine (``tempestmodel_tpu/fast``) — Pallas DSS
kernels, fused Pallas implicit (aux + residual + analytic banded
Jacobian + unrolled banded LU in one launch), dense z-batched SE
operators.  Set TM_BENCH_ENGINE=ref to time the reference-layout engine
instead (the round-1/2 path; ~3.3x slower, kernel-launch-bound — see
docs/PERF.md).

dt = 100 s: the KGU35 stability bound at ne30 p4 is CFL 2.12
(TimestepSchemeStrang.cpp:140-197); the previous dt = 200 s violated it
(CFL ~3.2), so rounds 1-2 timed an exponentially diverging trajectory.
Per-step cost is dt-independent, so throughput numbers remain
comparable; the trajectory is now physical.

Falsifiability: alongside throughput the bench reports XLA cost-analysis
FLOPs, achieved FLOP/s, and HBM-traffic bounds:
- ``hbm_frac_ub`` uses XLA "bytes accessed" (upper bound, can exceed 1);
- ``hbm_frac_lb`` uses the live state footprint x minimal passes;
- ``sol_ms_per_step`` = max(flops/peak_flops, bytes_lb/peak_bw).

vs_baseline is the ratio against the first recorded run of this bench
(bench_baseline.json, round 1 = 66.2M gridpoint-steps/s); >1.0 = faster.

Per-phase breakdown ("phases_ms", disable with TM_BENCH_PHASES=0)
follows the reference FunctionTimer taxonomy (Model.cpp:520-689); each
phase is compiled standalone — use it for ranking, not absolute sums.
"""

import json
import os
import time

METRIC = "gridpoint-steps/sec/chip (nonhydro sphere ne30 p4 L30 f32)"

# Per-chip peaks by device kind: (peak_flops [f32-accumulate matmul,
# bf16 inputs], peak HBM bytes/s).  Sources: public TPU spec sheets.
PEAKS = {
    "TPU v5 lite": (197e12, 819e9),     # v5e
    "TPU v5e": (197e12, 819e9),
    "TPU v5": (459e12, 2765e9),         # v5p
    "TPU v4": (275e12, 1228e9),
    "TPU v6 lite": (918e12, 1640e9),    # v6e / Trillium
    "cpu": (1e12, 100e9),               # nominal, for smoke runs
}


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    if ca is None:
        return 0.0, 0.0
    return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))


def _timeit(f, *args, reps=10, outer=3):
    import jax
    out = f(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    import jax
    import jax.numpy as jnp
    from tempestmodel_tpu.config import ModelConfig, GridKind
    from tempestmodel_tpu.models import nh_model
    from tempestmodel_tpu.testcases.nonhydro_sphere import BaroclinicWaveUMJS

    ne, nz = 30, 30
    inner = int(os.environ.get("TM_BENCH_STEPS", "10"))
    want_phases = os.environ.get("TM_BENCH_PHASES", "1") != "0"
    engine = os.environ.get("TM_BENCH_ENGINE", "fast")

    tc = BaroclinicWaveUMJS(pert="exp")
    on_tpu = jax.default_backend() != "cpu"
    solver = "pallas" if on_tpu else "banded"
    cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=ne, order=4,
                      nz=nz, ztop=tc.ztop, dt=100.0, hyperdiffusion=True,
                      nu_scalar=1e15, nu_div=1e15, nu_vort=1e15,
                      vertical_solver=solver, dtype=jnp.float32)
    geom = nh_model.build_nh_sphere_geometry(cfg, ztop=tc.ztop)
    state = tc.initial_state(geom, cfg.constants, dtype=jnp.float32)
    constants = cfg.constants

    multi = None
    if engine == "fast":
        from tempestmodel_tpu import fast
        from tempestmodel_tpu.fast import engine as fe
        first_step, step1 = fast.make_fast_step(cfg, geom)
        # production cadence: K steps fused under one jit with lax.scan
        # (make_fast_multistep) — at the round-5 kernel count (~265/step)
        # the scan amortizes the per-dispatch launch latency that the
        # eager python loop pays (measured 9.2 -> 6.4 ms/step on v5e
        # through the tunnel); both numbers are reported
        _, multi = fe.make_fast_multistep(cfg, geom, inner)
        s0 = fast.pack_state(state)
        probe = "U"
    else:
        first_step, step1 = nh_model.make_nh_step(cfg, geom)
        s0 = state
        probe = "Rho"

    # Timed region: a python loop of async step dispatches (per-call
    # latency pipelines away).
    state_b, carry = first_step(s0)
    s, c = step1(state_b, carry)
    jax.block_until_ready(s[probe])
    finite = bool(jax.numpy.all(jax.numpy.isfinite(s[probe])))

    per_step_eager = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        s, c = state_b, carry
        for _ in range(inner):
            s, c = step1(s, c)
        jax.block_until_ready(s[probe])
        per_step_eager = min(per_step_eager,
                             (time.perf_counter() - t0) / inner)
    per_step = per_step_eager
    if multi is not None:
        s, c = multi(state_b, carry)
        jax.block_until_ready(s[probe])
        per_step_scan = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            s, c = multi(state_b, carry)
            jax.block_until_ready(s[probe])
            per_step_scan = min(per_step_scan,
                                (time.perf_counter() - t0) / inner)
        per_step = min(per_step, per_step_scan)

    npts = 6 * (ne * 4) ** 2 * nz
    gps = npts / per_step

    # --- roofline accounting -------------------------------------------
    dev_kind = jax.devices()[0].device_kind
    peak_flops, peak_bw = PEAKS.get(
        dev_kind, PEAKS.get(jax.default_backend(), (197e12, 819e9)))

    # NOTE: XLA cost analysis cannot see inside Pallas custom-calls, so
    # ``flops``/``achieved_tflops`` are lower bounds that shrink as more
    # of the step moves into kernels; the speed-of-light accounting is
    # bytes-bound (sol = bytes_lb / peak_bw) and unaffected.
    flops, bytes_ub = _cost(step1.lower(state_b, carry).compile())

    # lower bound on HBM traffic: full prognostic state read+written once
    # per RK stage (KGU35 = 5), hyperdiffusion (2 Laplacian passes),
    # and the implicit solve.
    state_bytes = sum(
        v.size * v.dtype.itemsize
        for v in (state_b.values() if isinstance(state_b, dict)
                  else jax.tree_util.tree_leaves(state_b)))
    n_passes = 2 * (5 + 2 + 1)
    bytes_lb = n_passes * state_bytes

    sol_ms = max(flops / peak_flops, bytes_lb / peak_bw) * 1e3
    result = {
        "metric": METRIC,
        "value": gps,
        "unit": "gridpoint-steps/s",
        "device": dev_kind,
        "engine": engine,
        "finite": finite,
        "ms_per_step": per_step * 1e3,
        "ms_per_step_eager": per_step_eager * 1e3,
        "scan_steps": inner if multi is not None else 1,
        "gflop_per_step": flops / 1e9,
        "gbytes_ub_per_step": bytes_ub / 1e9,
        "gbytes_lb_per_step": bytes_lb / 1e9,
        "achieved_tflops": flops / per_step / 1e12,
        "flops_frac_of_peak": flops / per_step / peak_flops,
        "hbm_frac_ub": bytes_ub / per_step / peak_bw,
        "hbm_frac_lb": bytes_lb / per_step / peak_bw,
        "sol_ms_per_step": sol_ms,
        "sol_frac": sol_ms / (per_step * 1e3),
    }

    # --- per-phase breakdown (reference Model.cpp:520-689 taxonomy) ----
    if want_phases and engine == "fast":
        from tempestmodel_tpu.fast import engine as fe
        from tempestmodel_tpu.fast import implicit as fimp
        from tempestmodel_tpu.models import nonhydro
        fg = fe.build_fast_geometry(geom, dtype=cfg.dtype)
        q = nonhydro.estimate_bandwidth(geom, constants)
        statics = nonhydro.band_assembly_statics(geom, q)
        phases = {
            "HorizontalStep": jax.jit(
                lambda st: fe.horizontal_tendency(st, fg, constants)),
            "VerticalStepImplicit": jax.jit(
                lambda st: fimp.vertical_implicit(
                    st, fg, constants, 0.5 * cfg.dt, q, statics,
                    use_pallas=(solver == "pallas"))),
            "Communicate": jax.jit(lambda st: fe.apply_dss(st, fg)),
            "StepAfterSubCycle": jax.jit(
                lambda st: fe.step_after_subcycle(st, cfg.dt, cfg, fg)),
        }
        from tempestmodel_tpu.utils.devprof import device_time_ms
        ph = {}
        kc = {}
        for name, fn in phases.items():
            ms, n = device_time_ms(fn, s)
            ph[name] = ms
            kc[name] = n
        result["phases_ms"] = ph          # device-side kernel time
        result["phases_kernels"] = kc

    # --- vs_baseline ----------------------------------------------------
    baseline_file = os.path.join(os.path.dirname(__file__),
                                 "bench_baseline.json")
    base = None
    if os.path.exists(baseline_file):
        with open(baseline_file) as f:
            base = json.load(f)
        if base.get("metric") != METRIC:
            base = None
    if base is None:
        with open(baseline_file, "w") as f:
            json.dump({"value": gps, "metric": METRIC}, f)
        result["vs_baseline"] = 1.0
    else:
        result["vs_baseline"] = gps / base["value"]

    print(json.dumps(result), flush=True)

    # --- secondary BASELINE.json configs (one JSON line each) ----------
    # These make fast-path-envelope costs visible: the moist case rides
    # the fast engine WITH tracers; the Cartesian xz case still runs the
    # reference-layout engine.  TM_BENCH_CONFIGS=main skips them.
    if os.environ.get("TM_BENCH_CONFIGS", "all") != "main":
        try:
            _secondary_moist(inner)
        except Exception as e:                       # pragma: no cover
            print(json.dumps({"metric": "moist-secondary-failed",
                              "error": str(e)[:200]}), flush=True)
        try:
            _secondary_xz(inner)
        except Exception as e:                       # pragma: no cover
            print(json.dumps({"metric": "xz-secondary-failed",
                              "error": str(e)[:200]}), flush=True)



def _line_accounting(step_fn, args, per_step, state_obj, n_passes):
    """Roofline + device accounting shared by every bench line
    (the flagship's falsifiability fields, VERDICT round-4 weak #3)."""
    import jax
    dev_kind = jax.devices()[0].device_kind
    peak_flops, peak_bw = PEAKS.get(
        dev_kind, PEAKS.get(jax.default_backend(), (197e12, 819e9)))
    flops, bytes_ub = _cost(step_fn.lower(*args).compile())
    state_bytes = sum(v.size * v.dtype.itemsize
                      for v in jax.tree_util.tree_leaves(state_obj))
    bytes_lb = n_passes * state_bytes
    sol_ms = max(flops / peak_flops, bytes_lb / peak_bw) * 1e3
    out = {
        "gflop_per_step": flops / 1e9,
        "gbytes_ub_per_step": bytes_ub / 1e9,
        "gbytes_lb_per_step": bytes_lb / 1e9,
        "achieved_tflops": flops / per_step / 1e12,
        "flops_frac_of_peak": flops / per_step / peak_flops,
        "hbm_frac_ub": bytes_ub / per_step / peak_bw,
        "hbm_frac_lb": bytes_lb / per_step / peak_bw,
        "sol_ms_per_step": sol_ms,
        "sol_frac": sol_ms / (per_step * 1e3),
    }
    try:
        from tempestmodel_tpu.utils.devprof import device_time_ms
        dev_ms, nk = device_time_ms(step_fn, *args)
        out["device_ms_per_step"] = dev_ms
        out["kernels_per_step"] = nk
    except Exception:
        pass
    return out


def _secondary_moist(inner):
    """DCMIP2016 moist baroclinic wave (3 tracers), fast engine."""
    import jax
    import jax.numpy as jnp
    from tempestmodel_tpu.config import ModelConfig, GridKind
    from tempestmodel_tpu.models import nh_model
    from tempestmodel_tpu.testcases.dcmip2016 import MoistBaroclinicWave
    from tempestmodel_tpu import fast

    ne, nz = 30, 30
    tc = MoistBaroclinicWave()
    on_tpu = jax.default_backend() != "cpu"
    cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=ne, order=4,
                      nz=nz, ztop=tc.ztop, dt=100.0, hyperdiffusion=True,
                      nu_scalar=1e15, nu_div=1e15, nu_vort=1e15,
                      vertical_solver="pallas" if on_tpu else "banded",
                      dtype=jnp.float32)
    geom = nh_model.build_nh_sphere_geometry(cfg, ztop=tc.ztop)
    state = tc.initial_state(geom, cfg.constants, dtype=jnp.float32)
    from tempestmodel_tpu.fast import engine as fe
    first_step, step1 = fast.make_fast_step(cfg, geom)
    _, multi = fe.make_fast_multistep(cfg, geom, inner)
    s0 = fast.pack_state(state)
    s, c = first_step(s0)
    import jax as _j
    ss, cc = multi(s, c)
    _j.block_until_ready(ss["U"])
    per_step = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ss, cc = multi(s, c)
        _j.block_until_ready(ss["U"])
        per_step = min(per_step, (time.perf_counter() - t0) / inner)
    npts = 6 * (ne * 4) ** 2 * nz
    # +3 passes over the tracer block: per-stage advection, the implicit
    # column update, the two positivity filters (rough lower bound)
    acct = _line_accounting(step1, (s, c), per_step, s, n_passes=16)
    print(json.dumps({
        "metric": "gridpoint-steps/sec/chip (DCMIP moist baroclinic "
                  "wave ne30 p4 L30 +3 tracers f32)",
        "value": npts / per_step, "unit": "gridpoint-steps/s",
        "engine": "fast+tracers",
        "ms_per_step": per_step * 1e3,
        "finite": bool(jax.numpy.isfinite(ss["Tracers"]).all()),
        **acct,
    }), flush=True)


def _secondary_xz(inner):
    """Schar mountain waves, Cartesian xz slice, z-first fast engine
    (round 5: periodic-BC Cartesian grids run the same Pallas engine as
    the sphere — one panel, wrap-sum DSS; see fast/engine.py
    build_fast_geometry_cartesian)."""
    import jax
    import jax.numpy as jnp
    from tempestmodel_tpu.config import (ModelConfig, GridKind,
                                         EquationSet)
    from tempestmodel_tpu.models import nh_model
    from tempestmodel_tpu.testcases.nonhydro_xz import ScharMountain
    from tempestmodel_tpu import fast

    tc = ScharMountain()
    nex, nz = 100, 40
    on_tpu = jax.default_backend() != "cpu"
    cfg = ModelConfig(grid_kind=GridKind.CARTESIAN_XZ, nex=nex, ney=1,
                      order=4, nz=nz, ztop=tc.ztop,
                      x_extent=tc.x_extent, y_extent=tc.y_extent,
                      dt=0.5, hyperdiffusion=True,
                      nu_scalar=1e7, nu_div=1e7, nu_vort=1e7,
                      rayleigh_damping=True,
                      vertical_solver="pallas" if on_tpu else "banded",
                      equation_set=EquationSet.PRIMITIVE_NONHYDRO,
                      dtype=jnp.float32)
    geom = nh_model.build_nh_cartesian_geometry(
        cfg, topography=tc.topography, ztop=tc.ztop,
        rayleigh=tc.rayleigh_strength, bc_x="periodic", bc_y="periodic")
    state = tc.initial_state(geom, cfg.constants, dtype=jnp.float32)
    ref = tc.reference_state(geom, cfg.constants, dtype=jnp.float32) \
        if hasattr(tc, "reference_state") else None
    from tempestmodel_tpu.fast.engine import fast_engine_supported
    use_fast = fast_engine_supported(cfg, geom=geom)
    multi = None
    if use_fast:
        from tempestmodel_tpu.fast import engine as fe
        first_step, step1 = fast.make_fast_step(cfg, geom, ref_state=ref)
        _, multi = fe.make_fast_multistep(cfg, geom, inner,
                                          ref_state=ref)
        s0 = fast.pack_state(state)
        probe = "U"
    else:
        first_step, step1 = nh_model.make_nh_step(cfg, geom,
                                                  ref_state=ref)
        s0 = state
        probe = "Rho"
    s, c = first_step(s0)
    per_step = float("inf")
    if multi is not None:
        ss, cc = multi(s, c)
        jax.block_until_ready(ss[probe])
        for _ in range(3):
            t0 = time.perf_counter()
            ss, cc = multi(s, c)
            jax.block_until_ready(ss[probe])
            per_step = min(per_step, (time.perf_counter() - t0) / inner)
    else:
        for _ in range(3):
            t0 = time.perf_counter()
            ss, cc = s, c
            for _ in range(inner):
                ss, cc = step1(ss, cc)
            jax.block_until_ready(ss[probe])
            per_step = min(per_step, (time.perf_counter() - t0) / inner)
    npts = nex * 4 * 4 * nz
    acct = _line_accounting(step1, (s, c), per_step, s, n_passes=16)
    print(json.dumps({
        "metric": "gridpoint-steps/sec/chip (Schar mountain xz "
                  "nex100 p4 L40 f32)",
        "value": npts / per_step, "unit": "gridpoint-steps/s",
        "engine": "fast" if use_fast else "reference-layout",
        "ms_per_step": per_step * 1e3,
        "finite": bool(jax.numpy.isfinite(ss[probe]).all()),
        **acct,
    }), flush=True)


if __name__ == "__main__":
    main()
