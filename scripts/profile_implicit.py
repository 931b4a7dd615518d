"""Sub-phase profile of the HEVI vertical implicit solve on the current
backend: residual eval / band assembly (analytic vs multi-JVP) / banded
solve (pallas vs scan).  Finds where the implicit milliseconds go.
"""
import time
import sys

import jax
import jax.numpy as jnp

from tempestmodel_tpu.config import ModelConfig, GridKind
from tempestmodel_tpu.models import nh_model, nonhydro
from tempestmodel_tpu.models import vertical_banded as vb
from tempestmodel_tpu.testcases.nonhydro_sphere import BaroclinicWaveUMJS

ne = int(sys.argv[1]) if len(sys.argv) > 1 else 30
nz = int(sys.argv[2]) if len(sys.argv) > 2 else 30

tc = BaroclinicWaveUMJS(pert="exp")
cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=ne, order=4,
                  nz=nz, ztop=tc.ztop, dt=200.0, hyperdiffusion=False,
                  dtype=jnp.float32)
geom = nh_model.build_nh_sphere_geometry(cfg, ztop=tc.ztop)
state = tc.initial_state(geom, cfg.constants, dtype=jnp.float32)
constants = cfg.constants
dt = 0.5 * cfg.dt
nzv = geom.nz

q = nonhydro.estimate_bandwidth(geom, constants)
statics = nonhydro.band_assembly_statics(geom, q)
print("q =", q, "backend =", jax.default_backend())

x0, aux, gmats, _ = nonhydro._implicit_aux(state, geom)
perm = jnp.asarray(vb.interleave_perm(nzv))
inv_perm = jnp.argsort(perm)


def timeit(f, *args, reps=10):
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


@jax.jit
def aux_fn(s):
    return nonhydro._implicit_aux(s, geom)[:2]


@jax.jit
def resid_fn(x):
    return jax.vmap(lambda xx, a: nonhydro._column_residual(
        xx, a, gmats, constants, dt, nzv))(x, aux)


@jax.jit
def bands_analytic(x):
    return nonhydro.assemble_bands_analytic(
        x, aux, gmats, statics, constants, dt, nzv)


@jax.jit
def bands_mjvp(x):
    def batched_resid(xs):
        return jax.vmap(lambda xx, a: nonhydro._column_residual(
            xx, a, gmats, constants, dt, nzv))(xs, aux)

    def multi_jvp(t):
        return nonhydro.column_residual_multi_jvp(
            x, aux, gmats, constants, dt, nzv, t)
    return vb.extract_bands_t(batched_resid, x, q, perm, inv_perm,
                              multi_jvp=multi_jvp)


bands = bands_analytic(x0)
f = resid_fn(x0)[:, perm].T


@jax.jit
def solve_scan(b, ff):
    return vb.banded_solve_t(b, ff, q)


def solve_pallas(b, ff):
    from tempestmodel_tpu.ops.pallas_banded import banded_solve_pallas
    return banded_solve_pallas(b, ff, q)


solve_pallas_j = jax.jit(solve_pallas)


@jax.jit
def full_implicit(s):
    return nonhydro.vertical_implicit(
        s, geom, constants, dt, solver="pallas" if
        jax.default_backend() != "cpu" else "banded", q=q,
        band_statics=statics)


print(f"aux build        : {timeit(aux_fn, state):8.3f} ms")
print(f"residual         : {timeit(resid_fn, x0):8.3f} ms")
print(f"bands analytic   : {timeit(bands_analytic, x0):8.3f} ms")
print(f"bands multi-jvp  : {timeit(bands_mjvp, x0):8.3f} ms")
print(f"solve scan       : {timeit(solve_scan, bands, f):8.3f} ms")
if jax.default_backend() != "cpu":
    print(f"solve pallas     : {timeit(solve_pallas_j, bands, f):8.3f} ms")
print(f"full implicit    : {timeit(full_implicit, state):8.3f} ms")
