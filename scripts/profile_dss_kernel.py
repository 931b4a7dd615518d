"""DSS kernel internals bisect: where do the microseconds go?

Variants of the scalar DSS kernel on the flagship block (30, 6, 120, 120)
f32: copy-only (the HBM floor), pair-sum only (roll-based vs MXU-matmul
forms), edges only, and the full kernel.  Follows the round-4 finding
that edge handling is NOT the cost — the suspects are the 8 masked
rolls per field call."""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tempestmodel_tpu.config import ModelConfig, GridKind
from tempestmodel_tpu.models import nh_model
from tempestmodel_tpu.testcases.nonhydro_sphere import BaroclinicWaveUMJS
from tempestmodel_tpu.fast import engine, dss_pallas
from tempestmodel_tpu.utils.devprof import device_time_ms

ne = int(sys.argv[1]) if len(sys.argv) > 1 else 30
nz = int(sys.argv[2]) if len(sys.argv) > 2 else 30

tc = BaroclinicWaveUMJS(pert="exp")
cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=ne, order=4,
                  nz=nz, ztop=tc.ztop, dt=100.0, dtype=jnp.float32)
geom = nh_model.build_nh_sphere_geometry(cfg, ztop=tc.ztop)
fg = engine.build_fast_geometry(geom, dtype=jnp.float32)
A = fg.A
p = fg.p
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((nz, 6, A, A)), jnp.float32)
imult = fg.inv_mult


def pair_mats(A, p, dtype=np.float32):
    """(A, A) matrix M with (M @ x) == roll-based interior pair sum."""
    M = np.eye(A, dtype=dtype)
    for i in range(A - 1):
        if i % p == p - 1:
            M[i, i + 1] = 1.0
            M[i + 1, i] = 1.0
    return M


Ma = jnp.asarray(pair_mats(A, p))


def kern_copy(pk, x_ref, m_ref, o_ref):
    o_ref[...] = x_ref[...] * m_ref[...][None]


def kern_pair_roll(pk, x_ref, m_ref, o_ref):
    o_ref[...] = dss_pallas._pair_sum(x_ref[...], pk) * m_ref[...][None]


def kern_pair_matb(pk, x_ref, m_ref, Ma_ref, o_ref):
    """a-axis via rolls (sublane), b-axis via MXU matmul."""
    xx = x_ref[...]
    cb, P, Av, B = xx.shape
    dt = xx.dtype
    m_hi_a, m_lo_a = dss_pallas._pair_masks(Av, pk, dt)
    xx = (xx + pltpu.roll(xx, Av - 1, 2) * m_hi_a
          + pltpu.roll(xx, 1, 2) * m_lo_a)
    flat = xx.reshape(cb * P * Av, B)
    out = jax.lax.dot_general(flat, Ma_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=dt)
    o_ref[...] = out.reshape(cb, P, Av, B) * m_ref[...][None]


def kern_pair_matab(pk, x_ref, m_ref, Ma_ref, o_ref):
    """both axes via MXU matmuls (a-axis: transpose trick via two dots)."""
    xx = x_ref[...]
    cb, P, Av, B = xx.shape
    dt = xx.dtype
    M = Ma_ref[...]
    flat = xx.reshape(cb * P * Av, B)
    out = jax.lax.dot_general(flat, M, (((1,), (0,)), ((), ())),
                              preferred_element_type=dt)
    xx = out.reshape(cb, P, Av, B)
    m_hi_a, m_lo_a = dss_pallas._pair_masks(Av, pk, dt)
    xx = (xx + pltpu.roll(xx, Av - 1, 2) * m_hi_a
          + pltpu.roll(xx, 1, 2) * m_lo_a)
    o_ref[...] = xx * m_ref[...][None]


def run_kernel(kern, extra=(), cb=4):
    grid = (pl.cdiv(nz, cb),)
    dspec = pl.BlockSpec((cb, 6, A, A), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    whole = [pl.BlockSpec(e.shape, (lambda n: lambda i: (0,) * n)(e.ndim),
                          memory_space=pltpu.VMEM) for e in extra]
    f = jax.jit(lambda xx: pl.pallas_call(
        functools.partial(kern, p), grid=grid,
        in_specs=[dspec, whole and whole[0] or dspec] if False else
        [dspec, pl.BlockSpec(imult.shape,
                             lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)] + whole,
        out_specs=dspec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(xx, imult, *extra))
    return f


def timeit(f, *args, reps=50):
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


full = jax.jit(lambda xx: dss_pallas.dss_scalar(xx, imult, fg.dss_links,
                                                fg.p))
fcopy = run_kernel(kern_copy)
froll = run_kernel(kern_pair_roll)
fmatb = run_kernel(kern_pair_matb, extra=(Ma,))
fmatab = run_kernel(kern_pair_matab, extra=(Ma,))

# correctness: matmul pair-sum == roll pair-sum
r_roll = np.asarray(froll(x))
for name, fm in (("matb", fmatb), ("matab", fmatab)):
    r = np.asarray(fm(x))
    print(f"pair {name} vs roll maxabs: {np.max(np.abs(r - r_roll)):.2e}")

for name, f in (("copy-only   ", fcopy), ("pair-roll   ", froll),
                ("pair-matb   ", fmatb), ("pair-matab  ", fmatab),
                ("full-scalar ", full)):
    wall = timeit(f, x)
    dev, nk = device_time_ms(f, x)
    print(f"{name}: wall {wall:7.4f} ms  device {dev:7.4f} ms  k={nk}")

# full state DSS in context: 4 launches
d = {k: jnp.asarray(rng.standard_normal(
    (nz + (1 if k == "W" else 0), 6, A, A)), jnp.float32)
    for k in engine.FIELDS}
fstate = jax.jit(lambda dd: engine.apply_dss(dd, fg))
wall = timeit(fstate, d, reps=20)
dev, nk = device_time_ms(fstate, d)
print(f"state-dss   : wall {wall:7.4f} ms  device {dev:7.4f} ms  k={nk}")
