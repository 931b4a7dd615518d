"""Tracer transport in the z-first fast engine == reference-layout engine.

Round-4 VERDICT item 4: the fast engine covers tracers (horizontal
weak-form advection per stage, implicit column update with one
factorization per column reused across species, both positivity
filters, nu4 tracer hyperdiffusion), so the DCMIP2016 moist cases run
on the fast path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tempestmodel_tpu.config import ModelConfig, GridKind, EquationSet
from tempestmodel_tpu.models import nh_model
from tempestmodel_tpu import fast
from tempestmodel_tpu.testcases.dcmip2016 import MoistBaroclinicWave


def _setup(nz=8, ne=4):
    tc = MoistBaroclinicWave()
    cfg = ModelConfig(grid_kind=GridKind.CUBED_SPHERE, ne=ne, order=4,
                      nz=nz, ztop=tc.ztop, dt=100.0, hyperdiffusion=True,
                      nu_scalar=1e15, nu_div=1e15, nu_vort=1e15,
                      vertical_solver="banded", dtype=jnp.float64)
    geom = nh_model.build_nh_sphere_geometry(cfg, ztop=tc.ztop)
    state = tc.initial_state(geom, cfg.constants, dtype=jnp.float64)
    assert "Tracers" in state
    return cfg, geom, state


def _compare(a, b, tol, keys):
    worst = {}
    for k in keys:
        x = np.asarray(a[k])
        y = np.asarray(b[k])
        scale = np.max(np.abs(y)) + 1e-300
        worst[k] = np.max(np.abs(x - y)) / scale
        assert worst[k] < tol, (k, worst[k])
    return worst


def test_pack_unpack_tracers_roundtrip():
    cfg, geom, state = _setup()
    X = fast.pack_state(state)
    assert X["Tracers"].shape[0] == state["Tracers"].shape[0] * cfg.nz
    back = fast.unpack_state(X)
    np.testing.assert_array_equal(np.asarray(back["Tracers"]),
                                  np.asarray(state["Tracers"]))


def test_fast_engine_supported_with_tracers():
    cfg, _, _ = _setup()
    assert fast.engine.fast_engine_supported(cfg, has_tracers=True)
    # tracers are supported on a mesh too (fast/mesh_dss dynamic layout)
    class FakeMesh:
        shape = {"x": 2, "y": 4}
    assert fast.engine.fast_engine_supported(
        cfg, has_tracers=True, mesh=FakeMesh())


@pytest.mark.slow
def test_fast_tracers_match_reference_layout():
    cfg, geom, state = _setup()
    nsteps = 3
    fs, st = nh_model.make_nh_step(cfg, geom)
    s, c = fs(state)
    for _ in range(nsteps - 1):
        s, c = st(s, c)

    ffs, fst = fast.make_fast_step(cfg, geom)
    X, cf = ffs(fast.pack_state(state))
    for _ in range(nsteps - 1):
        X, cf = fst(X, cf)
    out = fast.unpack_state(X)
    _compare(out, s, 1e-11, ("U", "V", "Rt", "Rho", "W", "Tracers"))


@pytest.mark.slow
def test_fast_tracers_model_driver():
    """The Model driver auto-selects the fast engine for the moist case
    and matches the reference-layout driver."""
    from tempestmodel_tpu.model import Model
    tc = MoistBaroclinicWave()
    base = dict(equation_set=EquationSet.PRIMITIVE_NONHYDRO,
                grid_kind=GridKind.CUBED_SPHERE, ne=4, order=4, nz=8,
                ztop=tc.ztop, dt=100.0, hyperdiffusion=True,
                nu_scalar=1e15, nu_div=1e15, nu_vort=1e15,
                vertical_solver="banded", dtype=jnp.float64)
    m_fast = Model(ModelConfig(**base), testcase=tc)
    assert m_fast._fast, "fast engine should be selected for tracers now"
    m_fast.go(nsteps=2)
    m_ref = Model(ModelConfig(**base, fuse_pallas=False), testcase=tc)
    m_ref.go(nsteps=2)
    _compare(m_fast.state, m_ref.state, 1e-11,
             ("U", "V", "Rt", "Rho", "W", "Tracers"))
