"""Direct parity tests against the C++ reference (golden state dumps).

The golden files in ``tests/golden/`` are raw final-state dumps from the
reference TempestModel binaries (built serially with a local halo exchange;
recipe in ``docs/VALIDATION.md``).  Each test runs our model with the
identical configuration and asserts allclose agreement — the north-star
correctness criterion of BASELINE.md.

Golden format (per patch): 10 int64 dims
[ncomp, A, B, nz, ia0, ia1, ib0, ib1, nz_int, 0] then node data
(ncomp, A, B, nz) then redge data (ncomp, A, B, nz_int), float64.
"""

import gzip
import os

import numpy as np
import pytest

from tempestmodel_tpu.config import ModelConfig, GridKind
from tempestmodel_tpu.models import nh_model

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def load_golden(name):
    raw = gzip.open(os.path.join(GOLDEN_DIR, name)).read()
    patches = []
    off = 0
    while off < len(raw):
        dims = np.frombuffer(raw[off:off + 80], dtype=np.int64)
        ncomp, A, B, nz = dims[0], dims[1], dims[2], dims[3]
        ia0, ia1, ib0, ib1, nzi = dims[4:9]
        off += 80
        node = np.frombuffer(raw[off:off + ncomp * A * B * nz * 8],
                             dtype=np.float64).reshape(ncomp, A, B, nz)
        off += ncomp * A * B * nz * 8
        redge = np.frombuffer(raw[off:off + ncomp * A * B * nzi * 8],
                              dtype=np.float64).reshape(ncomp, A, B, nzi)
        off += ncomp * A * B * nzi * 8
        patches.append({
            "node": node[:, ia0:ia1, ib0:ib1, :],
            "redge": redge[:, ia0:ia1, ib0:ib1, :],
        })
    return patches


def assert_state_close(state, golden_patch, rtol_scalar=1e-6,
                       rtol_vel=1e-4):
    """Compare our (1, A, B, ...) state against one golden patch.

    Velocity fields are compared relative to the *thermodynamic* scales of
    the flow (they start at 0, so pointwise relative error is meaningless);
    scalars relative to their own max.
    """
    node, redge = golden_patch["node"], golden_patch["redge"]
    comp = {"U": 0, "V": 1, "Rt": 2, "Rho": 4}
    report = {}
    for k, c in comp.items():
        ref = node[c]
        mine = np.asarray(state[k])[0]
        assert ref.shape == mine.shape, (k, ref.shape, mine.shape)
        scale = max(np.abs(ref).max(), 1e-30)
        rel = np.abs(ref - mine).max() / scale
        report[k] = rel
        tol = rtol_vel if k in ("U", "V") else rtol_scalar
        if k == "V" and scale < 1e-20:
            continue
        assert rel < tol, f"{k}: rel err {rel:.3e} > {tol} ({report})"
    ref_w = redge[3]
    mine_w = np.asarray(state["W"])[0]
    scale = max(np.abs(ref_w).max(), 1e-30)
    rel = np.abs(ref_w - mine_w).max() / scale
    assert rel < rtol_vel, f"W: rel err {rel:.3e} ({report})"


def _run_bubble(hyperdiffusion, nu):
    from tempestmodel_tpu.testcases.nonhydro_xz import ThermalBubble
    tc = ThermalBubble()
    cfg = ModelConfig(grid_kind=GridKind.CARTESIAN_XZ, nex=12, ney=1,
                      order=4, nz=24, ztop=tc.ztop, x_extent=tc.x_extent,
                      y_extent=tc.y_extent, dt=0.05,
                      hyperdiffusion=hyperdiffusion,
                      nu_scalar=nu, nu_div=nu, nu_vort=nu)
    geom = nh_model.build_nh_cartesian_geometry(cfg)
    s0 = tc.initial_state(geom, cfg.constants)
    first_step, step = nh_model.make_nh_step(cfg, geom)
    s, carry = first_step(s0)
    for _ in range(19):
        s, carry = step(s, carry)
    return s


def test_parity_thermal_bubble():
    """20 HEVI steps of the thermal bubble match the C++ reference."""
    golden = load_golden("bubble.bin.gz")[0]
    s = _run_bubble(False, 0.0)
    assert_state_close(s, golden)


def test_parity_thermal_bubble_hyperdiffusion():
    """Same with nu4 hyperdiffusion active (nu = 1e7)."""
    golden = load_golden("bubble_hv.bin.gz")[0]
    s = _run_bubble(True, 1.0e7)
    assert_state_close(s, golden)


def test_parity_inertia_gravity():
    """20 steps of the Skamarock-Klemp inertia-gravity wave match."""
    from tempestmodel_tpu.testcases.nonhydro_xz import InertiaGravityWave
    golden = load_golden("igw.bin.gz")[0]
    tc = InertiaGravityWave()
    cfg = ModelConfig(grid_kind=GridKind.CARTESIAN_XZ, nex=10, ney=1,
                      order=4, nz=10, ztop=tc.ztop, x_extent=tc.x_extent,
                      y_extent=tc.y_extent, dt=1.0, hyperdiffusion=False)
    geom = nh_model.build_nh_cartesian_geometry(cfg)
    s0 = tc.initial_state(geom, cfg.constants)
    first_step, step = nh_model.make_nh_step(cfg, geom)
    s, carry = first_step(s0)
    for _ in range(19):
        s, carry = step(s, carry)
    # dt=1.0 amplifies the O(residual^2) difference between our AD-exact
    # Newton step and the reference's approximate analytic Jacobian
    # (verified: errors shrink ~dt^2 — 16x smaller at dt=0.25); the bubble
    # cases at dt=0.05 agree to ~1e-8.
    assert_state_close(s, golden, rtol_scalar=3e-5, rtol_vel=5e-3)
