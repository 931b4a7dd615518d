"""Matrix-free Newton-Krylov vertical solver (reference USE_JFNK_GMRES,
``JacobianFreeNewtonKrylov.h:31-120``): the batched GMRES path must
reproduce the dense direct Newton step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tempestmodel_tpu.config import ModelConfig, GridKind
from tempestmodel_tpu.models import nh_model, nonhydro
from tempestmodel_tpu.models.jfnk import gmres_batched
from tempestmodel_tpu.testcases.nonhydro_xz import ThermalBubble


@pytest.fixture(scope="module")
def bubble():
    tc = ThermalBubble()
    cfg = ModelConfig(grid_kind=GridKind.CARTESIAN_XZ, nex=8, ney=1,
                      order=4, nz=16, ztop=tc.ztop, x_extent=tc.x_extent,
                      y_extent=tc.y_extent, dt=0.05)
    geom = nh_model.build_nh_cartesian_geometry(cfg)
    s0 = tc.initial_state(geom, cfg.constants)
    return cfg, geom, s0


def test_gmres_batched_exact_small():
    """GMRES with full Krylov space solves random well-posed systems."""
    rng = np.random.default_rng(3)
    n, ncol = 12, 7
    A = jnp.asarray(rng.random((ncol, n, n)) + n * np.eye(n))
    b = jnp.asarray(rng.random((n, ncol)))

    def matvec(v):
        return jnp.einsum("cij,jc->ic", A, v)

    x = gmres_batched(matvec, b, m=n, restarts=1)
    xref = jnp.stack([jnp.linalg.solve(A[c], b[:, c])
                      for c in range(ncol)], axis=1)
    assert float(jnp.abs(x - xref).max()) < 1e-10


@pytest.mark.slow
def test_schur_matches_dense(bubble):
    """Schur elimination of W (reference --vmethod SCHUR,
    ``VerticalDynamicsSchur.cpp:1395-1770``): quasi-Newton with the
    W-W off-diagonals dropped; converges to the direct solution."""
    cfg, geom, s0 = bubble
    dt = 0.5
    dense = nonhydro.vertical_implicit(s0, geom, cfg.constants, dt,
                                       solver="dense", newton_iters=3)
    schur = nonhydro.vertical_implicit(s0, geom, cfg.constants, dt,
                                       solver="schur", newton_iters=3)
    for k in ("Rt", "W", "Rho"):
        scale = float(jnp.abs(dense[k]).max())
        err = float(jnp.abs(dense[k] - schur[k]).max())
        assert err < 1e-6 * max(scale, 1.0), (k, err, scale)


def test_jfnk_matches_dense_newton(bubble):
    cfg, geom, s0 = bubble
    dt = 0.5
    dense = nonhydro.vertical_implicit(s0, geom, cfg.constants, dt,
                                       solver="dense")
    jfnk = nonhydro.vertical_implicit(s0, geom, cfg.constants, dt,
                                      solver="jfnk")
    for k in ("Rt", "W", "Rho"):
        scale = float(jnp.abs(dense[k]).max())
        err = float(jnp.abs(dense[k] - jfnk[k]).max())
        assert err < 1e-8 * max(scale, 1.0), (k, err, scale)
