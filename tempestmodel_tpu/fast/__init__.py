"""TPU fast execution engine for the nonhydrostatic core.

The z-first Pallas re-expression of the Strang-HEVI step
(``timestep/strang.py`` + ``models/nonhydro.py`` + ``models/hyperdiff.py``
+ ``parallel/dss.py``).  The state is a DICT of per-field z-first arrays

    {U, V, Rt, Rho: (nz, P, A, B), W: (nz+1, P, A, B)
     [, Tracers: (ntr*nz, P, A, B) species-major]}

with P = 6 cubed-sphere panels or 1 Cartesian panel.  Execution shape:

- **vertical column operators** contract the LEADING level axis — clean
  ``(K, nz) @ (nz, P*A*B)`` GEMMs, no layout churn;
- **one fused Pallas stage kernel** per RK stage (``stage_pallas``):
  all horizontal derivatives, the nonlinear tendency algebra, the
  two-term RK base combination, the penalty add AND the tracer
  advection in one launch per (panel, A-chunk) tile;
- **DSS as Pallas kernels** (``dss_pallas``): masked-roll pair sums +
  static panel-edge links with covariant U/V rotation (or periodic
  wrap-sums on Cartesian grids), one launch per field — the (U, V)
  launch also folds in the W stage assembly and diagnostic bottom
  boundary (``dss_uvw``);
- **one fused Pallas implicit kernel** (``pallas_implicit``): column
  aux -> residual -> analytic banded Jacobian -> statically-unrolled
  no-pivot banded LU, all in VMEM, with fold-f sublane packing so every
  LU row op fills full (f, lane) vregs; tracers solve all species
  against one factorization (``ops/pallas_banded`` multi-RHS);
- **fused nu4 tail kernels** (``hyper_pallas``) where the Jacobian is
  z-constant;
- **device-mesh distribution** (``mesh_dss``): the SAME per-shard
  engine under one shard_map with statically-routed point-to-point
  ppermute edge exchange (zero all-reduces) and an optional
  halo-overlap schedule, bitwise-equal to the inline one.

Engine output is numerically equivalent to the reference-layout engine
(same operations, different association order; validated at 1e-11 fp64
in ``tests/test_fast_engine.py`` / ``test_fast_xz.py`` /
``test_fast_mesh.py``), but it is NOT the bit-parity path —
golden-parity tests keep using ``models/nonhydro.py``.  The supported
configuration envelope is ``engine.fast_engine_supported``; the
fast-vs-reference-layout matrix is documented in docs/PERF.md.
"""

from .engine import (FastGeometry, build_fast_geometry,
                     build_fast_geometry_cartesian, pack_state,
                     unpack_state, make_fast_step)
from . import engine
