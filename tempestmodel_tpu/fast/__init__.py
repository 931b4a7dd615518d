"""TPU fast execution engine for the nonhydrostatic core.

A kernel-count-optimized re-expression of the Strang-HEVI step
(``timestep/strang.py`` + ``models/nonhydro.py`` + ``models/hyperdiff.py``
+ ``parallel/dss.py``) for single-chip TPU execution:

- the state dict becomes ONE channel-stacked array ``(C, 6, A, B)``
  with ``C = 5*nz + 1`` (U/V/Rt/Rho on levels, W on interfaces), so every
  RK linear combination is a single fused elementwise kernel instead of
  five;
- vertical column operators contract the LEADING channel axis (clean
  ``(K, nz) @ (nz, 6*A*B)`` GEMMs);
- horizontal derivatives use dense block-diagonal ``(A, A)`` operators
  (one GEMM over the whole channel stack per direction);
- DSS is one gather + one scatter-add over precomputed edge tables
  instead of per-field strided updates (measured: the reference-layout
  DSS alone launched ~500 kernels/call; see docs/PERF.md).

Engine output is numerically equivalent to the reference-layout engine
(same operations, different association order: fp32 differences at
roundoff; validated in ``tests/test_fast_engine.py``), but it is NOT the
bit-parity path — golden-parity tests keep using ``models/nonhydro.py``.
"""

from .engine import (FastGeometry, build_fast_geometry, pack_state,
                     unpack_state, make_fast_step)
