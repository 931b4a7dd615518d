"""tempestmodel_tpu: a TPU-native nonhydrostatic atmospheric dynamical core.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
paullric/tempestmodel: cubed-sphere spectral-element horizontal
discretization, HEVI (horizontally-explicit vertically-implicit) IMEX
timestepping, shallow-water and compressible nonhydrostatic equation sets,
distributed via jax.sharding over TPU meshes.
"""

import os as _os

import jax as _jax

# On TPU the MXU's DEFAULT precision computes f32 matmuls as ONE bf16
# pass (8-bit mantissa).  For a spectral-element dynamical core the
# horizontal derivative/stiffness GEMMs then carry ~4e-3 relative error
# per application and the trajectory diverges from the true-f32 one
# within ~10 steps (measured: W rel error > 1 at ne8 L16).  Pin every
# dot/einsum in the package (including Pallas in-kernel dots, which
# read this config at trace time) to true-f32 multiply-accumulate.
# Override with TM_MATMUL_PRECISION=default|high|highest|float32.
_prec = _os.environ.get("TM_MATMUL_PRECISION", "float32")
if _prec and _prec != "default":
    _jax.config.update("jax_default_matmul_precision", _prec)

from .config import (ModelConfig, EquationSet, GridKind, TimestepSchemeType,
                     ExplicitSubScheme, VerticalStaggering)
from .constants import PhysicalConstants, DEFAULT_CONSTANTS

__version__ = "0.1.0"
