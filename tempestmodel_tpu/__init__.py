"""tempestmodel_tpu: a TPU-native nonhydrostatic atmospheric dynamical core.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
paullric/tempestmodel: cubed-sphere spectral-element horizontal
discretization, HEVI (horizontally-explicit vertically-implicit) IMEX
timestepping, shallow-water and compressible nonhydrostatic equation sets,
distributed via jax.sharding over TPU meshes.
"""

from .config import (ModelConfig, EquationSet, GridKind, TimestepSchemeType,
                     ExplicitSubScheme, VerticalStaggering)
from .constants import PhysicalConstants, DEFAULT_CONSTANTS

__version__ = "0.1.0"
