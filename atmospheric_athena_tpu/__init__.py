"""atmospheric_athena_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with
the capabilities of tripathi/Atmospheric-Athena: finite-volume (M)HD on
structured grids with plane-parallel ionizing radiative transfer, built
TPU-first (SPMD over device meshes, functional transforms, whole-grid fused
kernels) rather than translated from the reference's C/MPI design.
"""

from .config import GridConfig, SimConfig
from .par import ParameterDB
from .simulation import Simulation
from .state import State

__version__ = "0.1.0"
__all__ = ["GridConfig", "SimConfig", "ParameterDB", "Simulation", "State"]
