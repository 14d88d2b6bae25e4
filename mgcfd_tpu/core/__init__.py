from .constants import (
    GAMMA,
    NVAR,
    NDIM,
    RK,
    FF_MACH,
    DEG_ANGLE_OF_ATTACK,
    SMOOTHING_COEFFICIENT,
    VAR_DENSITY,
    VAR_MOMENTUM,
    VAR_DENSITY_ENERGY,
    MeshVariant,
    KernelId,
    far_field_state,
)
from .types import MeshLevel, MultigridMesh, SolverState
from .config import SolverConfig

__all__ = [
    "GAMMA", "NVAR", "NDIM", "RK", "FF_MACH", "DEG_ANGLE_OF_ATTACK",
    "SMOOTHING_COEFFICIENT", "VAR_DENSITY", "VAR_MOMENTUM",
    "VAR_DENSITY_ENERGY", "MeshVariant", "KernelId", "far_field_state",
    "MeshLevel", "MultigridMesh", "SolverState", "SolverConfig",
]
