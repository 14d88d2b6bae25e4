"""Physical constants and enumerations.

Parity notes (reference = warwick-hpsc/MG-CFD-app-plain):
  - GAMMA/NDIM/RK/ff_mach/deg_angle_of_attack: src/Base/const.h:8-14
  - variable indices & NVAR: src/Base/const.h:19-26
  - smoothing coefficient 0.2 (stored as float then widened):
    src/Base/common.h:24 (``double(0.2f)``) — we reproduce the f32->f64
    widening so fp64 validation runs agree bit-for-bit in this constant.
  - far-field initialisation: src/Kernels/cfd_loops.h:85-119
  - mesh variants: src/Base/const.h:40-43; kernel ids: const.h:31-38
"""
from __future__ import annotations

import enum
import math

import numpy as np

GAMMA = 1.4
NDIM = 3
RK = 3  # number of Runge-Kutta stages per smoothing pass
FF_MACH = 1.2
DEG_ANGLE_OF_ATTACK = 0.0

# The reference stores 0.2 as a float literal widened to double; keep the
# exact same value so fp64 runs validate against reference dumps.
SMOOTHING_COEFFICIENT = float(np.float64(np.float32(0.2)))

VAR_DENSITY = 0
VAR_MOMENTUM = slice(1, 4)
VAR_MOMENTUMX = 1
VAR_MOMENTUMY = 2
VAR_MOMENTUMZ = 3
VAR_DENSITY_ENERGY = 4
NVAR = 5


class MeshVariant(enum.Enum):
    """Mesh families; selects numerics variant (step-factor formula, normal
    flipping, edge-weight damping). Reference: const.h:40-43 and the
    variant-specific branches in euler3d_cpu_double.cpp:333-352, :388-395."""

    FVCORR = "fvcorr"
    M6_WING = "m6wing"
    LA_CASCADE = "la_cascade"
    ROTOR_37 = "rotor37"

    @property
    def uses_legacy_step_factor(self) -> bool:
        return self is MeshVariant.FVCORR

    @property
    def ewt_damping_factor(self) -> float | None:
        """Edge-weight damping applied at load (delays NaN blow-up on these
        meshes; acknowledged workaround, euler3d_cpu_double.cpp:333-352)."""
        return {
            MeshVariant.M6_WING: 5e-8,
            MeshVariant.LA_CASCADE: 1e-7,
            MeshVariant.ROTOR_37: 2e-7,
        }.get(self)

    @property
    def flips_all_normals(self) -> bool:
        """FVCORR flips every edge normal (Rodinia compatibility); other
        variants flip only internal edges. Reference: io.cpp:117-133."""
        return self is MeshVariant.FVCORR


class KernelId(enum.Enum):
    """Instrumented kernel identities; order matches the reference's
    monitoring attribution (const.h:31-38) and its CSV column grouping."""

    COMPUTE_STEP = "compute_step"
    COMPUTE_FLUX_EDGE = "flux"
    UPDATE = "update"
    INDIRECT_RW = "indirect_rw"
    TIME_STEP = "time_step"
    RESTRICT = "restrict"
    PROLONG = "prolong"


def far_field_state(dtype=np.float64):
    """Compute the far-field conserved state and its 3x5 flux tensor.

    Mirrors initialize_far_field_conditions (cfd_loops.h:85-119):
    rho=1.4, p=1, Mach 1.2, angle of attack 0 degrees.

    Returns (ff_q, ff_flux) with ff_q shape (5,) and ff_flux shape (3, 5)
    where ff_flux[d, v] is the flux of conserved variable v in direction d
    (see mgcfd_tpu.ops.physics.flux_tensor for the layout).
    """
    aoa = (math.pi / 180.0) * DEG_ANGLE_OF_ATTACK
    rho = 1.4
    pressure = 1.0
    sos = math.sqrt(GAMMA * pressure / rho)
    speed = FF_MACH * sos
    vel = np.array([speed * math.cos(aoa), speed * math.sin(aoa), 0.0])
    mom = rho * vel
    energy = rho * (0.5 * speed * speed) + pressure / (GAMMA - 1.0)

    q = np.empty(NVAR)
    q[VAR_DENSITY] = rho
    q[VAR_MOMENTUM] = mom
    q[VAR_DENSITY_ENERGY] = energy

    flux = np.empty((NDIM, NVAR))
    flux[:, VAR_DENSITY] = mom
    for d in range(NDIM):
        for k in range(NDIM):
            # Note the vel[k]*mom[d] orientation: matches the reference's
            # compute_flux_contribution (cfd_loops.h:67-77) exactly in FP,
            # where fc_momentum_k.d = velocity.k * momentum.d (+ p on diag).
            flux[d, 1 + k] = vel[k] * mom[d] + (pressure if d == k else 0.0)
    flux[:, VAR_DENSITY_ENERGY] = vel * (energy + pressure)

    return q.astype(dtype), flux.astype(dtype)
