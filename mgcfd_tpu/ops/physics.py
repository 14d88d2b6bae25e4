"""Pointwise Euler-equation physics, vectorised over nodes/edges.

Same math as the reference's inline helpers (cfd_loops.h:121-153 and
compute_flux_contribution cfd_loops.h:57-83), reformulated as batched
tensor ops: instead of four named double3 "flux contribution" vectors we
build one (..., 3, NVAR) flux tensor F with

    F[d, 0]     = momentum[d]                      (density flux)
    F[d, 1+k]   = velocity[k] * momentum[d] + p * delta(d, k)
    F[d, 4]     = velocity[d] * (density_energy + p)

The momentum block uses the velocity[k]*momentum[d] orientation to match
the reference's FP rounding exactly (fc_momentum_k.d = vel.k * mom.d,
cfd_loops.h:67-77). Edge kernels then contract F with the edge normal on
the VPU: one einsum instead of 15 scalar FMAs.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.constants import GAMMA


def primitive_quantities(q):
    """q: (..., 5) conserved state -> dict of primitives.

    pressure = (gamma-1) * (E - 0.5 * rho * |v|^2)   (cfd_loops.h:140-143)
    speed_of_sound = sqrt(gamma * p / rho)           (cfd_loops.h:145-148)
    """
    rho = q[..., 0]
    mom = q[..., 1:4]
    energy = q[..., 4]
    vel = mom / rho[..., None]
    speed_sqd = jnp.sum(vel * vel, axis=-1)
    pressure = (GAMMA - 1.0) * (energy - 0.5 * rho * speed_sqd)
    sos = jnp.sqrt(GAMMA * pressure / rho)
    return {
        "rho": rho, "mom": mom, "energy": energy, "vel": vel,
        "speed_sqd": speed_sqd, "speed": jnp.sqrt(speed_sqd),
        "pressure": pressure, "sos": sos,
    }


def flux_tensor(q, prim=None):
    """q: (..., 5) -> F: (..., 3, 5) directional flux tensor (layout above)."""
    if prim is None:
        prim = primitive_quantities(q)
    mom = prim["mom"]
    vel = prim["vel"]
    p = prim["pressure"]
    de_p = prim["energy"] + p

    # momentum block: vel[k] * mom[d] (+ p on the diagonal)
    mom_block = vel[..., None, :] * mom[..., :, None]  # (..., d, k)
    eye = jnp.eye(3, dtype=q.dtype)
    mom_block = mom_block + p[..., None, None] * eye

    density_col = mom[..., :, None]                      # (..., 3, 1)
    energy_col = (vel * de_p[..., None])[..., :, None]   # (..., 3, 1)
    return jnp.concatenate([density_col, mom_block, energy_col], axis=-1)
