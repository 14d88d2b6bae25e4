"""Step-factor computation and RK time stepping (node-wise kernels)."""
from __future__ import annotations

import jax.numpy as jnp

from ..core.constants import RK
from .physics import primitive_quantities


def compute_step_factor_legacy(q, volumes):
    """Rodinia-compatible step factor: 0.5 / (sqrt(V) * (|v| + c)) per
    node, no global reduction (cfd_loops.cpp:13-73 — the 2D sqrt formula
    is a preserved upstream bug; FVCORR validation depends on it)."""
    p = primitive_quantities(q)
    return 0.5 / (jnp.sqrt(volumes) * (p["speed"] + p["sos"]))


def compute_step_factor(q, volumes):
    """Corrected step factor (cfd_loops.cpp:76-157): per-node candidate
    dt = 0.5 * cbrt(V)/(|v|+c), then a GLOBAL min is broadcast to every
    node and pre-divided by the local volume (a time_step division brought
    forward). The serial min loop becomes one jnp.min — and a pmin under
    sharding (parallel/)."""
    p = primitive_quantities(q)
    dt = 0.5 * jnp.cbrt(volumes) / (p["speed"] + p["sos"])
    min_dt = jnp.min(dt)
    return jnp.broadcast_to(min_dt, volumes.shape) / volumes


def time_step(j, step_factors, fluxes, old_variables):
    """RK stage update: vars = old + (sf / (RK+1-j)) * flux for the five
    conserved components (cfd_loops.cpp:215-280). The reference zeroes
    fluxes in the same loop; here the caller simply rebuilds fluxes next
    stage (functional style — no in-place zeroing needed)."""
    factor = step_factors / float(RK + 1 - j)
    return old_variables + factor[:, None] * fluxes
