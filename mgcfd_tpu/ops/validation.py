"""Residual/RMS and state-validity kernels."""
from __future__ import annotations

import jax.numpy as jnp

from ..core.constants import VAR_DENSITY, VAR_DENSITY_ENERGY


def residual(old_variables, variables):
    """residuals = variables - old_variables (validation.cpp:77-89)."""
    return variables - old_variables


def calc_rms(residuals, num_nodes: int | None = None):
    """sqrt(sum(r^2) / nel) — note the reference divides by the NODE count,
    not nel*NVAR (validation.cpp:91-105). Layout-agnostic: accepts (N,5)
    or (5,N). Pass `num_nodes` when the array is lane-padded (the tail
    residuals are exactly zero, but the divisor must be the real count)."""
    from ..core.constants import NVAR

    nel = num_nodes if num_nodes is not None else residuals.size // NVAR
    return jnp.sqrt(jnp.sum(residuals * residuals) / nel)


def invalid_variables_count(variables):
    """Number of invalid entries: NaN/Inf anywhere, or negative density /
    density-energy (check_for_invalid_variables, validation.cpp:107-138).

    The reference aborts the process at the first hit; under jit we return
    a scalar count that the host checks between cycles and raises on —
    same fail-fast contract at cycle granularity.
    """
    bad = ~jnp.isfinite(variables)
    neg_rho = variables[:, VAR_DENSITY] < 0.0
    neg_e = variables[:, VAR_DENSITY_ENERGY] < 0.0
    return (jnp.sum(bad) + jnp.sum(neg_rho) + jnp.sum(neg_e)).astype(
        jnp.int32)
