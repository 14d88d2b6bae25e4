"""Edge flux kernels (pure JAX / XLA path).

The reference's hot loop class is gather -> per-edge math -> scatter-
accumulate (flux_kernel.elemfunc.c). On TPU we split it the same way the
reference's FLUX_FISSION build does (flux_loops.cpp:120-123 +
update_edges), because conflict-free accumulation is the only sane scatter
strategy on a vector machine: compute per-edge values edge-major (dense,
vectorised), then combine into nodes with one of several accumulation
strategies (see `accumulate_flux`).

Internal-edge antisymmetry: the b-side value is the exact FP negation of
the a-side value (the reference's FLUX_REUSE_FLUX observation,
flux_kernel.elemfunc.c:163-168), so only the a-side is materialised.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.constants import SMOOTHING_COEFFICIENT
from .physics import primitive_quantities, flux_tensor


def internal_edge_flux(q_a, q_b, ew, ewt=None):
    """Per-internal-edge flux into node a (negate for node b).

    q_a, q_b: (E, 5) gathered states; ew: (E, 3) edge normals;
    ewt: optional precomputed |ew| (FLUX_PRECOMPUTE_EDGE_WEIGHTS).

    val = factor * (q_a - q_b) - 0.5 * ew . (F_a + F_b)
    factor = -|ew| * 0.2 * 0.5 * (speed_a + speed_b + sos_a + sos_b)
    (flux_kernel.elemfunc.c:130-162; smoothing coefficient common.h:24)
    """
    if ewt is None:
        ewt = jnp.sqrt(jnp.sum(ew * ew, axis=-1))
    pa = primitive_quantities(q_a)
    pb = primitive_quantities(q_b)
    fa = flux_tensor(q_a, pa)
    fb = flux_tensor(q_b, pb)

    factor = (-ewt * (SMOOTHING_COEFFICIENT * 0.5)
              * (pa["speed"] + pb["speed"] + pa["sos"] + pb["sos"]))
    central = jnp.einsum("ed,edv->ev", ew, fa + fb)
    return factor[:, None] * (q_a - q_b) - 0.5 * central


def boundary_edge_flux(q_b, ew):
    """Far-field boundary edge: momentum flux = pressure * normal; density
    and energy fluxes are zero (flux_boundary_kernel.elemfunc.c:41-45)."""
    p = primitive_quantities(q_b)["pressure"]
    zeros = jnp.zeros_like(p)[:, None]
    return jnp.concatenate([zeros, ew * p[:, None], zeros], axis=-1)


def wall_edge_flux(q_b, ew, ff_flux):
    """Wall edge: 0.5 * normal . (F_farfield + F_b) for all five variables
    (flux_wall_kernel.elemfunc.c:51-69; note the density row of F is the
    momentum vector, matching p_b_val's use of ff momentum + local
    momentum). ff_flux: (3, 5) replicated far-field flux tensor."""
    fb = flux_tensor(q_b)
    return 0.5 * jnp.einsum("ed,edv->ev", ew, fb + ff_flux[None])


def internal_edge_flux_crippled(q_a, q_b, ew):
    """Arithmetically-gutted twin of internal_edge_flux: identical memory
    traffic, deliberately meaningless math — isolates the memory-bound
    ceiling (flux_kernel_crippled.elemfunc.c; driver use
    euler3d_cpu_double.cpp:399-418). Not physics; do not fix the math."""
    ewt = jnp.sqrt(jnp.sum(ew * ew, axis=-1))

    def gutted(q, recip):
        rho, mom, pe = q[..., 0], q[..., 1:4], q[..., 4]
        vel = mom * recip[..., None]
        speed_sqd = vel[..., 0] + vel[..., 1] * vel[..., 2]
        pressure = pe - rho * speed_sqd
        sos = pressure * recip
        de_p = pe + pressure
        fde = vel * de_p[..., None]
        return mom, speed_sqd, pressure, sos, fde

    mom_b, ss_b, pr_b, sos_b, fde_b = gutted(q_b, jnp.ones_like(q_b[..., 0]))
    mom_a, ss_a, pr_a, sos_a, fde_a = gutted(q_a, 1.0 / q_a[..., 0])

    factor = (-ewt * (SMOOTHING_COEFFICIENT * 0.5)
              * (ss_a + ss_b + sos_a + sos_b))
    fsum = ew  # factor_x/y/z collapse; keep the loads live
    msum = mom_a + mom_b
    p_val = factor * (q_a[..., 0] - q_b[..., 0]) + jnp.sum(
        -0.5 * fsum * msum, axis=-1)
    m_val = (factor[..., None] * (mom_a - mom_b)
             + jnp.sum(-0.5 * fsum, axis=-1, keepdims=True) * msum)
    pe_val = factor * (q_a[..., 4] - q_b[..., 4]) + jnp.sum(
        -0.5 * fsum * (fde_a + fde_b), axis=-1)
    return jnp.concatenate(
        [p_val[:, None], m_val, pe_val[:, None]], axis=-1)


def indirect_rw_edge_values(q_a, q_b, ew):
    """Roofline probe: identical gather/scatter pattern to the flux kernel
    with near-zero arithmetic (indirect_rw_kernel.elemfunc.c:42-55).
    Returns (val_a, val_b): contribution pairs (NOT antisymmetric)."""
    val_a = jnp.stack([
        q_b[:, 0] + ew[:, 0],
        q_b[:, 1] + ew[:, 2],
        q_b[:, 2],
        q_b[:, 3],
        q_b[:, 4] + ew[:, 1],
    ], axis=-1)
    val_b = q_a
    return val_a, val_b


# ---------------------------------------------------------------------------
# Accumulation strategies (the scatter side)
# ---------------------------------------------------------------------------

def accumulate_flux(num_nodes, edge_a, edge_b, val_internal,
                    bedge_b=None, val_boundary=None,
                    wedge_b=None, val_wall=None,
                    mode: str = "segment",
                    val_internal_b=None):
    """Combine per-edge values into per-node flux accumulations.

    Strategies (all bit-compatible up to FP reassociation):
      'segment'  one unsorted_segment_sum over the concatenated
                 (destination, value) stream — XLA lowers to sort+reduce
                 or scatter-add; robust default.
      'scatter'  chained .at[].add scatters (closest to the reference's
                 += loop; good on CPU, weak on TPU).
    The ELL gather-transpose strategy lives in prep/incidence.py +
    solver (it needs precomputed incidence tables).

    val_internal_b: optional explicit b-side values (indirect_rw and
    fission dumps); default is -val_internal (antisymmetry).
    """
    if val_internal_b is None:
        val_internal_b = -val_internal

    if mode == "scatter":
        flux = jnp.zeros((num_nodes, val_internal.shape[-1]),
                         dtype=val_internal.dtype)
        flux = flux.at[edge_a].add(val_internal)
        flux = flux.at[edge_b].add(val_internal_b)
        if val_boundary is not None:
            flux = flux.at[bedge_b].add(val_boundary)
        if val_wall is not None:
            flux = flux.at[wedge_b].add(val_wall)
        return flux

    if mode == "segment":
        dests = [edge_a, edge_b]
        vals = [val_internal, val_internal_b]
        if val_boundary is not None:
            dests.append(bedge_b)
            vals.append(val_boundary)
        if val_wall is not None:
            dests.append(wedge_b)
            vals.append(val_wall)
        dest = jnp.concatenate(dests)
        val = jnp.concatenate(vals)
        return jax.ops.segment_sum(val, dest, num_segments=num_nodes)

    raise ValueError(f"unknown accumulation mode: {mode}")
