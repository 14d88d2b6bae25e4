"""Geometric-multigrid transfer operators.

Restriction transfers the *solution variables* fine->coarse (the
reference's residual-restriction path is compiled out as NaN-prone:
euler3d_cpu_double.cpp:522-553). Prolongation interpolates coarse
*residuals* onto fine nodes and applies a correction. Only the reference's
live operator — prolong_residuals_interpolate_proper (mg_loops.cpp:678-864,
call site euler3d_cpu_double.cpp:671-681) — is implemented; its four dead
predecessors (prolong/prolong_residuals/prolong_interpolate/..._crude) are
disabled in the reference and intentionally not reproduced.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def mg_restrict(vars_fine, vars_coarse, mapping, num_coarse_nodes):
    """Segment-mean of fine variables into their coarse parents.

    Reference (mg_loops.cpp:30-202): zero the *mapped* coarse nodes,
    scatter-accumulate fine values, count contributions, divide by count.
    Unmapped coarse nodes keep their previous values (average=1 branch,
    mg_loops.cpp:176). mapping[i] is defined for fine node i only for
    i < len(mapping) (mg_loops.cpp:119-142).
    """
    mgc = mapping.shape[0]
    contrib = vars_fine[:mgc]
    sums = jax.ops.segment_sum(contrib, mapping,
                               num_segments=num_coarse_nodes)
    counts = jax.ops.segment_sum(
        jnp.ones((mgc,), dtype=vars_fine.dtype), mapping,
        num_segments=num_coarse_nodes)
    mapped = counts > 0
    safe = jnp.where(mapped, counts, jnp.ones_like(counts))
    return jnp.where(mapped[:, None], sums / safe[:, None], vars_coarse)


def _inv_dist(dx):
    return 1.0 / jnp.sqrt(jnp.sum(dx * dx, axis=-1))


def prolong_residuals_interpolate(res_coarse, res_fine, vars_fine,
                                  mapping, coords_coarse, coords_fine,
                                  edge_a, edge_b):
    """Edge-based inverse-distance interpolation of coarse residuals onto
    fine nodes, then vars_fine += res_fine - interpolated.

    Faithful to mg_loops.cpp:678-864 including its quirks:
      - a fine node exactly coincident with its coarse parent (coordinate
        equality, not tolerance) takes the parent's residual directly with
        weight 1 (mg_loops.cpp:745-752);
      - the cross contribution "a1 -> b2" uses the DISTANCE to a1 but the
        RESIDUAL of b1 (mg_loops.cpp:804-810) — a reference bug kept for
        output parity;
      - fine nodes touched by no internal edge divide 0/0 in the reference;
        here they are guarded to interpolate 0 (documented divergence —
        such nodes do not occur in real meshes).

    edge_a/edge_b: the FINE level's internal edges (the reference passes
    edges[level] limited to num_internal_edges, euler3d:671-681).
    """
    num_fine = vars_fine.shape[0]
    parent = mapping  # (num_fine,) in practice; indexed by fine node id

    coincident = jnp.all(coords_fine == coords_coarse[parent], axis=-1)

    a1 = parent[edge_a]
    b1 = parent[edge_b]
    ca1, cb1 = coords_coarse[a1], coords_coarse[b1]
    ca2, cb2 = coords_fine[edge_a], coords_fine[edge_b]
    r_a1, r_b1 = res_coarse[a1], res_coarse[b1]

    id_a1a2 = _inv_dist(ca2 - ca1)
    id_b1a2 = _inv_dist(cb1 - ca2)
    id_b1b2 = _inv_dist(cb2 - cb1)
    id_a1b2 = _inv_dist(ca1 - cb2)

    live_a = (~coincident[edge_a]).astype(vars_fine.dtype)
    live_b = (~coincident[edge_b]).astype(vars_fine.dtype)

    # contribution streams into fine nodes a2 and b2:
    val_a = live_a[:, None] * (id_a1a2[:, None] * r_a1
                               + id_b1a2[:, None] * r_b1)
    w_a = live_a * (id_a1a2 + id_b1a2)
    # note r_b1 twice: the reference's a1->b2 term reads residuals1[b1].
    val_b = live_b[:, None] * ((id_b1b2 + id_a1b2)[:, None] * r_b1)
    w_b = live_b * (id_b1b2 + id_a1b2)

    dest = jnp.concatenate([edge_a, edge_b])
    acc = jax.ops.segment_sum(jnp.concatenate([val_a, val_b]), dest,
                              num_segments=num_fine)
    wsum = jax.ops.segment_sum(jnp.concatenate([w_a, w_b]), dest,
                               num_segments=num_fine)

    safe_w = jnp.where(wsum > 0, wsum, jnp.ones_like(wsum))
    wavg = jnp.where(coincident[:, None], res_coarse[parent],
                     acc / safe_w[:, None])
    return vars_fine + (res_fine - wavg)
