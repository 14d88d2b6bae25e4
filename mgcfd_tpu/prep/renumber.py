"""Node renumbering for gather locality.

The TPU flux kernel's performance lives on gather locality (arithmetic
intensity < 1 flop/byte; SURVEY §6): after reverse-Cuthill-McKee
renumbering, edge endpoints cluster near the diagonal, so gathers hit
consecutive HBM lines and block-partitioning (parallel/) cuts fewer
edges. Our synthetic box meshes are already well-ordered; RCM matters for
imported real meshes.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..core.types import MeshLevel


def rcm_order(num_nodes: int, edge_a: np.ndarray,
              edge_b: np.ndarray) -> np.ndarray:
    """Reverse Cuthill-McKee via CSR adjacency + BFS with degree-sorted
    neighbour visits. Returns `order` with order[new_id] = old_id."""
    deg = np.bincount(edge_a, minlength=num_nodes) + np.bincount(
        edge_b, minlength=num_nodes)
    # CSR adjacency
    starts = np.zeros(num_nodes + 1, np.int64)
    np.cumsum(deg, out=starts[1:])
    adj = np.empty(starts[-1], np.int64)
    fill = starts[:-1].copy()
    for u, v in ((edge_a, edge_b), (edge_b, edge_a)):
        for i in range(len(u)):
            a = u[i]
            adj[fill[a]] = v[i]
            fill[a] += 1

    visited = np.zeros(num_nodes, bool)
    order = np.empty(num_nodes, np.int64)
    pos = 0
    remaining = np.argsort(deg, kind="stable")
    for seed in remaining:
        if visited[seed]:
            continue
        visited[seed] = True
        order[pos] = seed
        head = pos
        pos += 1
        while head < pos:
            u = order[head]
            head += 1
            nbrs = adj[starts[u]:starts[u + 1]]
            nbrs = nbrs[~visited[nbrs]]
            if nbrs.size:
                nbrs = np.unique(nbrs)
                nbrs = nbrs[np.argsort(deg[nbrs], kind="stable")]
                visited[nbrs] = True
                order[pos:pos + nbrs.size] = nbrs
                pos += nbrs.size
    return order[::-1].copy()  # the "reverse" in RCM


def apply_node_order(lvl: MeshLevel, order: np.ndarray) -> MeshLevel:
    """Permute a level's node arrays so new_id i holds old node order[i].
    Edges/mappings are re-indexed; edge and class ordering is preserved.
    The level's own mg_mapping rows are permuted (it is indexed by this
    level's node ids); its VALUES live in the next level's namespace and
    must be fixed by the caller if that level is renumbered too (see
    renumber_hierarchy)."""
    if lvl.mg_mapping is not None and \
            lvl.mg_mapping.shape[0] != lvl.num_nodes:
        raise ValueError("renumbering requires a full fine->coarse "
                         "mapping (one entry per node)")
    inv = np.empty_like(order)
    inv[order] = np.arange(order.shape[0])
    ea = inv[lvl.edge_a].astype(np.int32)
    eb = inv[lvl.edge_b].astype(np.int32)
    ew = lvl.edge_w
    # NOTE: edges may end up with a > b after renumbering. Do NOT flip
    # them: the flux value is antisymmetric (flip-safe), but the
    # reference's prolongation treats the two endpoints asymmetrically
    # (the a1->b2 residual quirk, mg_loops.cpp:804-810), so orientation
    # is semantically significant. Downstream span decompositions
    # normalise internally where safe (flux) and spill where not
    # (prolongation).
    new = dataclasses.replace(
        lvl,
        volumes=lvl.volumes[order],
        coords=None if lvl.coords is None else lvl.coords[order],
        edge_a=ea, edge_b=eb, edge_w=ew,
        bedge_b=inv[lvl.bedge_b].astype(np.int32),
        wedge_b=inv[lvl.wedge_b].astype(np.int32),
        mg_mapping=None if lvl.mg_mapping is None
        else lvl.mg_mapping[order],
    )
    new.validate()
    return new


def renumber_hierarchy(mesh, method: str = "rcm",
                       align_coarse: bool = True):
    """RCM-renumber every level of a MultigridMesh, consistently fixing
    the inter-level mappings (renumbering level l permutes the VALUES of
    level l-1's mg_mapping and the ROWS of level l's own mapping).

    With align_coarse (default), levels > 0 are ordered by the MEAN
    INDEX OF THEIR CHILDREN in the (already renumbered) finer level
    instead of an independent RCM: independent RCMs put the two levels
    on uncorrelated space-filling walks, scattering each coarse node's
    children across the fine index space — which wrecks cross-level
    window plans (restrict spill measured at ~8 ms/cycle of scatter-add)
    and parent-gather locality. The induced order inherits the fine
    RCM's spatial locality, so intra-level bandwidth stays good too.

    Imported real meshes arrive in arbitrary node order; this is the
    preprocessing that makes the span/window flux paths (and
    contiguous-block partitioning) effective on them. Returns a new
    MultigridMesh; the input is not modified.
    """
    from ..core.types import MultigridMesh

    levels = list(mesh.levels)
    new_levels = []
    for l, lvl in enumerate(levels):
        if l > 0 and align_coarse and \
                new_levels[l - 1].mg_mapping is not None:
            fmap = new_levels[l - 1].mg_mapping  # values: OLD level-l ids
            sums = np.zeros(lvl.num_nodes)
            cnts = np.zeros(lvl.num_nodes)
            np.add.at(sums, fmap, np.arange(fmap.shape[0], dtype=float))
            np.add.at(cnts, fmap, 1.0)
            # childless nodes keep a stable position at the end
            pos = np.where(cnts > 0, sums / np.maximum(cnts, 1), np.inf)
            order = np.lexsort((np.arange(lvl.num_nodes), pos))
        else:
            order = rcm_order(lvl.num_nodes, lvl.edge_a, lvl.edge_b)
        inv = np.empty_like(order)
        inv[order] = np.arange(order.shape[0])
        new = apply_node_order(lvl, order)
        new_levels.append(new)
        if l > 0 and new_levels[l - 1].mg_mapping is not None:
            # finer level's mapping VALUES live in this level's namespace
            new_levels[l - 1].mg_mapping = \
                inv[new_levels[l - 1].mg_mapping]
    return MultigridMesh(levels=new_levels, variant=mesh.variant,
                         problem_size=mesh.problem_size, name=mesh.name)


def tile_interleave_order(num_nodes: int) -> np.ndarray:
    """Window-tile interleave permutation (order[new_id] = old_id).

    The windowed-gather kernel (pallas/flux_window.py) addresses a
    1024-node window as an (8, 128) vreg tile. The packer's preferred
    node -> (row, lane) map is the INTERLEAVE (row = j % 8, lane =
    (j // 8) % 128): after RCM, consecutive nodes spread over all 8
    rows, balancing the per-(g_row, ·) coloring constraints (the
    position-major map measured ~4x the layer count). But the state
    array (5, P) enumerates nodes position-major, so an interleaved
    PLAN forces a minor-dim (128, 8) -> (8, 128) relayout of every
    kernel operand and result — measured ~1.9 ms/cycle of XLA
    concat/reshape/transpose on the tet flagship.

    Composing THIS permutation with the RCM order makes the two maps
    coincide: node at RCM rank j gets id win*1024 + (j%8)*128 +
    (j//8)%128, so the builder's position-major ("linear") map
    reproduces the interleave assignment exactly and kernel operands
    become pure reshapes. A partial tail window is rank-compacted to
    keep the permutation within [0, N).
    """
    j = np.arange(num_nodes, dtype=np.int64)
    loc = j & 1023
    pos = (j & ~np.int64(1023)) | ((loc & 7) << 7) | ((loc >> 3) & 127)
    return np.argsort(pos, kind="stable")  # order[new] = old


def tile_interleave_levels(levels: list) -> tuple[list, list]:
    """Apply the tile interleave to every level of a hierarchy (list of
    MeshLevel sharing mg_mapping links), fixing inter-level mappings the
    same way renumber_hierarchy does. Returns (new_levels, orders) with
    orders[l][new_id] = old_id — callers translating state back to the
    external order index with them."""
    new_levels = []
    orders = []
    for l, lvl in enumerate(levels):
        order = tile_interleave_order(lvl.num_nodes)
        inv = np.empty_like(order)
        inv[order] = np.arange(order.shape[0])
        new_levels.append(apply_node_order(lvl, order))
        orders.append(order)
        if l > 0 and new_levels[l - 1].mg_mapping is not None:
            new_levels[l - 1].mg_mapping = inv[new_levels[l - 1].mg_mapping]
    return new_levels, orders


def locality_stats(lvl: MeshLevel) -> dict:
    """Mean/max |a-b| index distance over internal edges — the knob RCM
    turns; useful for deciding whether an imported mesh needs it."""
    d = np.abs(lvl.edge_a.astype(np.int64) - lvl.edge_b.astype(np.int64))
    return {"mean_span": float(d.mean()) if d.size else 0.0,
            "max_span": int(d.max()) if d.size else 0,
            "num_edges": int(d.size)}
