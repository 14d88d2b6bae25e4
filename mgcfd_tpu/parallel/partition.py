"""Mesh partitioning for SPMD execution.

The reference has NO distributed layer (SURVEY 2.6/5.8): its only
parallelism is OpenMP threads with races avoided by serialisation, loop
fission or mesh replication. This module designs the missing piece
TPU-natively:

  - nodes are split into P contiguous blocks (the generator/renumberer
    provides locality; prep/ can RCM-reorder general meshes first);
  - each internal edge is owned by the shard of endpoint `a`; boundary and
    wall edges by the shard of `b` (always local);
  - the SEPARATOR set of a shard is the owned nodes that any other shard's
    edges reference; separator values travel as one all_gather of a
    (P, Smax, NVAR) pool per flux evaluation, and foreign contributions
    return as one psum_scatter — both ride ICI as static-shape
    collectives;
  - coarse multigrid levels are replicated (they are ~8x smaller per
    level); restriction partial-sums are psum'd.

Everything here is host-side numpy preprocessing that emits statically
shaped, stacked (leading axis = shard) arrays for shard_map.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..core.constants import NVAR
from ..core.types import MeshLevel


def _pad_to(arr, n, fill):
    pad = n - arr.shape[0]
    if pad <= 0:
        return arr
    pad_block = np.full((pad,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad_block], axis=0)


@dataclasses.dataclass
class ShardedLevelData:
    """Stacked per-shard arrays for one mesh level (leading axis = P)."""
    # node block data
    volumes: np.ndarray          # (P, B)
    node_mask: np.ndarray        # (P, B) 1.0 for real nodes, 0.0 padding
    coords: np.ndarray | None    # (P, B, 3)
    # internal edges (owned by shard): local combined indices into
    # [block (B) | pool (P*Smax)]
    edge_a: np.ndarray           # (P, E) int32
    edge_b: np.ndarray           # (P, E) int32
    edge_w: np.ndarray           # (P, E, 3)
    # boundary/wall edges (always local destinations)
    bedge_b: np.ndarray          # (P, Eb) int32 (block-local)
    bedge_w: np.ndarray          # (P, Eb, 3)
    wedge_b: np.ndarray          # (P, Ew) int32
    wedge_w: np.ndarray          # (P, Ew, 3)
    # separator bookkeeping
    sep_idx: np.ndarray          # (P, Smax) int32 block-local indices
    sep_mask: np.ndarray         # (P, Smax) float
    # multigrid (to next level, which is replicated)
    mg_mapping: np.ndarray | None      # (P, B) int64 into coarse nodes,
    # padding rows map to segment `num_coarse` (dropped)
    mg_counts: np.ndarray | None       # (num_coarse,) precomputed counts
    mg_mapped: np.ndarray | None       # (num_coarse,) bool
    coincident: np.ndarray | None      # (P, B) bool (fine node == parent)
    # static prolongation geometry per owned edge (inverse distances and
    # coarse parents are mesh constants — computed once, never exchanged)
    pro_a1: np.ndarray | None = None       # (P, E) int32 coarse parent of a2
    pro_b1: np.ndarray | None = None       # (P, E) int32 coarse parent of b2
    pro_id_a1a2: np.ndarray | None = None  # (P, E) 1/dist(a1,a2)
    pro_id_b1a2: np.ndarray | None = None  # (P, E)
    pro_id_b1b2: np.ndarray | None = None  # (P, E)
    pro_id_a1b2: np.ndarray | None = None  # (P, E)
    pro_live_a: np.ndarray | None = None   # (P, E) 1.0 unless a2 coincident/pad
    pro_live_b: np.ndarray | None = None   # (P, E)
    parent: np.ndarray | None = None       # (P, B) int32 coarse parent (safe)
    # shift decomposition of shard-local edges (accumulate='shift'):
    # spans shared across shards; covered edges leave the edge_a/edge_b
    # stream (replaced by degenerate padding) and live in dense diagonals
    shift_deltas: list | None = None       # [d0, d1, ...]
    shift_w: np.ndarray | None = None      # (P, D, B, 3) dense weights
    shift_wpad: np.ndarray | None = None   # (P, 4, D*B) rolled-kernel form
    # (rows 0:3 span-major zero-padded weights, row 3 |w|; see
    # ops.tops.t_shift_flux_rolled — the sharded visit runs the same
    # batched-roll single-pass flux as the single-chip transposed solver)
    # dense per-node boundary/wall aggregates (see ops.tops
    # t_dense_boundary_wall_flux): all faces of a node collapse into one
    # aggregated normal because both fluxes read only the node's state
    dense_bd: np.ndarray | None = None     # (P, B, 3)
    dense_wl: np.ndarray | None = None     # (P, B, 3)
    # prolongation needs ALL fine internal edges regardless of the flux
    # stream's shift coverage: its own full destination stream
    pro_dest_a: np.ndarray | None = None   # (P, Efull) int32 combined idx
    pro_dest_b: np.ndarray | None = None   # (P, Efull)
    # windowed-gather production kernel, sharded (accumulate='window' /
    # 'pallas'): per-shard plans over the HALF-EDGES DESTINED TO LOCAL
    # NODES (both halves of intra-shard edges + the local half of cross
    # edges — the foreign half is recomputed by the neighbor shard from
    # the gathered halo, exact by antisymmetry), packed in the combined
    # [block | halo pool] neighbor space. Accumulation is fully local:
    # the flux path has NO return scatter collective.
    win_template: object | None = None     # WindowPlan (common shapes)
    win_arrays: dict | None = None         # stacked (P, ...) plan arrays
    win_spill_dest: np.ndarray | None = None  # (P, Hs) i32 local dest
    win_spill_src: np.ndarray | None = None   # (P, Hs) i32 combined src
    win_spill_w: np.ndarray | None = None     # (P, Hs, 3) signed normal
    win_sec_order: np.ndarray | None = None   # (P, P) i32: per-shard halo
    # pool SECTION order — most-referenced source shards first, so their
    # windows fall inside the kw neighborhood of block-tail owners (the
    # all_gather'd pool is statically reordered per shard)
    win_stats: list | None = None          # per-shard plan statistics
    # shared depth-bucketed dispatch (pallas.flux_window
    # shared_depth_buckets): ONE (start, count, l_max_b) structure baked
    # into the SPMD program, per-shard depth-sorted window orders as data
    win_wmap: np.ndarray | None = None     # (P, n_win) i32 sorted order
    win_buckets: list | None = None        # [(start, count, l_max_b)]
    # composed windowed prolongation, per shard (the sharded twin of
    # prep/window.build_prolong_window's cplan): dest = local fine
    # block, sources = the RAW coarse residual space (replicated or
    # gathered); destination-grouped, so the windowed sharded prolong
    # needs NO collective at all. Without it the sharded prolong's
    # indexed stream (two E-row coarse gathers + segment-sums) measured
    # ~85 ms/cycle on-chip at flagship P=1 vs the single-chip composed
    # kernel's 0.45 ms (round-5 sp1_diag).
    pwin_template: object | None = None
    pwin_arrays: dict | None = None
    pwin_spill_dest: np.ndarray | None = None  # (P, Hs) i32 local fine
    pwin_spill_src: np.ndarray | None = None   # (P, Hs) i32 raw coarse
    pwin_spill_w: np.ndarray | None = None     # (P, Hs)
    pwin_wmap: np.ndarray | None = None
    pwin_buckets: list | None = None
    pwin_ncp: int = 0                          # padded coarse width
    # windowed restriction, per shard (cross-space: coarse owners gather
    # their LOCAL fine children at 1/count_global; partial sums are
    # psum'd / psum_scatter'd exactly like the stream form). Dest space:
    # raw coarse (replicated-coarse case) or the coarse level's padded
    # block space P*Bc (sharded-coarse case). Replaces the segment-sum
    # scatter that measured ~4.5 ms/cycle on-chip at flagship P=1.
    rwin_template: object | None = None
    rwin_arrays: dict | None = None
    rwin_spill_dest: np.ndarray | None = None  # (P, Hs) i32 coarse dest
    rwin_spill_src: np.ndarray | None = None   # (P, Hs) i32 local fine
    rwin_spill_w: np.ndarray | None = None     # (P, Hs)
    rwin_wmap: np.ndarray | None = None
    rwin_buckets: list | None = None
    rwin_dest: int = 0                         # dest-space width (padded)
    # when the NEXT level is ALSO sharded (shard_levels > current+1):
    # restriction targets the coarse level's PADDED block space and
    # lands on each shard via one psum_scatter; prolongation all_gathers
    # the small coarse blocks and converts padded -> raw once
    mgp_pad: np.ndarray | None = None      # (P, Bs) i64: fine node ->
    # coarse padded-global index (pc*Bc + local), P*Bc = dump slot
    mgc_counts: np.ndarray | None = None   # (P, Bc) children per coarse
    mgc_mapped: np.ndarray | None = None   # (P, Bc) bool
    c_raw2pad: np.ndarray | None = None    # (Nc,) i32 raw -> padded-global
    # sizes
    num_nodes: int = 0
    block: int = 0        # storage width (window-rounded in window mode)
    part_width: int = 0   # partition width: node i belongs to shard i//part_width
    smax: int = 0

    @property
    def P(self):
        return self.volumes.shape[0]


@dataclasses.dataclass
class ShardedMeshData:
    # sharded levels 0..S-1 (S = config.shard_levels, crossover-sized:
    # SCALING.md "Replicated-coarse crossover"); levels S..L-1 replicated
    levels: list            # list[ShardedLevelData]
    coarse_levels: list[MeshLevel]   # replicated levels S..L-1 (host data)
    P: int

    @property
    def level0(self) -> ShardedLevelData:
        return self.levels[0]


def partition_order_2d(coords: np.ndarray, P: int,
                       shape: tuple[int, int] | None = None) -> np.ndarray:
    """Permutation (order[new_id] = old_id) that makes the contiguous
    B-block decomposition a 2-D (Px x Py) TILE decomposition.

    Partitioning here is "ordering + contiguous blocks" (node i belongs
    to shard i // B), so a different decomposition is just a different
    node order: chunk nodes into Px groups of Py*B by x-coordinate rank,
    then into tiles of exactly B by y rank within each group — block b
    is tile (b // Py, b % Py). Within each tile the ORIGINAL node order
    is preserved (tiles are sorted runs of the input ids), so the
    generator's banded walk / RCM locality that the window packer and
    shift planner rely on survives intact inside every tile.

    Motivation (SCALING.md round-4 P-sweep): 1-D slabs stop paying
    around P~16 at flagship size — the separator is a full cross-section
    plane per boundary, reaching 44-65% of nodes. A 2-D tiling's
    separator scales with the tile perimeter instead.
    """
    n = coords.shape[0]
    if shape is None:
        px = int(np.sqrt(P))
        while P % px:
            px -= 1
        shape = (P // px, px)
    Px, Py = shape
    if Px * Py != P:
        raise ValueError(f"partition shape {shape} != {P} shards")
    B = -(-n // P)
    ox = np.argsort(coords[:, 0], kind="stable")
    order = np.empty(n, np.int64)
    pos = 0
    for i in range(Px):
        grp = ox[i * Py * B:min((i + 1) * Py * B, n)]
        oy = grp[np.argsort(coords[grp, 1], kind="stable")]
        for j in range(Py):
            tile = oy[j * B:min((j + 1) * B, len(oy))]
            tile = np.sort(tile)          # restore original order in-tile
            order[pos:pos + len(tile)] = tile
            pos += len(tile)
    return order


def partition2d_hierarchy(mesh, P: int,
                          shape: tuple[int, int] | None = None):
    """Reorder every level of a MultigridMesh so contiguous-block
    partitioning at P shards realises the 2-D tiling (partition_order_2d
    per level, inter-level mg_mapping fixed the same way
    renumber_hierarchy does). Returns (new_mesh, orders) with
    orders[l][new_id] = old_id for callers translating state back."""
    from ..core.types import MultigridMesh
    from ..prep.renumber import apply_node_order

    new_levels = []
    orders = []
    for l, lvl in enumerate(mesh.levels):
        if lvl.coords is None:
            raise ValueError("2-D partitioning needs node coords")
        order = partition_order_2d(lvl.coords, P, shape)
        inv = np.empty_like(order)
        inv[order] = np.arange(order.shape[0])
        new_levels.append(apply_node_order(lvl, order))
        orders.append(order)
        if l > 0 and new_levels[l - 1].mg_mapping is not None:
            new_levels[l - 1].mg_mapping = inv[new_levels[l - 1].mg_mapping]
    return (MultigridMesh(levels=new_levels, variant=mesh.variant,
                          problem_size=mesh.problem_size, name=mesh.name),
            orders)


def partition_level(lvl: MeshLevel, P: int,
                    use_shift: bool = False,
                    shift_max_deltas: int = 8,
                    shift_min_density: float = 0.01,
                    use_window: bool = False,
                    plan_cache_dir: str = "",
                    window_l_cap: int = 64) -> ShardedLevelData:
    n = lvl.num_nodes
    B = -(-n // P)
    # storage width: the windowed kernel's owner space is whole (8,128)
    # vreg windows, so window mode rounds the per-shard block up to a
    # WIN multiple (assignment still uses B — blocks stay balanced; the
    # tail rows of each block are inert padding)
    if use_window:
        from ..prep.window import WIN
        Bs = -(-B // WIN) * WIN
    else:
        Bs = B

    def part(idx):
        return np.minimum(idx // B, P - 1)

    def local(idx):
        return idx - part(idx) * B

    pa, pb = part(lvl.edge_a), part(lvl.edge_b)
    owner = pa

    # --- shift decomposition of shard-local edges ------------------------
    # Edges whose endpoints share a block and whose index span is common
    # move into dense per-span diagonals (see prep/shift.py); the rest
    # stay in the indexed stream. Spans are chosen globally so every
    # shard shares the same delta list (static shapes across the mesh).
    ea = lvl.edge_a.astype(np.int64)
    eb = lvl.edge_b.astype(np.int64)
    span = eb - ea
    eligible = (pb == owner) & (span > 0) & (span < B) \
        & (local(ea) + span < B)
    cnt = np.bincount(span[eligible], minlength=1)
    order_d = np.argsort(cnt)[::-1]
    deltas = [] if not use_shift else [
        int(d) for d in order_d[:shift_max_deltas]
        if d > 0 and cnt[d] >= max(1, shift_min_density * n)]
    covered = np.zeros(ea.shape[0], dtype=bool)
    shift_w = np.zeros((P, max(1, len(deltas)), Bs, 3))
    for di, d in enumerate(deltas):
        sel = np.flatnonzero(eligible & (span == d) & ~covered)
        la = local(ea[sel])
        # dedup (owner, local_a) per delta: first wins, rest spill
        key = owner[sel].astype(np.int64) * B + la
        first_mask = np.zeros(P * B, dtype=bool)
        keep = []
        for i, k in zip(sel, key):
            if first_mask[k]:
                continue
            first_mask[k] = True
            keep.append(i)
        keep = np.array(keep, dtype=np.int64)
        shift_w[owner[keep], di, local(ea[keep])] = lvl.edge_w[keep]
        covered[keep] = True
    shift_wpad = None
    if deltas:
        D = len(deltas)
        shift_wpad = np.zeros((P, 4, D * Bs))
        for di in range(D):
            shift_wpad[:, :3, di * Bs:(di + 1) * Bs] = \
                shift_w[:, di].transpose(0, 2, 1)
            shift_wpad[:, 3, di * Bs:(di + 1) * Bs] = np.sqrt(
                (shift_w[:, di] ** 2).sum(axis=2))

    # --- separator sets: BOTH endpoints of cross edges. The scatter-
    # return paths (shift/segment flux, prolong) only reference the b
    # side (a is always local to the edge owner), but the gather-only
    # windowed path recomputes the into-b half on part(b) from the halo,
    # which needs the a side in the pool too. One definition serves all
    # paths (extra entries just ride the all_gather unused).
    sep_sets = [set() for _ in range(P)]
    cross = pa != pb
    for node in np.unique(np.concatenate(
            [lvl.edge_a[cross], lvl.edge_b[cross]])):
        sep_sets[int(part(np.int64(node)))].add(int(node))
    sep_lists = [np.array(sorted(s), dtype=np.int64) for s in sep_sets]
    smax = max(1, max(len(s) for s in sep_lists))
    sep_rank = {}
    for p in range(P):
        for r, node in enumerate(sep_lists[p]):
            sep_rank[int(node)] = r

    sep_idx = np.stack([
        _pad_to(local(s).astype(np.int32), smax, 0) for s in sep_lists])
    sep_mask = np.stack([
        _pad_to(np.ones(len(s)), smax, 0.0) for s in sep_lists])

    def combined_index(node_arr, owner_arr):
        """Index into [block (Bs) | pool (P*Smax)] for each (node, owner)."""
        node_part = part(node_arr)
        is_local = node_part == owner_arr
        loc = local(node_arr)
        pool = Bs + node_part * smax + np.array(
            [sep_rank.get(int(x), 0) for x in node_arr], dtype=np.int64)
        return np.where(is_local, loc, pool).astype(np.int32)

    # --- per-shard edge lists (uncovered edges only: the covered ones
    # live in the dense shift diagonals) ---
    emax = max(1, int(np.bincount(owner[~covered], minlength=P).max()))
    edge_a = np.zeros((P, emax), np.int32)
    edge_b = np.zeros((P, emax), np.int32)
    edge_w = np.zeros((P, emax, 3))
    for p in range(P):
        sel = (owner == p) & ~covered
        a = combined_index(lvl.edge_a[sel].astype(np.int64),
                           np.full(sel.sum(), p))
        b = combined_index(lvl.edge_b[sel].astype(np.int64),
                           np.full(sel.sum(), p))
        w = lvl.edge_w[sel]
        # padding: degenerate zero-weight self-edge on local node 0
        edge_a[p] = _pad_to(a, emax, 0)
        edge_b[p] = _pad_to(b, emax, 0)
        edge_w[p, :w.shape[0]] = w

    def local_edges(idx, wts):
        p_of = part(idx)
        cnt = np.bincount(p_of, minlength=P)
        m = max(1, int(cnt.max()))
        out_i = np.zeros((P, m), np.int32)
        out_w = np.zeros((P, m, 3))
        for p in range(P):
            sel = p_of == p
            out_i[p] = _pad_to(local(idx[sel]).astype(np.int32), m, 0)
            out_w[p, :sel.sum()] = wts[sel]
        return out_i, out_w

    bedge_b, bedge_w = local_edges(lvl.bedge_b.astype(np.int64), lvl.bedge_w)
    wedge_b, wedge_w = local_edges(lvl.wedge_b.astype(np.int64), lvl.wedge_w)

    # full destination stream (covered + uncovered) for prolongation
    efull = max(1, int(np.bincount(owner, minlength=P).max()))
    pro_dest_a = np.zeros((P, efull), np.int32)
    pro_dest_b = np.zeros((P, efull), np.int32)
    for p in range(P):
        sel = owner == p
        m = int(sel.sum())
        pro_dest_a[p, :m] = combined_index(ea[sel], np.full(m, p))
        pro_dest_b[p, :m] = combined_index(eb[sel], np.full(m, p))

    # --- node block data ---
    volumes = np.ones((P, Bs))
    node_mask = np.zeros((P, Bs))
    coords = np.zeros((P, Bs, 3)) if lvl.coords is not None else None
    for p in range(P):
        lo, hi = p * B, min((p + 1) * B, n)
        volumes[p, :hi - lo] = lvl.volumes[lo:hi]
        node_mask[p, :hi - lo] = 1.0
        if coords is not None:
            coords[p, :hi - lo] = lvl.coords[lo:hi]

    dense_bd = np.zeros((P, Bs, 3))
    dense_wl = np.zeros((P, Bs, 3))
    for arr, idx_all, w_all in ((dense_bd, lvl.bedge_b, lvl.bedge_w),
                                 (dense_wl, lvl.wedge_b, lvl.wedge_w)):
        p_of = part(idx_all.astype(np.int64))
        loc = local(idx_all.astype(np.int64))
        np.add.at(arr, (p_of, loc), w_all)

    sl = ShardedLevelData(
        volumes=volumes, node_mask=node_mask, coords=coords,
        dense_bd=dense_bd, dense_wl=dense_wl,
        edge_a=edge_a, edge_b=edge_b, edge_w=edge_w,
        bedge_b=bedge_b, bedge_w=bedge_w, wedge_b=wedge_b, wedge_w=wedge_w,
        sep_idx=sep_idx, sep_mask=sep_mask,
        mg_mapping=None, mg_counts=None, mg_mapped=None, coincident=None,
        shift_deltas=deltas, shift_w=shift_w, shift_wpad=shift_wpad,
        pro_dest_a=pro_dest_a, pro_dest_b=pro_dest_b,
        num_nodes=n, block=Bs, part_width=B, smax=smax)
    if use_window:
        _attach_window_plans(sl, lvl, P, part, local, combined_index,
                             plan_cache_dir, window_l_cap)
    return sl


def _attach_window_plans(sl: ShardedLevelData, lvl: MeshLevel, P: int,
                         part, local, combined_index,
                         plan_cache_dir: str, l_cap: int) -> None:
    """Per-shard windowed-gather plans over locally-destined half-edges.

    Shard p's half-edge set = {into-a halves of edges with part(a)=p}
    ∪ {into-b halves with part(b)=p, weight -w}: every accumulation is
    local, and foreign NEIGHBOR state arrives via the gathered halo pool
    (the combined [block | pool] space is the plan's neighbor space —
    prep/window.build_halfedge_plan cross-space mode, anchored at the
    owner's own window since the owner space is a prefix of it).
    Unplaced halves spill to a per-shard indexed half-edge stream."""
    from ..prep.window import (WIN, build_halfedge_plan, cached_plan,
                               needed_kw)
    Bs = sl.block
    smax = sl.smax
    pool = P * smax
    n_win = Bs // WIN
    n_nbr = Bs + pool
    n_win_src = -(-n_nbr // WIN)
    anchor = np.arange(n_win)
    ea = lvl.edge_a.astype(np.int64)
    eb = lvl.edge_b.astype(np.int64)
    pa, pb = part(ea), part(eb)
    halves = []
    sec_order = np.tile(np.arange(P, dtype=np.int32), (P, 1))
    pos = np.tile(np.arange(P, dtype=np.int64), (P, 1))
    raw = []
    refcnt = np.zeros((P, P), np.int64)
    for p in range(P):
        sa = pa == p
        sb = pb == p
        owner = np.concatenate([local(ea[sa]), local(eb[sb])])
        nbr_global = np.concatenate([eb[sa], ea[sb]])
        nbr = combined_index(nbr_global,
                             np.full(nbr_global.shape[0], p)).astype(
            np.int64)
        w3 = np.concatenate([lvl.edge_w[sa], -lvl.edge_w[sb]])
        raw.append((owner.astype(np.int64), nbr, w3))
        fsec = (nbr[nbr >= Bs] - Bs) // smax
        np.add.at(refcnt[p], fsec.astype(np.int64), 1)
    # per-shard pool-section reorder: the halo pool sits AFTER the block
    # in the neighbor space, and only its first kw-ish windows are
    # reachable from block-tail owners — put the sections this shard
    # actually references first (typically the adjacent shards), pushing
    # never-referenced sections out of reach instead of needed ones
    for p in range(P):
        order = np.argsort(-refcnt[p], kind="stable").astype(np.int32)
        sec_order[p] = order
        pos[p, order] = np.arange(P)
    for p, (owner, nbr, w3) in enumerate(raw):
        foreign = nbr >= Bs
        sec = np.clip((nbr - Bs) // smax, 0, P - 1)
        rank = (nbr - Bs) % smax
        nbr = np.where(foreign, Bs + pos[p, sec] * smax + rank, nbr)
        halves.append((owner, nbr, w3))
    # one kw across shards: the stacked plans share kernel shapes
    kw = max(needed_kw(o, nb, anchor, n_win_src) for o, nb, _ in halves)

    plans = []
    spill = []
    for p, (o, nb, w3) in enumerate(halves):
        ewt = np.sqrt((w3 ** 2).sum(axis=1))
        wcols = np.concatenate([w3, ewt[:, None]], axis=1)

        def build(o=o, nb=nb, wcols=wcols, w3=w3):
            plan, ok = build_halfedge_plan(
                Bs, o, nb, wcols, kw=kw, l_cap=l_cap,
                num_nbr_nodes=n_nbr, anchor=anchor)
            plan.spill_a = o[~ok].astype(np.int32)    # local dest
            plan.spill_b = nb[~ok].astype(np.int32)   # combined src
            plan.spill_w = w3[~ok]
            plan.num_spilled_edges = int((~ok).sum())
            return plan

        plans.append(cached_plan(
            plan_cache_dir, f"shardflux-p{p}of{P}",
            (o, nb, wcols, np.asarray([Bs, pool, kw, l_cap])), build))

    l_max = max(1, max(pl.l_max for pl in plans))
    hs = max(1, max(pl.spill_a.shape[0] for pl in plans))

    def padl(a, target_l):
        padw = [(0, 0)] * a.ndim
        padw[1] = (0, target_l - a.shape[1])
        return np.pad(a, padw)

    sl.win_arrays = {
        "base": np.stack([pl.base_win for pl in plans]),
        "nl": np.stack([pl.layer_count for pl in plans]),
        "own": np.stack([pl.own_local for pl in plans]),
        "lwins": np.stack([padl(pl.layer_wins, l_max) for pl in plans]),
        "wsel": np.stack([padl(pl.wsel, l_max) for pl in plans]),
        "ci": np.stack([padl(pl.col_idx, l_max) for pl in plans]),
        "rs": np.stack([padl(pl.row_sel, l_max) for pl in plans]),
        "w4": np.stack([padl(pl.w4, l_max) for pl in plans]),
    }
    sl.win_spill_dest = np.stack(
        [_pad_to(pl.spill_a, hs, 0) for pl in plans])
    sl.win_spill_src = np.stack(
        [_pad_to(pl.spill_b, hs, 0) for pl in plans])
    sl.win_spill_w = np.stack(
        [_pad_to(pl.spill_w.reshape(-1, 3), hs, 0.0) for pl in plans])
    sl.win_sec_order = sec_order
    from ..pallas.flux_window import shared_depth_buckets
    sl.win_wmap, sl.win_buckets = shared_depth_buckets(
        sl.win_arrays["nl"])
    import dataclasses as _dc
    sl.win_template = _dc.replace(
        plans[0], l_max=l_max,
        layer_wins=sl.win_arrays["lwins"][0],
        wsel=sl.win_arrays["wsel"][0], col_idx=sl.win_arrays["ci"][0],
        row_sel=sl.win_arrays["rs"][0], w4=sl.win_arrays["w4"][0])
    sl.win_stats = [
        {"shard": p, "halves": int(pl.num_half_edges),
         "spilled_halves": int(pl.num_spilled_edges),
         "coverage": pl.num_half_edges / max(
             1, pl.num_half_edges + pl.num_spilled_edges),
         "layers_max": int(pl.l_max),
         "layers_mean": float(pl.layer_count.mean()),
         "slot_fill": pl.slot_fill, "kw": int(pl.kw),
         "halo_pool_windows": n_win_src - n_win}
        for p, pl in enumerate(plans)]


def _attach_prolong_window(sl: ShardedLevelData, lvl: MeshLevel,
                           coarse: MeshLevel, P: int,
                           plan_cache_dir: str = "",
                           l_cap: int = 64) -> None:
    """Per-shard composed prolongation plans (see the pwin_* field
    comment): split the global composed half list by fine-destination
    shard, pack each shard's halves into the cross-space wsum layer
    structure against the raw coarse space, share one kw and one bucket
    structure across shards (one SPMD program; per-shard depth order as
    data, exactly like the flux plans)."""
    from ..prep.window import (WIN, build_halfedge_plan, cached_plan,
                               composed_prolong_halves, needed_kw)
    from ..pallas.flux_window import shared_depth_buckets

    Bs = sl.block
    B = sl.part_width
    n_win = Bs // WIN
    ncp = -(-coarse.num_nodes // WIN) * WIN
    n_win_src = ncp // WIN
    owner_c, nbr_c, w_c = composed_prolong_halves(lvl, coarse, ncp)
    p_of = np.minimum(owner_c // B, P - 1)

    halves = []
    anchors = []
    kw = 2
    for p in range(P):
        sel = p_of == p
        o = (owner_c[sel] - p * B).astype(np.int64)
        nb = nbr_c[sel]
        w = w_c[sel]
        ow = o // WIN
        gw = nb // WIN
        sums = np.zeros(n_win)
        cnts = np.zeros(n_win)
        np.add.at(sums, ow, gw)
        np.add.at(cnts, ow, 1)
        guess = np.arange(n_win) * (n_win_src / max(1, n_win))
        anchor = np.where(cnts > 0, sums / np.maximum(cnts, 1),
                          guess).round().astype(np.int64)
        halves.append((o, nb, w))
        anchors.append(anchor)
        kw = max(kw, needed_kw(o, nb, anchor, n_win_src))

    plans = []
    for p, (o, nb, w) in enumerate(halves):
        def build(o=o, nb=nb, w=w, anchor=anchors[p]):
            plan, ok = build_halfedge_plan(
                Bs, o, nb, w[:, None], kw=kw, l_cap=l_cap,
                num_nbr_nodes=ncp, anchor=anchor)
            plan.spill_a = o[~ok].astype(np.int32)
            plan.spill_b = nb[~ok].astype(np.int32)
            plan.spill_w = w[~ok]
            plan.num_spilled_edges = int((~ok).sum())
            return plan

        plans.append(cached_plan(
            plan_cache_dir, f"shardpro-p{p}of{P}",
            (o, nb, w, anchors[p], np.asarray([Bs, ncp, kw, l_cap])),
            build))

    l_max = max(1, max(pl.l_max for pl in plans))
    hs = max(1, max(pl.spill_a.shape[0] for pl in plans))

    def padl(a, target_l):
        padw = [(0, 0)] * a.ndim
        padw[1] = (0, target_l - a.shape[1])
        return np.pad(a, padw)

    sl.pwin_arrays = {
        "base": np.stack([pl.base_win for pl in plans]),
        "nl": np.stack([pl.layer_count for pl in plans]),
        "own": np.stack([pl.own_local for pl in plans]),
        "lwins": np.stack([padl(pl.layer_wins, l_max) for pl in plans]),
        "wsel": np.stack([padl(pl.wsel, l_max) for pl in plans]),
        "ci": np.stack([padl(pl.col_idx, l_max) for pl in plans]),
        "rs": np.stack([padl(pl.row_sel, l_max) for pl in plans]),
        "w4": np.stack([padl(pl.w4, l_max) for pl in plans]),
    }
    sl.pwin_spill_dest = np.stack(
        [_pad_to(pl.spill_a, hs, 0) for pl in plans])
    sl.pwin_spill_src = np.stack(
        [_pad_to(pl.spill_b, hs, 0) for pl in plans])
    sl.pwin_spill_w = np.stack(
        [_pad_to(pl.spill_w.reshape(-1), hs, 0.0) for pl in plans])
    sl.pwin_wmap, sl.pwin_buckets = shared_depth_buckets(
        sl.pwin_arrays["nl"])
    sl.pwin_ncp = ncp
    import dataclasses as _dc
    sl.pwin_template = _dc.replace(
        plans[0], l_max=l_max,
        layer_wins=sl.pwin_arrays["lwins"][0],
        wsel=sl.pwin_arrays["wsel"][0], col_idx=sl.pwin_arrays["ci"][0],
        row_sel=sl.pwin_arrays["rs"][0], w4=sl.pwin_arrays["w4"][0])


def _attach_restrict_window(sl: ShardedLevelData, lvl: MeshLevel,
                            P: int, dest_of_fine: np.ndarray,
                            dest_width: int,
                            plan_cache_dir: str = "",
                            l_cap: int = 64) -> None:
    """Per-shard windowed restriction plans: owner = destination coarse
    id (`dest_of_fine[global fine id]` — raw coarse or padded-global,
    both window-aligned), nbr = LOCAL fine id, weight = 1/count_global
    (folded so the psum of partials is the segment mean directly).
    Shares one kw/bucket structure across shards like the other plans."""
    from ..prep.window import (WIN, build_halfedge_plan, cached_plan,
                               needed_kw)
    from ..pallas.flux_window import shared_depth_buckets

    B, Bs = sl.part_width, sl.block
    n = sl.num_nodes
    ncp = -(-dest_width // WIN) * WIN
    n_win = ncp // WIN
    n_win_src = Bs // WIN
    counts = np.bincount(dest_of_fine, minlength=dest_width).astype(
        np.float64)
    w_all = (1.0 / np.maximum(counts, 1.0))[dest_of_fine]

    halves = []
    anchors = []
    kw = 2
    for p in range(P):
        lo, hi = p * B, min((p + 1) * B, n)
        g = np.arange(lo, hi, dtype=np.int64)
        o = dest_of_fine[g].astype(np.int64)
        nb = g - lo
        w = w_all[g]
        ow = o // WIN
        gw = nb // WIN
        sums = np.zeros(n_win)
        cnts = np.zeros(n_win)
        np.add.at(sums, ow, gw)
        np.add.at(cnts, ow, 1)
        guess = np.arange(n_win) * (n_win_src / max(1, n_win))
        anchor = np.where(cnts > 0, sums / np.maximum(cnts, 1),
                          guess).round().astype(np.int64)
        halves.append((o, nb, w))
        anchors.append(anchor)
        kw = max(kw, needed_kw(o, nb, anchor, n_win_src))

    plans = []
    for p, (o, nb, w) in enumerate(halves):
        def build(o=o, nb=nb, w=w, anchor=anchors[p]):
            plan, ok = build_halfedge_plan(
                ncp, o, nb, w[:, None], kw=kw, l_cap=l_cap,
                num_nbr_nodes=Bs, anchor=anchor)
            plan.spill_a = o[~ok].astype(np.int32)
            plan.spill_b = nb[~ok].astype(np.int32)
            plan.spill_w = w[~ok]
            plan.num_spilled_edges = int((~ok).sum())
            return plan

        plans.append(cached_plan(
            plan_cache_dir, f"shardres-p{p}of{P}",
            (o, nb, w, anchors[p], np.asarray([Bs, ncp, kw, l_cap])),
            build))

    l_max = max(1, max(pl.l_max for pl in plans))
    hs = max(1, max(pl.spill_a.shape[0] for pl in plans))

    def padl(a, target_l):
        padw = [(0, 0)] * a.ndim
        padw[1] = (0, target_l - a.shape[1])
        return np.pad(a, padw)

    sl.rwin_arrays = {
        "base": np.stack([pl.base_win for pl in plans]),
        "nl": np.stack([pl.layer_count for pl in plans]),
        "own": np.stack([pl.own_local for pl in plans]),
        "lwins": np.stack([padl(pl.layer_wins, l_max) for pl in plans]),
        "wsel": np.stack([padl(pl.wsel, l_max) for pl in plans]),
        "ci": np.stack([padl(pl.col_idx, l_max) for pl in plans]),
        "rs": np.stack([padl(pl.row_sel, l_max) for pl in plans]),
        "w4": np.stack([padl(pl.w4, l_max) for pl in plans]),
    }
    sl.rwin_spill_dest = np.stack(
        [_pad_to(pl.spill_a, hs, 0) for pl in plans])
    sl.rwin_spill_src = np.stack(
        [_pad_to(pl.spill_b, hs, 0) for pl in plans])
    sl.rwin_spill_w = np.stack(
        [_pad_to(pl.spill_w.reshape(-1), hs, 0.0) for pl in plans])
    sl.rwin_wmap, sl.rwin_buckets = shared_depth_buckets(
        sl.rwin_arrays["nl"])
    sl.rwin_dest = ncp
    import dataclasses as _dc
    sl.rwin_template = _dc.replace(
        plans[0], l_max=l_max,
        layer_wins=sl.rwin_arrays["lwins"][0],
        wsel=sl.rwin_arrays["wsel"][0], col_idx=sl.rwin_arrays["ci"][0],
        row_sel=sl.rwin_arrays["rs"][0], w4=sl.rwin_arrays["w4"][0])


def _attach_mg(sl: ShardedLevelData, lvl: MeshLevel, coarse: MeshLevel,
               P: int) -> None:
    """MG bookkeeping from sharded `lvl` to raw-indexed `coarse` (used
    when the coarse side is replicated, and for prolongation INTO `lvl`
    — prolong always consumes raw-width coarse residuals)."""
    mapping = lvl.mg_mapping
    assert mapping is not None and mapping.shape[0] == lvl.num_nodes, \
        "sharded multigrid requires a full fine->coarse mapping"
    B = sl.part_width
    Bs = sl.block
    mg = np.full((P, Bs), coarse.num_nodes, dtype=np.int64)
    for p in range(P):
        lo, hi = p * B, min((p + 1) * B, lvl.num_nodes)
        mg[p, :hi - lo] = mapping[lo:hi]
    counts = np.bincount(mapping, minlength=coarse.num_nodes).astype(
        np.float64)
    sl.mg_mapping = mg
    sl.mg_counts = counts
    sl.mg_mapped = counts > 0
    # coincidence of fine node with its coarse parent (static geometry)
    coin = np.zeros((P, Bs), dtype=bool)
    full_coin = np.all(lvl.coords == coarse.coords[mapping], axis=1)
    for p in range(P):
        lo, hi = p * B, min((p + 1) * B, lvl.num_nodes)
        coin[p, :hi - lo] = full_coin[lo:hi]
    sl.coincident = coin
    sl.parent = np.minimum(mg, coarse.num_nodes - 1).astype(np.int32)
    _attach_prolong_geometry(sl, lvl, coarse, full_coin, P)


def _attach_mg_padded(sl_f: ShardedLevelData, sl_c: ShardedLevelData,
                      lvl_f: MeshLevel, P: int) -> None:
    """Extras for a sharded->SHARDED restriction (VERDICT r03 #4 /
    SCALING crossover): fine nodes target the coarse level's padded
    block space so the partial sums land on their owner shard via one
    psum_scatter; prolongation converts the all_gathered padded blocks
    back to raw once via c_raw2pad."""
    mapping = lvl_f.mg_mapping.astype(np.int64)
    Bc, Wc, Nc = sl_c.block, sl_c.part_width, sl_c.num_nodes
    pc = np.minimum(mapping // Wc, P - 1)
    pad = pc * Bc + (mapping - pc * Wc)
    B, Bs = sl_f.part_width, sl_f.block
    mgp = np.full((P, Bs), P * Bc, dtype=np.int64)       # dump slot
    for p in range(P):
        lo, hi = p * B, min((p + 1) * B, lvl_f.num_nodes)
        mgp[p, :hi - lo] = pad[lo:hi]
    counts_raw = np.bincount(mapping, minlength=Nc).astype(np.float64)
    cc = np.zeros((P, Bc))
    cm = np.zeros((P, Bc), dtype=bool)
    for p in range(P):
        lo, hi = p * Wc, min((p + 1) * Wc, Nc)
        cc[p, :hi - lo] = counts_raw[lo:hi]
        cm[p, :hi - lo] = counts_raw[lo:hi] > 0
    g = np.arange(Nc, dtype=np.int64)
    pg = np.minimum(g // Wc, P - 1)
    sl_f.mgp_pad = mgp
    sl_f.mgc_counts = cc
    sl_f.mgc_mapped = cm
    sl_f.c_raw2pad = (pg * Bc + (g - pg * Wc)).astype(np.int32)


def partition_mesh(mesh, P: int, use_shift: bool = False,
                   use_window: bool = False,
                   plan_cache_dir: str = "",
                   shard_levels: int = 1) -> ShardedMeshData:
    """Shard levels 0..S-1 (S = min(shard_levels, L-1) but at least 1);
    attach MG bookkeeping per sharded level. Levels S.. stay replicated
    (the crossover rule: replicate a level only when its whole-level
    time is under the ~30-60 us collective floor; SCALING.md)."""
    L = mesh.num_levels
    if shard_levels == 0:
        # AUTO (config.shard_levels=0): shard while the level keeps a
        # meaningful block per shard (>= 4 vreg windows of nodes) —
        # the host-side proxy for the measured crossover rule
        S = 1
        while (S < L - 1
               and mesh.levels[S].num_nodes >= 4096 * P):
            S += 1
    else:
        S = max(1, min(shard_levels, max(1, L - 1)))
    slevels = []
    for i in range(S):
        sl = partition_level(mesh.levels[i], P, use_shift=use_shift,
                             use_window=use_window,
                             plan_cache_dir=plan_cache_dir)
        slevels.append(sl)
    for i, sl in enumerate(slevels):
        if i + 1 < L:
            _attach_mg(sl, mesh.levels[i], mesh.levels[i + 1], P)
            if use_window and mesh.levels[i].coords is not None \
                    and mesh.levels[i + 1].coords is not None:
                _attach_prolong_window(sl, mesh.levels[i],
                                       mesh.levels[i + 1], P,
                                       plan_cache_dir=plan_cache_dir)
        if i + 1 < S:
            _attach_mg_padded(sl, slevels[i + 1], mesh.levels[i], P)
        if use_window and i + 1 < L:
            mapping = mesh.levels[i].mg_mapping.astype(np.int64)
            if i + 1 < S:
                # coarse is ALSO sharded: dest = padded-global block
                # space (matches mgp_pad; psum_scatter landing)
                sc = slevels[i + 1]
                Bc, Wc = sc.block, sc.part_width
                pc = np.minimum(mapping // Wc, P - 1)
                dest = pc * Bc + (mapping - pc * Wc)
                _attach_restrict_window(sl, mesh.levels[i], P, dest,
                                        P * Bc,
                                        plan_cache_dir=plan_cache_dir)
            else:
                _attach_restrict_window(sl, mesh.levels[i], P, mapping,
                                        mesh.levels[i + 1].num_nodes,
                                        plan_cache_dir=plan_cache_dir)
    return ShardedMeshData(levels=slevels, coarse_levels=mesh.levels[S:],
                           P=P)


def _attach_prolong_geometry(sl: ShardedLevelData, lvl0: MeshLevel,
                             coarse: MeshLevel, full_coin: np.ndarray,
                             P: int) -> None:
    """Per-owned-edge static prolongation data (see ops.mg.prolong_
    residuals_interpolate for semantics, incl. the reference's a1->b2
    residual quirk which shows up here as id_a1b2 pairing with b1)."""
    B = sl.part_width
    mapping = lvl0.mg_mapping
    owner = np.minimum(lvl0.edge_a // B, P - 1)
    E = sl.pro_dest_a.shape[1]  # full stream (prolong covers ALL edges)

    def idist(p, q):
        d = p - q
        return 1.0 / np.sqrt((d * d).sum(axis=1))

    shape = (P, E)
    pro = {k: np.zeros(shape) for k in
           ("id_a1a2", "id_b1a2", "id_b1b2", "id_a1b2", "live_a", "live_b")}
    a1s = np.zeros(shape, np.int32)
    b1s = np.zeros(shape, np.int32)
    for p in range(P):
        sel = owner == p
        a2 = lvl0.edge_a[sel].astype(np.int64)
        b2 = lvl0.edge_b[sel].astype(np.int64)
        a1 = mapping[a2]
        b1 = mapping[b2]
        ca1, cb1 = coarse.coords[a1], coarse.coords[b1]
        ca2, cb2 = lvl0.coords[a2], lvl0.coords[b2]
        m = a2.shape[0]
        a1s[p, :m] = a1
        b1s[p, :m] = b1
        with np.errstate(divide="ignore"):
            pro["id_a1a2"][p, :m] = idist(ca2, ca1)
            pro["id_b1a2"][p, :m] = idist(cb1, ca2)
            pro["id_b1b2"][p, :m] = idist(cb2, cb1)
            pro["id_a1b2"][p, :m] = idist(ca1, cb2)
        pro["live_a"][p, :m] = (~full_coin[a2]).astype(np.float64)
        pro["live_b"][p, :m] = (~full_coin[b2]).astype(np.float64)
    # coincident endpoints produce inf idists; they are masked by live_*=0,
    # so zero them to keep the arrays finite:
    for k in ("id_a1a2", "id_b1a2"):
        pro[k][~np.isfinite(pro[k])] = 0.0
        pro[k] *= pro["live_a"] > 0
    for k in ("id_b1b2", "id_a1b2"):
        pro[k][~np.isfinite(pro[k])] = 0.0
        pro[k] *= pro["live_b"] > 0
    sl.pro_a1, sl.pro_b1 = a1s, b1s
    sl.pro_id_a1a2 = pro["id_a1a2"]
    sl.pro_id_b1a2 = pro["id_b1a2"]
    sl.pro_id_b1b2 = pro["id_b1b2"]
    sl.pro_id_a1b2 = pro["id_a1b2"]
    sl.pro_live_a = pro["live_a"]
    sl.pro_live_b = pro["live_b"]
