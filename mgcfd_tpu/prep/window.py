"""Windowed-gather flux plan: unstructured meshes at dense-kernel speed.

The shift decomposition collapses on unstructured meshes (tet meshes at
M6 scale: RCM bandwidth ~9.5K, <40% coverage at 256 spans — measured,
BASELINE.md), and every XLA indexed path is floored by the gather
engine's ~6 ns/row. The TPU primitive that breaks that floor is
`tpu.dynamic_gather` (Pallas `jnp.take_along_axis`): a per-lane dynamic
gather WITHIN one (8, 128) vreg-tile.

Two chained single-vreg gathers fetch an arbitrary entry of a 1024-node
window table held in one (8,128) tile per channel (node j at sublane
j//128 % 8, lane j%128):

    t1[r, l] = table[r, col_idx[r, l]]      (axis=1: pick lane, per row)
    out[r, l] = t1[row_sel[r, l], l]        (axis=0: pick row, per lane)

out[slot (r,l)] = table[row_want, col_want] holds iff
col_idx[row_want, l] == col_want — i.e. in every lane-column l of a
layer, the up-to-8 slots must want 8 DISTINCT table rows. That is a
bipartite edge-coloring constraint, satisfied at preprocessing by a
greedy first-fit over per-column bitmasks (Konig: Δ colors suffice for
bipartite, greedy stays near that).

The layer's gather TABLE is composed from S source windows by PER-
POSITION selection (wsel keyed by table position (g_row, g_lane)):
the composite is built with S-1 elementwise selects, then the two
chained gathers run ONCE per channel — 2 gathers + (S-1) selects per
channel per layer. The earlier cell-keyed scheme selected AFTER the
first gather (S+1 gathers/channel/layer); selects are near-free on
the VPU while dynamic_gather issue dominates this kernel, and the
looser position constraint lets S rise to 8, cutting packed layers
~1.2x on tet meshes (32.7 -> ~26 layers/window measured) — together
a measured ~1.3x on the kernel body (.golden/window_body_bench.py).

Node j maps to window j//1024, row j%8, lane (j//8)%128 (interleaved:
small RCM deltas spread over rows, balancing the coloring).

Plan layout (one owner window = 1024 consecutive RCM node ids):
  - each internal edge becomes TWO half-edges (owner a with +w, owner b
    with -w): val(q_owner, q_nbr, ±w) accumulates += into the owner —
    exact antisymmetry makes both sides identical math;
  - a LAYER of an owner window is an (8,128) slot grid ALIGNED to the
    owner nodes (slot (r,l) accumulates to owner node l*8+r): the
    accumulation is a dense add, no scatter of any kind;
  - a layer's gather TABLE is assembled from up to S=8 neighbor windows,
    chosen PER TABLE POSITION by a streamed 3-bit mask (select chain
    over the S window tiles, applied BEFORE the gathers). Binding a
    layer to a single window fragments the packing on RCM band tails
    (measured lower bounds 27-65 layers/window vs ~10 halves/1024);
    multi-source selection collapses that, and the per-layer <=S window
    budget is the binding packing constraint (measured: S=4 -> 32.7
    layers/window on the tet flagship, S=8 -> ~26);
  - zero-weight slots are inert (factor and central term both vanish).

Half-edges whose neighbor lies outside the kw-window neighborhood, or
that exceed the layer cap, spill to the segment-sum path (kept tiny by
RCM; reported by the plan).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from ..core.types import MeshLevel

WIN = 1024          # nodes per window: one (8,128) f32 vreg-tile


@dataclasses.dataclass
class WindowPlan:
    n_win: int                # number of 1024-node OWNER windows
    kw: int                   # neighborhood width (windows) per owner
    l_max: int                # layer slots allocated per window
    n_src: int                # S: windows selectable per layer
    base_win: np.ndarray      # (n_win,) i32: neighborhood start window
    own_local: np.ndarray     # (n_win,) i32: owner's offset in [0, kw)
    layer_count: np.ndarray   # (n_win,) i32: live layers per window
    layer_wins: np.ndarray    # (n_win, l_max, S) i32: local window offsets
    wsel: np.ndarray          # (n_win, l_max, 8, 128) i32: source slot
                              #   per table POSITION (g_row, g_lane)
    col_idx: np.ndarray       # (n_win, l_max, 8, 128) i32
    row_sel: np.ndarray       # (n_win, l_max, 8, 128) i32
    w4: np.ndarray            # (n_win, l_max, 4, 8, 128) f64: w, |w|
    spill_a: np.ndarray       # overflow internal edges (full edges)
    spill_b: np.ndarray
    spill_w: np.ndarray
    num_half_edges: int
    num_spilled_edges: int
    n_win_src: int = 0        # neighbor-space windows (0 = same space)
    linear_layout: int = 0    # 1 = node -> (row j//128%8, lane j%128):
                              #   kernel operands are pure reshapes of
                              #   (·, P) arrays (use with meshes permuted
                              #   by prep.renumber.tile_interleave_*)

    @property
    def src_windows(self) -> int:
        return self.n_win_src or self.n_win

    @property
    def padded_nodes(self) -> int:
        return self.n_win * WIN

    @property
    def coverage(self) -> float:
        placed = self.num_half_edges // 2
        return 1.0 - self.num_spilled_edges / max(
            1, placed + self.num_spilled_edges)

    @property
    def slot_fill(self) -> float:
        """Fraction of allocated layer slots holding a real half-edge."""
        live = int(self.layer_count.sum()) * WIN
        return self.num_half_edges / max(1, live)


def build_halfedge_plan(num_nodes: int, owner: np.ndarray,
                        nbr: np.ndarray, wcols: np.ndarray,
                        pair_id: np.ndarray | None = None,
                        kw: int | None = None,
                        l_cap: int = 64,
                        num_nbr_nodes: int | None = None,
                        anchor: np.ndarray | None = None,
                        n_src: int = 8,
                        node_map: str = "interleave"):
    """Pack arbitrary half-edges (owner, nbr, K weight columns) into the
    windowed-gather layer structure. This serves the flux kernel (K=4:
    signed normal + |w|, pair_id = edge id so spilling one half spills
    its partner), the windowed prolongation (K=1: the B1 inverse-
    distance coefficient, halves independent), and CROSS-SPACE operators
    like restriction (num_nbr_nodes: neighbors live in a different node
    id space — e.g. coarse owners gathering fine children; the
    neighborhood base is then anchored at each owner window's mean
    neighbor window instead of its own index).

    Returns (plan: WindowPlan with empty spill arrays, ok: bool mask over
    the half-edges — False = spilled to the caller's indexed path)."""
    n = num_nodes
    n_win = -(-n // WIN)
    H = owner.shape[0]
    owner = owner.astype(np.int64)
    nbr = nbr.astype(np.int64)
    K = wcols.shape[1]

    ow = owner // WIN
    gw = nbr // WIN
    if num_nbr_nodes is None:
        n_win_src = n_win
        if anchor is None:
            anchor = np.arange(n_win)
    else:
        n_win_src = -(-num_nbr_nodes // WIN)
        if anchor is None:
            sums = np.zeros(n_win)
            cnts = np.zeros(n_win)
            np.add.at(sums, ow, gw)
            np.add.at(cnts, ow, 1)
            # windows with no half-edges anchor proportionally
            guess = np.arange(n_win) * (n_win_src / max(1, n_win))
            anchor = np.where(cnts > 0, sums / np.maximum(cnts, 1),
                              guess).round().astype(np.int64)

    if kw is None:
        # cover the realized window span of most half-edges TWO-SIDED
        # (the neighborhood is centred on the anchor). The clamp bounds
        # the kernel's neighborhood block (kw x 32 KB of VMEM per grid
        # step in element-blocked mode — 64 windows = 2 MB, comfortable;
        # spans beyond it spill): wide-span meshes like coarse-delta
        # boxes need kw ~ 2x(span/1024).
        span = np.abs(anchor[ow] - gw)
        need = int(np.percentile(span, 99.5)) + 1 if H else 1
        kw = int(min(n_win_src, max(2, min(64, 2 * need + 1))))
    else:
        kw = int(min(kw, n_win_src))

    base_win = np.clip(anchor - (kw - 1) // 2, 0,
                       max(0, n_win_src - kw)).astype(np.int32)
    own_local = np.clip(np.arange(n_win) - base_win, 0,
                        kw - 1).astype(np.int32)
    lw = gw - base_win[ow]                       # local window offset
    in_range = (lw >= 0) & (lw < kw)
    # with pair_id, spill whole PAIRS if either member is out of range
    # (keeps the two accumulations of an edge in one path)
    if pair_id is not None:
        npair = int(pair_id.max()) + 1 if H else 0
        pair_ok = np.ones(npair, bool)
        pair_ok[pair_id[~in_range]] = False
    else:
        pair_ok = None

    # within-window node -> (row, lane) mapping. Default: INTERLEAVED
    # (row = j % 8, lane = (j // 8) % 128): after RCM most neighbors sit
    # at small |delta|, and the interleave spreads them over all 8 rows,
    # keeping the per-(g_row, o_lane) cell demand near-uniform (the
    # position-major j>>7 mapping concentrates small deltas on one row
    # and blows the layer count ~4x - measured). "linear" uses the
    # position-major map (row = (j >> 7) & 7, lane = j & 127) so kernel
    # operands need NO relayout — correct coloring balance then requires
    # the mesh to be pre-permuted with tile_interleave_* (which makes
    # this map reproduce the interleave assignment exactly).
    o_local = owner - ow * WIN
    g_local = nbr - gw * WIN
    if node_map == "linear":
        o_row = ((o_local >> 7) & 7).astype(np.int64)
        o_lane = (o_local & 127).astype(np.int64)
        g_row = ((g_local >> 7) & 7).astype(np.int64)
        g_lane = (g_local & 127).astype(np.int64)
    else:
        o_row = (o_local & 7).astype(np.int64)
        o_lane = ((o_local >> 3) & 127).astype(np.int64)
        g_row = (g_local & 7).astype(np.int64)
        g_lane = ((g_local >> 3) & 127).astype(np.int64)

    # Greedy first-fit with O(1) per half-edge: per-key LAYER BITMASKS
    # (l_cap <= 64 -> one python int per key). A layer may source up to
    # S windows (per-POSITION 3-bit select applied before the gathers);
    # candidates = layers where the owner slot is free AND (the cell is
    # free or holds exactly this neighbor) AND (the table position
    # (g_row, g_lane) is unbound or bound to this source window) AND
    # (the nbr window is already in the layer's source set or the set
    # has room); take the lowest set bit, else open a layer.
    assert l_cap <= 64
    assert kw <= 128  # val_mask packs the window offset into 7 bits
    S = n_src
    layer_count = np.zeros(n_win, np.int32)
    layer_wins = np.zeros((n_win, l_cap, S), np.int32)
    nsrc_used = np.zeros((n_win, l_cap), np.int32)
    col_idx = np.zeros((n_win, l_cap, 8, 128), np.int32)
    row_sel = np.zeros((n_win, l_cap, 8, 128), np.int32)
    wsel = np.zeros((n_win, l_cap, 8, 128), np.int32)
    w4 = np.zeros((n_win, l_cap, K, 8, 128))

    slot_mask = [0] * (n_win * WIN)      # key: owner node
    cell_mask = [0] * (n_win * WIN)      # key: (win, g_row, o_lane)
    pos_mask = [0] * (n_win * WIN)       # key: (win, g_row, g_lane)
    pos_lw_mask: dict = {}               # (pos, lw) -> layers bound so
    winset_mask: dict = {}               # (wv, lw) -> layers sourcing lw
    winslot: dict = {}                   # (wv, layer, lw) -> source slot
    spare_mask = [0] * n_win             # layers with |source set| < S
    # layers where a cell holds EXACTLY this (window, neighbor):
    # consecutive RCM nodes share many neighbors, and sharing the cell
    # halves the layer count (measured)
    val_mask: dict = {}
    placement = np.full(H, -1, np.int32)
    place_src = np.zeros(H, np.int32)

    # process ROUND-ROBIN over owners (rank r of every owner before rank
    # r+1 of any): the slot constraint (one half-edge per owner per
    # layer) then fills layers breadth-first, keeping the layer count
    # near the max-degree lower bound instead of letting early owners
    # monopolise low layers
    so = np.argsort(owner, kind="stable")
    starts = np.flatnonzero(np.concatenate(
        [[True], np.diff(owner[so]) != 0])) if H else np.zeros(0, np.int64)
    lens = np.diff(np.concatenate([starts, [H]])) if H else starts
    rank = np.empty(H, np.int64)
    rank[so] = np.arange(H) - np.repeat(starts, lens)
    order = np.lexsort((lw, rank, ow))

    # native fast path: the same first-fit loop in C++ (bit-identical
    # plans; native/window_pack.cpp) — ~50x the Python loop, which
    # remains below as the specification and toolchain-free fallback
    native = None
    try:
        from ..native.loader import pack_halfedges_native
        npair = (int(pair_id.max()) + 1
                 if (pair_id is not None and H) else 0)
        native = pack_halfedges_native(
            order, ow, lw, o_row, o_lane, g_row, g_lane, in_range,
            pair_id, npair, n_win, kw, l_cap, S)
    except Exception:
        native = None
    if native is not None:
        (placement, place_src, layer_count[...], layer_wins[...],
         nsrc_used[...], pair_ok_native) = native
        if pair_ok_native is not None:
            pair_ok = pair_ok_native
        return _finish_plan(locals())

    ow_l = ow.tolist(); lw_l = lw.tolist()
    orow_l = o_row.tolist(); olane_l = o_lane.tolist()
    grow_l = g_row.tolist(); glane_l = g_lane.tolist()
    ok_l = in_range.tolist()
    pid_l = pair_id.tolist() if pair_id is not None else None
    pair_ok_l = pair_ok.tolist() if pair_ok is not None else None
    lc = layer_count
    for h in order.tolist():
        if not ok_l[h]:
            continue
        if pid_l is not None and not pair_ok_l[pid_l[h]]:
            continue
        wv = ow_l[h]; lwv = lw_l[h]
        orv = orow_l[h]; olv = olane_l[h]; grv = grow_l[h]
        glv = glane_l[h]
        sk = wv * WIN + orv * 128 + olv
        ck = wv * WIN + grv * 128 + olv
        pk = wv * WIN + grv * 128 + glv
        vk = (ck << 14) | (lwv << 7) | glv
        plk = (pk << 7) | lwv
        wk = wv * kw + lwv
        have_win = winset_mask.get(wk, 0)
        free = ~slot_mask[sk] & (have_win | spare_mask[wv])
        cand = free & (~cell_mask[ck] | val_mask.get(vk, 0))
        cand &= ~pos_mask[pk] | pos_lw_mask.get(plk, 0)
        if cand:
            layer = (cand & -cand).bit_length() - 1
        else:
            layer = int(lc[wv])
            if layer >= l_cap:
                if pid_l is not None:
                    pair_ok_l[pid_l[h]] = False
                continue
            lc[wv] = layer + 1
            spare_mask[wv] |= 1 << layer
        bit = 1 << layer
        src = winslot.get((wv, layer, lwv))
        if src is None:
            src = int(nsrc_used[wv, layer])
            winslot[(wv, layer, lwv)] = src
            layer_wins[wv, layer, src] = lwv
            nsrc_used[wv, layer] = src + 1
            winset_mask[wk] = winset_mask.get(wk, 0) | bit
            if src + 1 == S:
                spare_mask[wv] &= ~bit
        slot_mask[sk] |= bit
        cell_mask[ck] |= bit
        pos_mask[pk] |= bit
        val_mask[vk] = val_mask.get(vk, 0) | bit
        pos_lw_mask[plk] = pos_lw_mask.get(plk, 0) | bit
        placement[h] = layer
        place_src[h] = src

    if pair_ok_l is not None:
        pair_ok = np.asarray(pair_ok_l, bool)
    return _finish_plan(locals())


def _finish_plan(ns):
    """Shared tail of build_halfedge_plan (vectorized slot fills + plan
    assembly) for the native and Python packer paths; `ns` is the
    caller's locals()."""
    (placement, place_src, pair_ok, pair_id, ow, o_row, o_lane, g_row,
     g_lane, wcols, K) = (ns[k] for k in (
        "placement", "place_src", "pair_ok", "pair_id", "ow", "o_row",
        "o_lane", "g_row", "g_lane", "wcols", "K"))
    (n_win, kw, S, num_nbr_nodes, n_win_src, base_win, own_local,
     layer_count, layer_wins, wsel, col_idx, row_sel, w4) = (ns[k] for k in (
        "n_win", "kw", "S", "num_nbr_nodes", "n_win_src", "base_win",
        "own_local", "layer_count", "layer_wins", "wsel", "col_idx",
        "row_sel", "w4"))
    ok = placement >= 0
    if pair_ok is not None and pair_id is not None:
        ok &= pair_ok[pair_id]
    hp = np.flatnonzero(ok)
    lay = placement[hp]
    # vectorized fills (placement layers are conflict-free by the masks)
    col_idx[ow[hp], lay, g_row[hp], o_lane[hp]] = g_lane[hp]
    wsel[ow[hp], lay, g_row[hp], g_lane[hp]] = place_src[hp]
    row_sel[ow[hp], lay, o_row[hp], o_lane[hp]] = g_row[hp]
    for k in range(K):
        w4[ow[hp], lay, k, o_row[hp], o_lane[hp]] = wcols[hp, k]

    l_max = max(1, int(layer_count.max()))
    plan = WindowPlan(
        n_win=n_win, kw=kw, l_max=l_max, n_src=S,
        linear_layout=int(ns["node_map"] == "linear"),
        n_win_src=(0 if num_nbr_nodes is None else n_win_src),
        base_win=base_win, own_local=own_local,
        layer_count=layer_count,
        layer_wins=layer_wins[:, :l_max],
        wsel=wsel[:, :l_max],
        col_idx=col_idx[:, :l_max],
        row_sel=row_sel[:, :l_max],
        w4=w4[:, :l_max],
        spill_a=np.zeros(0, np.int32), spill_b=np.zeros(0, np.int32),
        spill_w=np.zeros((0, 3)),
        num_half_edges=int(ok.sum()),
        num_spilled_edges=0)
    return plan, ok


def needed_kw(owner: np.ndarray, nbr: np.ndarray, anchor: np.ndarray,
              n_win_src: int) -> int:
    """The auto-kw heuristic factored out (same formula as the in-builder
    default): lets callers that build SEVERAL plans with one common
    neighborhood width (the sharded per-shard plans must share kernel
    shapes) size kw as the max of the per-plan needs."""
    if owner.shape[0]:
        span = np.abs(anchor[owner // WIN] - nbr // WIN)
        need = int(np.percentile(span, 99.5)) + 1
    else:
        need = 1
    return int(min(n_win_src, max(2, min(64, 2 * need + 1))))


def build_window_plan(lvl: MeshLevel, kw: int | None = None,
                      l_cap: int = 64,
                      node_map: str = "interleave") -> WindowPlan:
    """Flux plan: both halves of every internal edge (owner a with +w,
    owner b with -w, plus |w|), pair-spilled so a spilled edge leaves
    both accumulations to the segment path."""
    a = lvl.edge_a.astype(np.int64)
    b = lvl.edge_b.astype(np.int64)
    E = a.shape[0]
    owner = np.concatenate([a, b])
    nbr = np.concatenate([b, a])
    eid = np.concatenate([np.arange(E), np.arange(E)])
    sign = np.concatenate([np.ones(E), -np.ones(E)])
    ewt = np.sqrt((lvl.edge_w ** 2).sum(axis=1))
    wcols = np.concatenate([sign[:, None] * lvl.edge_w[eid],
                            ewt[eid][:, None]], axis=1)
    plan, ok = build_halfedge_plan(lvl.num_nodes, owner, nbr, wcols,
                                   pair_id=eid, kw=kw, l_cap=l_cap,
                                   node_map=node_map)
    spill = np.ones(E, bool)
    spill[eid[ok]] = False
    plan.spill_a = lvl.edge_a[spill].astype(np.int32)
    plan.spill_b = lvl.edge_b[spill].astype(np.int32)
    plan.spill_w = lvl.edge_w[spill]
    plan.num_spilled_edges = int(spill.sum())
    return plan


def reconstruct_half_edges(plan: WindowPlan):
    """Invert the plan back to (owner, nbr, w3) half-edge lists — the
    correctness oracle for tests. Inert (zero-weight) slots excluded."""
    if plan.linear_layout:
        local = lambda r, l: r * 128 + l           # noqa: E731
    else:
        local = lambda r, l: l * 8 + r             # noqa: E731
    outs = []
    for wv in range(plan.n_win):
        for layer in range(int(plan.layer_count[wv])):
            w = plan.w4[wv, layer]
            live = np.abs(w[:3]).sum(axis=0) > 0
            orr, oll = np.nonzero(live)
            for r, l in zip(orr, oll):
                gr = plan.row_sel[wv, layer, r, l]
                gl = plan.col_idx[wv, layer, gr, l]
                src = plan.wsel[wv, layer, gr, gl]
                gwin = plan.base_win[wv] + plan.layer_wins[wv, layer, src]
                owner = wv * WIN + local(r, l)
                nbrn = gwin * WIN + local(gr, gl)
                outs.append((owner, nbrn, w[0, r, l], w[1, r, l],
                             w[2, r, l]))
    return outs


def _composed_prolong_collapse(n, a2, b1, mapping, coincident,
                               dense_local, wsum, B1, num_coarse_pad):
    """The composed operator's half list: wavg directly from rc in ONE
    cross-space plan (build_prolong_window docstring); inv_wsum and the
    coincident select are folded into the half-edge weights."""
    inv = 1.0 / np.where(wsum > 0, wsum, 1.0)
    dense_w = np.where(coincident, 1.0, dense_local * inv)
    live_nb = B1 != 0.0          # B1 == 0 where coincident[a2]
    owner_c = np.concatenate([np.arange(n, dtype=np.int64),
                              a2[live_nb]])
    nbr_c = np.concatenate([mapping.astype(np.int64), b1[live_nb]])
    w_c = np.concatenate([dense_w, B1[live_nb] * inv[a2[live_nb]]])
    # COLLAPSE duplicate (fine, parent) pairs (round 4): under 8:1
    # coarsening many of a fine node's neighbors share a parent, so
    # the raw half list repeats pairs — each repeat costs a packed
    # slot, and prolong slots are the expensive kind (destination-
    # pinned packing: depth = max PAIR count per node). Summing the
    # weights at build time (fp64, exact) shrinks the half list and
    # the depth tail before packing ever sees them.
    key = owner_c * np.int64(num_coarse_pad) + nbr_c
    uniq, idx = np.unique(key, return_inverse=True)
    w_c = np.bincount(idx, weights=w_c)
    owner_c = (uniq // num_coarse_pad).astype(np.int64)
    nbr_c = (uniq % num_coarse_pad).astype(np.int64)
    return owner_c, nbr_c, w_c


def composed_prolong_halves(fine: MeshLevel, coarse: MeshLevel,
                            num_coarse_pad: int):
    """(owner_fine, nbr_coarse, weight) for the COMPOSED prolongation
    (wavg[i] = sum_j w_ij * rc[j]) in GLOBAL fine/raw-coarse node ids —
    the decomposition-agnostic form the sharded per-shard prolong plans
    pack (parallel/partition._attach_prolong_window). Same math as
    build_prolong_window's cplan branch (duplicate pairs collapsed)."""
    n = fine.num_nodes
    mapping = fine.mg_mapping
    assert mapping is not None and mapping.shape[0] == n
    coincident = np.all(fine.coords == coarse.coords[mapping], axis=1)
    a2 = fine.edge_a.astype(np.int64)
    b2 = fine.edge_b.astype(np.int64)
    a1 = mapping[a2]
    b1 = mapping[b2]

    def idist(p, q):
        d = p - q
        with np.errstate(divide="ignore"):
            out = 1.0 / np.sqrt((d * d).sum(axis=1))
        return np.nan_to_num(out, posinf=0.0, neginf=0.0)

    la = (~coincident[a2]).astype(np.float64)
    lb = (~coincident[b2]).astype(np.float64)
    A1 = la * idist(fine.coords[a2], coarse.coords[a1])
    B1 = la * idist(coarse.coords[b1], fine.coords[a2])
    BS = lb * (idist(fine.coords[b2], coarse.coords[b1])
               + idist(coarse.coords[a1], fine.coords[b2]))
    dense_local = np.zeros(n)
    np.add.at(dense_local, a2, A1)
    np.add.at(dense_local, b2, BS)
    wsum = dense_local.copy()
    np.add.at(wsum, a2, B1)
    return _composed_prolong_collapse(n, a2, b1, mapping, coincident,
                                      dense_local, wsum, B1,
                                      num_coarse_pad)


def build_prolong_window(fine: MeshLevel, coarse: MeshLevel,
                         l_cap: int = 64,
                         num_fine_pad: int | None = None,
                         node_map: str = "interleave",
                         num_coarse_pad: int | None = None) -> dict:
    """Windowed prolongation (mg_loops.cpp:678-864 live operator).

    With G[n] = rc[mapping[n]] (the parent gather of the coarse
    residual), every per-edge term of the reference's interpolation
    collapses to:

      into a2:  A1_e * G[a2] + B1_e * G[b2]     (A1 part NODE-LOCAL)
      into b2:  BS_e * G[b2]                    (entirely NODE-LOCAL —
                the reference's a1->b2 quirk reads rc[b1] = G[b2])

    so the only neighbor-coupled term is sum_e B1_e * G[b2] into a2 — a
    weighted neighbor sum, served by the windowed-gather kernel in wsum
    mode. A1/BS/weight sums are precomputed per-node dense constants.
    Spilled half-edges (window overflow) go to a small indexed stream.

    When `num_coarse_pad` is given, the WHOLE operator is instead
    COMPOSED into one cross-space wsum plan ("cplan") whose sources are
    the coarse residuals directly: substituting G[n] = rc[mapping[n]]
    into wavg = coincident ? G : inv_wsum * (dense_local * G + sum_e
    B1_e * G[b2]) gives, per fine node i,

      wavg[i] = w_dense_i * rc[m_i] + sum_e (B1_e * inv_wsum_i) * rc[b1_e]
      w_dense_i = coincident_i ? 1.0 : dense_local_i * inv_wsum_i

    — a plain weighted sum over coarse nodes. One kernel launch replaces
    the earlier two-kernel chain (parent-gather "pplan" + fine-space B1
    plan) and the materialized G intermediate; coarse sources are dense
    (~n_fine/8 nodes), so the composite packs no worse than the B1 plan.
    Coincident nodes reduce to the single weight-1.0 parent half (their
    B1 halves are identically zero and are dropped), so they reproduce
    G exactly up to inert zero-adds, preserving the verbatim-G contract.
    """
    n = fine.num_nodes
    mapping = fine.mg_mapping
    assert mapping is not None and mapping.shape[0] == n
    coincident = np.all(fine.coords == coarse.coords[mapping], axis=1)
    a2 = fine.edge_a.astype(np.int64)
    b2 = fine.edge_b.astype(np.int64)
    a1 = mapping[a2]
    b1 = mapping[b2]

    def idist(p, q):
        d = p - q
        with np.errstate(divide="ignore"):
            out = 1.0 / np.sqrt((d * d).sum(axis=1))
        return np.nan_to_num(out, posinf=0.0, neginf=0.0)

    la = (~coincident[a2]).astype(np.float64)
    lb = (~coincident[b2]).astype(np.float64)
    A1 = la * idist(fine.coords[a2], coarse.coords[a1])
    B1 = la * idist(coarse.coords[b1], fine.coords[a2])
    BS = lb * (idist(fine.coords[b2], coarse.coords[b1])
               + idist(coarse.coords[a1], fine.coords[b2]))

    dense_local = np.zeros(n)      # A1 into a2 + BS into b2 (x G[n])
    np.add.at(dense_local, a2, A1)
    np.add.at(dense_local, b2, BS)
    wsum = dense_local.copy()
    np.add.at(wsum, a2, B1)

    if num_coarse_pad is not None:
        owner_c, nbr_c, w_c = _composed_prolong_collapse(
            n, a2, b1, mapping, coincident, dense_local, wsum, B1,
            num_coarse_pad)
        cplan, cok = build_halfedge_plan(
            num_fine_pad or n, owner_c, nbr_c, w_c[:, None], l_cap=l_cap,
            num_nbr_nodes=num_coarse_pad, node_map=node_map)
        csp = ~cok
        return {"cplan": cplan, "coincident": coincident,
                "cspill_fine": owner_c[csp].astype(np.int32),
                "cspill_coarse": nbr_c[csp].astype(np.int32),
                "cspill_w": w_c[csp]}

    # S=8 like the flux plan: an S=4 wsum plan (27.2 layers vs 21.0)
    # measured NO faster on-chip — the per-layer cost is dominated by
    # channel-independent layer overhead, so fewer layers wins
    plan, ok = build_halfedge_plan(num_fine_pad or n, a2, b2,
                                   B1[:, None], l_cap=l_cap,
                                   node_map=node_map)
    sp = ~ok
    return {"plan": plan,
            "dense_local": dense_local, "wsum": wsum,
            "coincident": coincident,
            "parent": mapping.astype(np.int32),
            "spill_a2": a2[sp].astype(np.int32),
            "spill_b2": b2[sp].astype(np.int32),
            "spill_B1": B1[sp]}


# --------------------------------------------------------------------------
# plan caching: the greedy packer is pure-host preprocessing (~20 s per
# flagship-scale level); like the reference's binary mesh cache
# (io_enhanced.cpp:203-405), plans are content-addressed npz snapshots —
# corrupt or stale files silently rebuild.
# --------------------------------------------------------------------------

_PLAN_FIELDS = ["base_win", "own_local", "layer_count", "layer_wins",
                "wsel", "col_idx", "row_sel", "w4", "spill_a", "spill_b",
                "spill_w"]
_PLAN_SCALARS = ["n_win", "kw", "l_max", "n_src", "num_half_edges",
                 "num_spilled_edges", "n_win_src", "linear_layout"]


# bump when the packer's layout/heuristics change: the content key
# includes it so stale cached plans are rebuilt, not silently reused
# (v4: position-keyed source selection, S=8; v5: prolong dict carries
# the cross-space parent-gather plan; v6: the prolong operator is
# COMPOSED into one coarse-sourced plan — pplan and the fine-space B1
# plan are gone from the cross-space dict)
PLAN_FORMAT_VERSION = 6


def _content_key(arrays) -> str:
    import hashlib
    h = hashlib.sha1()
    h.update(str(PLAN_FORMAT_VERSION).encode())
    for a in arrays:
        a = np.ascontiguousarray(a)
        h.update(str(a.dtype).encode())
        h.update(str(a.shape).encode())
        h.update(a.tobytes())
    return h.hexdigest()[:20]


def cached_plan(cache_dir: str, kind: str, key_arrays, build):
    """build() -> WindowPlan | dict of arrays+WindowPlan. Content-keyed
    npz cache; any load failure falls back to a rebuild (same contract
    as mesh/cache.py)."""
    import os
    if not cache_dir:
        return build()
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir,
                        f"{kind}-{_content_key(key_arrays)}.npz")
    if os.path.exists(path):
        try:
            with np.load(path, allow_pickle=False) as z:
                return _unpack_plan_npz(dict(z.items()))
        except Exception:
            pass
    obj = build()
    flat = _pack_plan_npz(obj)
    tmp = path + ".tmp.npz"       # .npz suffix: savez must not append
    np.savez(tmp, **flat)
    os.replace(tmp, path)
    return obj


def _pack_plan_npz(obj) -> dict:
    if isinstance(obj, WindowPlan):
        out = {f: getattr(obj, f) for f in _PLAN_FIELDS}
        out.update({f: np.asarray(getattr(obj, f))
                    for f in _PLAN_SCALARS})
        out["__kind__"] = np.asarray("plan")
        return out
    out = {"__kind__": np.asarray("dict")}
    for k, v in obj.items():
        if isinstance(v, WindowPlan):
            for kk, vv in _pack_plan_npz(v).items():
                if kk != "__kind__":
                    out[f"plan.{k}.{kk}"] = vv
            out[f"__plan__.{k}"] = np.asarray(1)
        else:
            out[f"val.{k}"] = np.asarray(v)
    return out


def _unpack_plan_npz(flat):
    kind = str(flat.pop("__kind__"))
    def mk_plan(d):
        kw = {f: d[f] for f in _PLAN_FIELDS}
        kw.update({f: int(d[f]) for f in _PLAN_SCALARS})
        return WindowPlan(**kw)
    if kind == "plan":
        return mk_plan(flat)
    out = {}
    plans = [k.split(".", 1)[1] for k in flat if k.startswith("__plan__.")]
    for name in plans:
        sub = {k.split(".", 2)[2]: v for k, v in flat.items()
               if k.startswith(f"plan.{name}.")}
        out[name] = mk_plan(sub)
    for k, v in flat.items():
        if k.startswith("val."):
            out[k[4:]] = v
    return out


def build_restrict_window(mapping: np.ndarray, num_fine: int,
                          num_coarse: int, l_cap: int = 64,
                          num_fine_pad: int | None = None,
                          num_coarse_pad: int | None = None,
                          node_map: str = "interleave") -> dict:
    """Windowed restriction (mg_loops.cpp:30-202 semantics): each coarse
    OWNER gathers its fine children with weight 1/count — the segment
    mean directly, cross-space (num_nbr_nodes = fine). Unmapped coarse
    nodes keep their old value (the caller applies `mapped`).

    num_fine_pad/num_coarse_pad: build the plan directly in LANE-PADDED
    node spaces (solver num_lanes) so the kernel reads/writes the padded
    state arrays with no per-call relayout — pad lanes are unmapped /
    childless and inert."""
    nfp = num_fine_pad or num_fine
    ncp = num_coarse_pad or num_coarse
    counts = np.bincount(mapping, minlength=ncp)
    w = (1.0 / np.maximum(counts, 1))[mapping]
    owner = mapping.astype(np.int64)
    nbr = np.arange(num_fine, dtype=np.int64)
    plan, ok = build_halfedge_plan(ncp, owner, nbr, w[:, None],
                                   l_cap=l_cap, num_nbr_nodes=nfp,
                                   node_map=node_map)
    sp = ~ok
    return {"plan": plan, "mapped": counts > 0,
            "spill_fine": nbr[sp].astype(np.int32),
            "spill_coarse": owner[sp].astype(np.int32),
            "spill_w": w[sp]}
