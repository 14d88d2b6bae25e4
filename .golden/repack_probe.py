"""Probe: how much bucket-DP cost can per-window repacking recover on
the tet-flagship flux plan?

The packer's constraints (slot/cell/pos/val/winset) are all keyed by
owner window, so each window's layer structure can be re-derived
independently. Baseline greedy first-fit (round-robin by owner rank) is
~12% over the max-degree bound on samples; after depth-bucketing the
dispatch cost is sum_b(n_b * l_max_b), so flattening the deepest
windows in each bucket pays directly.

CPU-only (host-side packing study; no TPU contention).
"""
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from mgcfd_tpu.prep.renumber import tile_interleave_levels
from mgcfd_tpu.prep.window import WIN, build_window_plan
from mgcfd_tpu.pallas.flux_window import _depth_buckets

S = 8
L_CAP = 64


def halves_for_level(lvl):
    a = lvl.edge_a.astype(np.int64)
    b = lvl.edge_b.astype(np.int64)
    owner = np.concatenate([a, b])
    nbr = np.concatenate([b, a])
    return owner, nbr


def window_inputs(owner, nbr, n, kw=None):
    """Reproduce build_halfedge_plan's per-half keys (linear node map)."""
    n_win = -(-n // WIN)
    ow = owner // WIN
    gw = nbr // WIN
    anchor = np.arange(n_win)
    if kw is None:
        span = np.abs(anchor[ow] - gw)
        need = int(np.percentile(span, 99.5)) + 1
        kw = int(min(n_win, max(2, min(64, 2 * need + 1))))
    base_win = np.clip(anchor - (kw - 1) // 2, 0,
                       max(0, n_win - kw)).astype(np.int32)
    lw = gw - base_win[ow]
    in_range = (lw >= 0) & (lw < kw)
    o_local = owner - ow * WIN
    g_local = nbr - gw * WIN
    o_row = ((o_local >> 7) & 7).astype(np.int64)
    o_lane = (o_local & 127).astype(np.int64)
    g_row = ((g_local >> 7) & 7).astype(np.int64)
    g_lane = (g_local & 127).astype(np.int64)
    return ow, lw, o_row, o_lane, g_row, g_lane, in_range, kw, n_win


def pack_window(keys, order):
    """First-fit pack one window's halves in the given order.
    keys = (lw, orow, olane, grow, glane) arrays over the window's
    halves. Returns (layers_used, placement array)."""
    lw, orr, oll, grr, gll = keys
    slot = {}
    cell = {}
    pos = {}
    val = {}
    pos_lw = {}
    winset = {}
    winslot = {}
    nsrc = []
    spare = 0
    nlayers = 0
    placement = np.full(lw.shape[0], -1, np.int32)
    for h in order:
        lwv = lw[h]
        sk = orr[h] * 128 + oll[h]
        ck = grr[h] * 128 + oll[h]
        pk = grr[h] * 128 + gll[h]
        vk = (ck << 14) | (int(lwv) << 7) | int(gll[h])
        plk = (pk << 7) | int(lwv)
        have = winset.get(lwv, 0)
        free = ~slot.get(sk, 0) & (have | spare)
        cand = free & (~cell.get(ck, 0) | val.get(vk, 0))
        cand &= ~pos.get(pk, 0) | pos_lw.get(plk, 0)
        if cand:
            layer = (cand & -cand).bit_length() - 1
        else:
            layer = nlayers
            if layer >= L_CAP:
                raise RuntimeError("l_cap hit in repack")
            nlayers += 1
            nsrc.append(0)
            spare |= 1 << layer
        bit = 1 << layer
        src = winslot.get((layer, lwv))
        if src is None:
            src = nsrc[layer]
            winslot[(layer, lwv)] = src
            nsrc[layer] = src + 1
            winset[lwv] = winset.get(lwv, 0) | bit
            if src + 1 == S:
                spare &= ~bit
        slot[sk] = slot.get(sk, 0) | bit
        cell[ck] = cell.get(ck, 0) | bit
        pos[pk] = pos.get(pk, 0) | bit
        val[vk] = val.get(vk, 0) | bit
        pos_lw[plk] = pos_lw.get(plk, 0) | bit
        placement[h] = layer
    return nlayers, placement


def bucket_cost(layer_count):
    _, buckets = _depth_buckets(np.asarray(layer_count))
    return sum(nb * lm for _, nb, lm in buckets) + 0, buckets


def main():
    mesh = pickle.load(open("/root/repo/.golden/benchtet/mesh.pkl", "rb"))
    levels, _ = tile_interleave_levels(mesh.levels)
    lvl = levels[0]
    n = lvl.num_nodes
    print(f"L0: {n} nodes, {lvl.num_internal_edges} edges")

    t0 = time.time()
    plan = build_window_plan(lvl, node_map="linear")
    print(f"baseline plan built {time.time()-t0:.1f}s "
          f"(native packer); spilled={plan.num_spilled_edges}")
    lc0 = plan.layer_count.astype(int)
    cost0, buckets0 = bucket_cost(lc0)
    print(f"baseline: layers mean {lc0.mean():.1f} max {lc0.max()}, "
          f"bucket cost {cost0} buckets {buckets0}")

    owner, nbr = halves_for_level(lvl)
    ow, lw, orr, oll, grr, gll, ok, kw, n_win = window_inputs(
        owner, nbr, n)
    print(f"kw={kw} n_win={n_win} in_range={ok.mean():.4f}")

    # per-window structural lower bounds
    slot_key = ow * WIN + orr * 128 + oll
    _, slot_mult = np.unique(slot_key[ok], return_counts=True)
    slot_owner_win = np.unique(slot_key[ok])[0:0]  # placeholder
    # max slot multiplicity per window
    uk, cnts = np.unique(slot_key[ok], return_counts=True)
    slot_lb = np.zeros(n_win, int)
    np.maximum.at(slot_lb, uk // WIN, cnts)
    halves_per_win = np.bincount(ow[ok], minlength=n_win)
    cap_lb = -(-halves_per_win // WIN)
    lb = np.maximum(slot_lb, cap_lb)
    cost_lb, buckets_lb = bucket_cost(lb)
    print(f"lower bound: layers mean {lb.mean():.1f} max {lb.max()}, "
          f"bucket cost {cost_lb} ({cost_lb/cost0:.2%} of baseline)")

    # group halves by window, in the baseline global order
    so = np.argsort(owner, kind="stable")
    Hn = owner.shape[0]
    starts = np.flatnonzero(np.concatenate([[True],
                                            np.diff(owner[so]) != 0]))
    lens = np.diff(np.concatenate([starts, [Hn]]))
    rank = np.empty(Hn, np.int64)
    rank[so] = np.arange(Hn) - np.repeat(starts, lens)

    per_win = {}
    idx_ok = np.flatnonzero(ok)
    order_key = np.lexsort((lw[idx_ok], rank[idx_ok]))
    for wv in range(n_win):
        per_win[wv] = idx_ok[ow[idx_ok] == wv]

    def win_keys(hids):
        return (lw[hids], orr[hids], oll[hids], grr[hids], gll[hids])

    # verify the per-window packer reproduces the baseline on a sample
    rng = np.random.default_rng(0)
    sample = rng.choice(n_win, size=6, replace=False)
    for wv in sample:
        hids = per_win[wv]
        o = np.lexsort((lw[hids], rank[hids]))
        nl, _ = pack_window(win_keys(hids), o)
        print(f"  verify win {wv}: repro {nl} vs baseline {lc0[wv]} "
              f"(lb {lb[wv]}, halves {hids.shape[0]})")

    # iterated-greedy repack of the deepest windows
    deep = np.argsort(lc0)[::-1][:60]
    t0 = time.time()
    improved = lc0.copy()
    for wv in deep:
        hids = per_win[wv]
        keys = win_keys(hids)
        base_order = np.lexsort((lw[hids], rank[hids]))
        best_nl, best_pl = pack_window(keys, base_order)
        # strategy A: slot-degree-desc round robin
        skey = orr[hids] * 128 + oll[hids]
        _, inv, scnt = np.unique(skey, return_inverse=True,
                                 return_counts=True)
        deg = scnt[inv]
        oA = np.lexsort((lw[hids], rank[hids], -deg))
        nl, pl = pack_window(keys, oA)
        if nl < best_nl:
            best_nl, best_pl = nl, pl
        # strategy B: iterated greedy, 8 rounds
        cur = best_pl.copy()
        cur_nl = best_nl
        for it in range(8):
            top = cur == cur.max()
            o = np.concatenate([np.flatnonzero(top),
                                np.flatnonzero(~top)[
                np.argsort(cur[~top], kind="stable")]])
            nl, pl = pack_window(keys, o)
            if nl < cur_nl:
                cur_nl, cur = nl, pl
            else:
                break
        if cur_nl < best_nl:
            best_nl = cur_nl
        improved[wv] = best_nl
    cost1, buckets1 = bucket_cost(improved)
    print(f"repacked deepest 60: {time.time()-t0:.1f}s  "
          f"cost {cost0} -> {cost1} ({1-cost1/cost0:.2%} saved)  "
          f"buckets {buckets1}")
    deltas = lc0[deep] - improved[deep]
    print(f"  per-window layer deltas: mean {deltas.mean():.2f} "
          f"max {deltas.max()} nonzero {np.count_nonzero(deltas)}/60")


if __name__ == "__main__":
    main()
