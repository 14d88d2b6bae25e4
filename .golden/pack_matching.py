"""Layer-by-layer maximal-matching packer prototype vs greedy first-fit.

Per owner window (windows are independent), build layers one at a time:
scan unplaced halves in most-constrained-first order (remaining owner
degree desc) and admit a half iff its owner slot and cell are free in
this layer (or the cell holds the exact same (window, lane) value) and
the layer's source-window set has room (<=S distinct lw, preferring
halves whose lw is already in the set via a two-sweep scan).

Runs on a sample of windows of the tet fine level and reports layers
vs the greedy packer's count and the structural bound.

PYTHONPATH=/root/repo:/root/.axon_site python .golden/pack_matching.py [n_sample]
"""
import pickle
import sys
import time

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

from mgcfd_tpu.prep.window import WIN, build_window_plan

S = 4


def pack_window_matching(o_slot, cell, lw, val, deg):
    """o_slot: owner local id (0..1023); cell: (g_row*128+o_lane);
    lw: local window; val: exact dedup key; deg: owner degree per half
    (owner's total). Returns layer count."""
    H = o_slot.shape[0]
    remaining = np.ones(H, bool)
    # per-half remaining-degree of its owner, updated as halves place
    own_remaining = np.bincount(o_slot, minlength=WIN)
    layers = 0
    idx_all = np.arange(H)
    while remaining.any():
        live = idx_all[remaining]
        # most-constrained first: owner remaining degree desc
        order = live[np.argsort(-own_remaining[o_slot[live]],
                                kind="stable")]
        slot_used = np.zeros(WIN, bool)
        cell_val = {}
        win_set = []
        placed_now = []
        deferred = []
        for h in order:
            if slot_used[o_slot[h]]:
                continue
            cv = cell_val.get(cell[h])
            if cv is not None and cv != val[h]:
                continue
            if lw[h] not in win_set:
                if len(win_set) >= S:
                    deferred.append(h)
                    continue
            placed_now.append(h)
            slot_used[o_slot[h]] = True
            if cv is None:
                cell_val[cell[h]] = val[h]
            if lw[h] not in win_set:
                win_set.append(lw[h])
        # second sweep: deferred halves whose window joined the set later
        for h in deferred:
            if lw[h] in win_set and not slot_used[o_slot[h]]:
                cv = cell_val.get(cell[h])
                if cv is not None and cv != val[h]:
                    continue
                placed_now.append(h)
                slot_used[o_slot[h]] = True
                if cv is None:
                    cell_val[cell[h]] = val[h]
        if not placed_now:
            raise RuntimeError("no progress")
        placed_now = np.asarray(placed_now)
        remaining[placed_now] = False
        np.subtract.at(own_remaining, o_slot[placed_now], 1)
        layers += 1
    return layers


def main():
    n_sample = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mesh = pickle.load(open(".golden/benchtet/mesh.pkl", "rb"))
    lvl = mesh.levels[0]
    plan = build_window_plan(lvl)

    a = np.asarray(lvl.edge_a, np.int64)
    b = np.asarray(lvl.edge_b, np.int64)
    owner = np.concatenate([a, b])
    nbr = np.concatenate([b, a])
    ow = owner // WIN
    gw = nbr // WIN
    base = plan.base_win.astype(np.int64)
    lw = gw - base[ow]
    in_range = (lw >= 0) & (lw < plan.kw)

    o_local = owner - ow * WIN
    g_local = nbr - gw * WIN
    g_row = g_local & 7
    g_lane = (g_local >> 3) & 127
    o_lane = (o_local >> 3) & 127
    cell = g_row * 128 + o_lane
    val = lw * 1024 + g_row * 128 + g_lane

    rng = np.random.default_rng(0)
    wins = rng.choice(plan.n_win, size=min(n_sample, plan.n_win),
                      replace=False)
    tot_old = tot_new = tot_bound = 0
    for wv in wins:
        m = in_range & (ow == wv)
        t0 = time.time()
        L = pack_window_matching(o_local[m].astype(np.int64),
                                 cell[m], lw[m], val[m], None)
        bound = np.bincount(o_local[m], minlength=WIN).max()
        old = int(plan.layer_count[wv])
        tot_old += old; tot_new += L; tot_bound += bound
        print(f"win {wv:4d}: halves {int(m.sum()):6d} greedy {old:3d} "
              f"matching {L:3d} bound {int(bound):3d} "
              f"({time.time()-t0:.1f}s)")
    print(f"TOTAL sample: greedy {tot_old} matching {tot_new} "
          f"bound {tot_bound} -> ratio {tot_old/max(tot_new,1):.2f}x")


if __name__ == "__main__":
    main()
