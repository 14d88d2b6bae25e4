"""Why does each layer close? Count, per layer, halves rejected by
slot / cell / winset in the matching packer's first sweep, plus layers
with free slots remaining. Also try S=8 and smarter window selection
(degree-weighted top-S pick per layer).

PYTHONPATH=/root/repo:/root/.axon_site python .golden/pack_diag.py
"""
import pickle
import sys

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

from mgcfd_tpu.prep.window import WIN, build_window_plan


def pack_window(o_slot, cell, lw, val, S, pick_windows=None):
    H = o_slot.shape[0]
    remaining = np.ones(H, bool)
    own_remaining = np.bincount(o_slot, minlength=WIN)
    layers = 0
    idx_all = np.arange(H)
    rej = np.zeros(3, np.int64)  # slot, cell, winset
    while remaining.any():
        live = idx_all[remaining]
        order = live[np.argsort(-own_remaining[o_slot[live]],
                                kind="stable")]
        if pick_windows == "weighted":
            # degree-weighted top-S window pick
            w = own_remaining[o_slot[live]].astype(np.float64)
            hist = np.bincount(lw[live], weights=w)
            win_set = list(np.argsort(-hist)[:S])
            win_locked = True
        else:
            win_set = []
            win_locked = False
        slot_used = np.zeros(WIN, bool)
        cell_val = {}
        placed_now = []
        deferred = []
        for h in order:
            if slot_used[o_slot[h]]:
                rej[0] += 1
                continue
            cv = cell_val.get(cell[h])
            if cv is not None and cv != val[h]:
                rej[1] += 1
                continue
            if lw[h] not in win_set:
                if win_locked or len(win_set) >= S:
                    rej[2] += 1
                    deferred.append(h)
                    continue
                win_set.append(lw[h])
            placed_now.append(h)
            slot_used[o_slot[h]] = True
            if cv is None:
                cell_val[cell[h]] = val[h]
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
            raise RuntimeError("stall")
        placed_now = np.asarray(placed_now)
        remaining[placed_now] = False
        np.subtract.at(own_remaining, o_slot[placed_now], 1)
        layers += 1
    return layers, rej


def main():
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
    wins = rng.choice(plan.n_win, size=8, replace=False)
    for label, S, pw in (("S=4", 4, None), ("S=8", 8, None),
                         ("S=4 weighted", 4, "weighted"),
                         ("S=6", 6, None)):
        tot = 0
        totrej = np.zeros(3, np.int64)
        for wv in wins:
            m = in_range & (ow == wv)
            L, rej = pack_window(o_local[m].astype(np.int64), cell[m],
                                 lw[m], val[m], S, pw)
            tot += L
            totrej += rej
        print(f"{label:14s} layers {tot:4d} (greedy "
              f"{int(plan.layer_count[wins].sum())}, bound 180)  "
              f"rejects slot/cell/winset {totrej.tolist()}")


if __name__ == "__main__":
    main()


def pack_window_possel(o_slot, cell, lw, g_pos, val, S):
    """Select-first variant: per layer, each table POSITION (g_row,
    g_lane) is served by exactly one source window (wsel keyed by
    position, enabling 2 gathers + S selects per channel per layer);
    still <=S distinct windows per layer."""
    H = o_slot.shape[0]
    remaining = np.ones(H, bool)
    own_remaining = np.bincount(o_slot, minlength=WIN)
    layers = 0
    idx_all = np.arange(H)
    rej = np.zeros(4, np.int64)  # slot, cell, winset, pos
    while remaining.any():
        live = idx_all[remaining]
        order = live[np.argsort(-own_remaining[o_slot[live]],
                                kind="stable")]
        slot_used = np.zeros(WIN, bool)
        cell_val = {}
        pos_win = {}
        win_set = []
        placed_now = []
        deferred = []

        def try_place(h, allow_new_win):
            cv = cell_val.get(cell[h])
            if cv is not None and cv != val[h]:
                rej[1] += 1
                return False
            pw = pos_win.get(g_pos[h])
            if pw is not None and pw != lw[h]:
                rej[3] += 1
                return False
            if lw[h] not in win_set:
                if not allow_new_win or len(win_set) >= S:
                    rej[2] += 1
                    return None  # defer
                win_set.append(lw[h])
            placed_now.append(h)
            slot_used[o_slot[h]] = True
            if cv is None:
                cell_val[cell[h]] = val[h]
            if pw is None:
                pos_win[g_pos[h]] = lw[h]
            return True

        for h in order:
            if slot_used[o_slot[h]]:
                rej[0] += 1
                continue
            if try_place(h, True) is None:
                deferred.append(h)
        for h in deferred:
            if lw[h] in win_set and not slot_used[o_slot[h]]:
                try_place(h, False)
        if not placed_now:
            raise RuntimeError("stall")
        placed_now = np.asarray(placed_now)
        remaining[placed_now] = False
        np.subtract.at(own_remaining, o_slot[placed_now], 1)
        layers += 1
    return layers, rej


def main2():
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
    g_pos = g_row * 128 + g_lane
    val = lw * 1024 + g_row * 128 + g_lane
    rng = np.random.default_rng(0)
    wins = rng.choice(plan.n_win, size=8, replace=False)
    for label, S in (("possel S=4", 4), ("possel S=6", 6),
                     ("possel S=8", 8), ("possel S=12", 12)):
        tot = 0
        totrej = np.zeros(4, np.int64)
        for wv in wins:
            m = in_range & (ow == wv)
            L, rej = pack_window_possel(o_local[m].astype(np.int64),
                                        cell[m], lw[m], g_pos[m],
                                        val[m], S)
            tot += L
            totrej += rej
        print(f"{label:12s} layers {tot:4d} (greedy "
              f"{int(plan.layer_count[wins].sum())}, bound 180)  "
              f"rejects slot/cell/winset/pos {totrej.tolist()}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "possel":
        main2()


def pack_window_ff_possel(o_slot, cell, lw, g_pos, val, S, l_cap=64):
    """Production-style first-fit greedy (round-robin owner rank order,
    per-key layer bitmasks) with the POSITION-keyed source constraint."""
    H = o_slot.shape[0]
    own = o_slot
    deg = np.bincount(own, minlength=WIN)
    so = np.argsort(own, kind="stable")
    starts = np.flatnonzero(np.concatenate([[True],
                                            np.diff(own[so]) != 0]))
    lens = np.diff(np.concatenate([starts, [H]]))
    rank = np.empty(H, np.int64)
    rank[so] = np.arange(H) - np.repeat(starts, lens)
    order = np.lexsort((lw, rank))

    lc = 0
    slot_mask = [0] * WIN
    cell_val_mask = {}
    cell_mask = [0] * 1024
    pos_mask = [0] * 1024
    pos_lw_mask = {}
    winset_mask = {}
    nsrc = {}
    spare = 0
    placed = 0
    for h in order.tolist():
        sk = own[h]; ck = cell[h]; pk = g_pos[h]
        vk = val[h]; lwv = lw[h]
        have_win = winset_mask.get(lwv, 0)
        free = ~slot_mask[sk] & (have_win | spare)
        cand = free & (~cell_mask[ck] | cell_val_mask.get((ck, vk), 0))
        cand &= (~pos_mask[pk] | pos_lw_mask.get((pk, lwv), 0))
        if cand:
            layer = (cand & -cand).bit_length() - 1
        else:
            layer = lc
            if layer >= l_cap:
                continue
            lc += 1
            spare |= 1 << layer
        bit = 1 << layer
        if not (winset_mask.get(lwv, 0) & bit):
            n = nsrc.get(layer, 0)
            winset_mask[lwv] = winset_mask.get(lwv, 0) | bit
            nsrc[layer] = n + 1
            if n + 1 == S:
                spare &= ~bit
        slot_mask[sk] |= bit
        cell_mask[ck] |= bit
        cell_val_mask[(ck, vk)] = cell_val_mask.get((ck, vk), 0) | bit
        pos_mask[pk] |= bit
        pos_lw_mask[(pk, lwv)] = pos_lw_mask.get((pk, lwv), 0) | bit
        placed += 1
    return lc, placed


def main3():
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
    g_pos = g_row * 128 + g_lane
    val = lw * 1024 + g_row * 128 + g_lane
    rng = np.random.default_rng(0)
    wins = rng.choice(plan.n_win, size=8, replace=False)
    for S in (4, 6, 8):
        tot = totp = toth = 0
        for wv in wins:
            m = in_range & (ow == wv)
            L, placed = pack_window_ff_possel(
                o_local[m].astype(np.int64), cell[m], lw[m], g_pos[m],
                val[m], S)
            tot += L; totp += placed; toth += int(m.sum())
        print(f"firstfit possel S={S}: layers {tot:4d} (greedy "
              f"{int(plan.layer_count[wins].sum())}, bound 180)  "
              f"placed {totp}/{toth}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "ffpossel":
        main3()
