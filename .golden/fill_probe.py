"""Where does the tet window plan lose slot fill?

Per window, layers are lower-bounded by
  (a) slot bound: max degree over its 1024 owner nodes;
  (b) cell bound: max over (g_row, o_lane) cells of the number of
      DISTINCT (src window, g_lane) values demanded (shared-ci chain:
      one value per cell per layer; val_mask shares exact duplicates).
Reports both vs the achieved layer_count, and what the cell bound
becomes if a layer could hold S distinct values per cell (per-slot
source select).

PYTHONPATH=/root/repo:/root/.axon_site python .golden/fill_probe.py
"""
import pickle
from collections import defaultdict

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")

from mgcfd_tpu.prep.window import build_window_plan, WIN


def main():
    mesh = pickle.load(open(".golden/benchtet/mesh.pkl", "rb"))
    lvl = mesh.levels[0]
    plan = build_window_plan(lvl)
    n = lvl.num_nodes
    n_win = plan.n_win
    S = plan.n_src

    a = np.asarray(lvl.edge_a, np.int64)
    b = np.asarray(lvl.edge_b, np.int64)
    owner = np.concatenate([a, b])
    nbr = np.concatenate([b, a])

    # replicate the builder's geometry
    ow = owner // WIN
    gw = nbr // WIN
    base = plan.base_win.astype(np.int64)
    lw = gw - base[ow]
    in_range = (lw >= 0) & (lw < plan.kw)

    o_local = owner - ow * WIN
    o_lane = (o_local >> 3) & 127
    g_local = nbr - gw * WIN
    g_row = g_local & 7
    g_lane = (g_local >> 3) & 127

    # (a) slot bound: degree per owner node (placed halves only)
    deg = np.bincount(owner[in_range], minlength=n)
    degp = np.concatenate([deg, np.zeros(n_win * WIN - n, deg.dtype)])
    slot_bound = degp.reshape(n_win, WIN).max(axis=1)

    # (b) cell bound: distinct (lw, g_lane) per (ow, g_row, o_lane)
    cell_key = (ow * 1024 + g_row * 128 + o_lane)[in_range]
    val = (lw[in_range] * 128 + g_lane[in_range])
    pairs = np.unique(np.stack([cell_key, val]), axis=1)
    counts = np.bincount(pairs[0], minlength=n_win * 1024)
    cell_distinct = counts.reshape(n_win, 1024)
    cell_bound = cell_distinct.max(axis=1)
    cell_bound_S = np.ceil(cell_distinct / S).max(axis=1)

    lc = plan.layer_count.astype(np.int64)
    lower = np.maximum(slot_bound, cell_bound)
    lower_S = np.maximum(slot_bound, cell_bound_S)
    print(f"windows {n_win}  kw {plan.kw}  l_max {plan.l_max}  "
          f"halves {plan.num_half_edges}  spilled {plan.num_spilled_edges}")
    print(f"slot fill {plan.slot_fill:.3f}")
    for name, v in (("slot bound (max degree)", slot_bound),
                    ("cell bound (shared sel)", cell_bound),
                    ("cell bound (per-slot sel /S)", cell_bound_S),
                    ("combined lower bound", lower),
                    ("combined lower bound w/ /S", lower_S),
                    ("ACTUAL layer_count", lc)):
        print(f"{name:32s} mean {v.mean():6.2f}  p90 "
              f"{np.percentile(v, 90):6.1f}  max {float(v.max()):4.0f}")
    print(f"greedy overhead vs today's bound: "
          f"{lc.mean() / max(lower.mean(), 1e-9):.2f}x")
    print(f"potential layers if per-slot sel & perfect pack: "
          f"{lower_S.mean():.2f} (vs {lc.mean():.2f} now -> "
          f"{lc.mean() / max(lower_S.mean(), 1e-9):.2f}x fewer)")


if __name__ == "__main__":
    main()
