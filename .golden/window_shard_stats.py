"""Flagship-scale per-shard window-plan statistics (SCALING.md table).

Partitions the flagship box hierarchy (68x64x70 L4) and the tet
hierarchy's finest level with the window-mode partitioner and prints the
per-shard plan stats (coverage, layers, kw, halo pool size).
"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import copy
import pickle
import numpy as np
from mgcfd_tpu.bench.flagship import FlagshipSpec, flagship_mesh
from mgcfd_tpu.mesh.build import apply_ewt_conditioning
from mgcfd_tpu.parallel import partition_mesh


def report(name, mesh, P=8):
    cm = copy.deepcopy(mesh)
    apply_ewt_conditioning(cm.levels, cm.variant)
    sm = partition_mesh(cm, P, use_window=True,
                        plan_cache_dir=".golden/shardplans")
    sd = sm.level0
    lvl0 = mesh.levels[0]
    print(f"\n== {name}: {lvl0.num_nodes} nodes, "
          f"{lvl0.num_internal_edges} edges, P={P}, "
          f"block={sd.block} ({sd.block // 1024} windows), "
          f"smax={sd.smax}, pool={P * sd.smax} "
          f"({-(-(P * sd.smax) // 1024)} windows)")
    print(f"{'shard':>5} {'halves':>9} {'spill':>7} {'cov%':>6} "
          f"{'Lmax':>5} {'Lmean':>6} {'fill':>5} {'kw':>4}")
    for st in sd.win_stats:
        print(f"{st['shard']:>5} {st['halves']:>9} "
              f"{st['spilled_halves']:>7} {100 * st['coverage']:>5.1f}% "
              f"{st['layers_max']:>5} {st['layers_mean']:>6.1f} "
              f"{st['slot_fill']:>5.2f} {st['kw']:>4}")
    tot = sum(st['halves'] for st in sd.win_stats)
    sp = sum(st['spilled_halves'] for st in sd.win_stats)
    print(f"total halves {tot}, spilled {sp} "
          f"({100.0 * sp / max(1, tot + sp):.2f}%), "
          f"halo all_gather/eval = "
          f"{P * sd.smax * 5 * 4 / 1024:.0f} KB fp32")


report("box flagship 68x64x70 L4", flagship_mesh(FlagshipSpec()))
tet = pickle.load(open(".golden/benchtet/mesh.pkl", "rb"))
report("tet flagship 68x64x70 L4", tet)
