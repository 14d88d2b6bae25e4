"""P-sweep of the sharded window production path on a virtual CPU mesh
(VERDICT r03 #4): per-P plan statistics + COMPILED collective bytes per
cycle, extracted from the sharded step's optimized HLO (the program
that would run on a real v5e pod slice — the collective schedule is
identical; only the transport differs).

Usage (one P per process; the device count must be set before jax
imports):
  for P in 2 4 8 16; do
    XLA_FLAGS=--xla_force_host_platform_device_count=$P \
      python .golden/p_sweep.py $P [tet] >> .golden/p_sweep.jsonl
  done
"""
import json
import os
import re
import sys

P = int(sys.argv[1])
TET = "tet" in sys.argv[2:]
TWO_D = "2d" in sys.argv[2:]
os.environ.setdefault("XLA_FLAGS",
                      f"--xla_force_host_platform_device_count={P}")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from mgcfd_tpu.core.config import SolverConfig          # noqa: E402
from mgcfd_tpu.parallel import ShardedSolver            # noqa: E402

if TET:
    from mgcfd_tpu.mesh.unstructured import \
        generate_unstructured_hierarchy                  # noqa: E402
    from mgcfd_tpu.prep.renumber import renumber_hierarchy  # noqa: E402
    import pickle
    cache = ".golden/benchtet/mesh.pkl"
    if os.path.exists(cache):
        mesh = pickle.load(open(cache, "rb"))
    else:
        mesh = renumber_hierarchy(
            generate_unstructured_hierarchy(68, 64, 70, 4, seed=1))
else:
    from mgcfd_tpu.bench import flagship_mesh            # noqa: E402
    mesh = flagship_mesh()

sh = ShardedSolver(mesh, SolverConfig(
    dtype="float32", accumulate="window", include_indirect_rw=False,
    num_partitions=P, partition_2d="auto" if TWO_D else "",
    plan_cache_dir=f".golden/psweep/{'tet' if TET else 'box'}"))
sd = sh.smesh.level0

# collective bytes per cycle from the compiled step HLO
txt = sh._cycle.lower(sh.state).compile().as_text()
DT = {"f32": 4, "f64": 8, "s32": 4, "u32": 4, "pred": 1, "bf16": 2}
coll = {}
for op in ("all-gather", "all-reduce", "reduce-scatter",
           "collective-permute", "all-to-all"):
    total = 0
    count = 0
    for m in re.finditer(
            rf"= \(?([a-z0-9]+)\[([0-9,]*)\][^)\s]*\)?[^=]*? {op}\(",
            txt):
        dt, dims = m.group(1), m.group(2)
        if dt not in DT:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DT[dt]
        count += 1
    if count:
        coll[op] = {"count": count, "bytes": total}

stats = sd.win_stats or []
doc = {
    "P": P,
    "decomp": "2d" if TWO_D else "1d",
    "mesh": "tet-flagship" if TET else "box-flagship",
    "edges": int(mesh.levels[0].num_internal_edges),
    "block": int(sd.block),
    "smax": int(sd.smax),
    "pool_bytes_per_gather_fp32": int(5 * P * sd.smax * 4),
    "separator_pct": round(100.0 * float((sd.sep_mask > 0).sum())
                           / mesh.levels[0].num_nodes, 2),
    "placed_coverage_min": (min(s["coverage"] for s in stats)
                            if stats else None),
    "spilled_total": sum(s["spilled_halves"] for s in stats),
    "layers_mean": (round(sum(s["layers_mean"] for s in stats)
                          / len(stats), 1) if stats else None),
    "layers_max": max((s["layers_max"] for s in stats), default=None),
    "slot_fill_mean": (round(sum(s["slot_fill"] for s in stats)
                             / len(stats), 2) if stats else None),
    "buckets": sd.win_buckets,
    "hlo_collectives_per_cycle": coll,
}
print(json.dumps(doc))
