"""Sharded windowed PRODUCTION program on the real chip, P=1
(VERDICT r04 #1): every sharded test and the dryrun run interpret-mode
Pallas on CPU; this is the only configuration of the sharded kernel
template (pool-concatenated operand _window_exchange, wmap-as-data,
shared bucket structure) this hardware can Mosaic-compile and time.

Usage (TPU serialized; plan caches warm after first run):
  PYTHONPATH=/root/repo:/root/.axon_site python .golden/sharded_p1_tpu.py box
  PYTHONPATH=/root/repo:/root/.axon_site python .golden/sharded_p1_tpu.py tet
"""
import json
import pickle
import sys
import time

from mgcfd_tpu.utils.compilecache import enable_compile_cache

enable_compile_cache(".golden/xlacache")

import jax  # noqa: E402

from mgcfd_tpu.core.config import SolverConfig          # noqa: E402
from mgcfd_tpu.parallel import ShardedSolver            # noqa: E402

WHICH = sys.argv[1] if len(sys.argv) > 1 else "box"
K = int(sys.argv[2]) if len(sys.argv) > 2 else 50

if WHICH == "tet":
    mesh = pickle.load(open(".golden/benchtet/mesh.pkl", "rb"))
    plans = ".golden/benchtet/plans"
elif WHICH == "bigbox":
    from mgcfd_tpu.bench.flagship import FlagshipSpec, flagship_mesh
    mesh = flagship_mesh(FlagshipSpec(nx=136, ny=128, nz=140,
                                      num_levels=4))
    plans = ".golden/bigmesh/plans"
else:
    from mgcfd_tpu.bench import flagship_mesh
    mesh = flagship_mesh()
    plans = ".golden/benchmesh/plans"

dev = jax.devices()[0]
print(f"# device: {dev} platform={dev.platform}", file=sys.stderr)
assert dev.platform != "cpu", "this probe must run on the real chip"

t0 = time.time()
sh = ShardedSolver(mesh, SolverConfig(
    dtype="float32", accumulate="window", include_indirect_rw=False,
    num_partitions=1, plan_cache_dir=plans))
t_build = time.time() - t0
print(f"# solver build {t_build:.1f} s", file=sys.stderr)

# warmup dispatch (compile + first exec)
t0 = time.time()
sh.run_batched(K, K)
t_first = time.time() - t0
print(f"# first K={K} dispatch (compile+exec) {t_first:.1f} s",
      file=sys.stderr)

best = float("inf")
for _ in range(3):
    t0 = time.time()
    sh.run_batched(K, K)
    best = min(best, (time.time() - t0) / K)
rms = sh.rms_history[-1]
print(json.dumps({
    "probe": "sharded_p1_tpu", "mesh": WHICH, "P": 1, "K": K,
    "interpret": False,
    "vcycle_wall_sec": round(best, 6),
    "rms_final": rms,
    "edges": int(mesh.levels[0].num_internal_edges),
}))
