"""Measured per-(kernel, level) device time on the real v5e via the
--measure-ops flow (monitor/opstats) — source of the BASELINE.md
"Measured in-cycle kernel rates" and the SCALING.md replicated-coarse
crossover tables.

Usage (TPU serialized):
  PYTHONPATH=/root/repo:/root/.axon_site python .golden/measure_ops.py tet
  PYTHONPATH=/root/repo:/root/.axon_site python .golden/measure_ops.py box
"""
import json
import pickle
import sys

from mgcfd_tpu.utils.compilecache import enable_compile_cache

enable_compile_cache(".golden/xlacache")

from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.monitor import InstrumentedSolver
from mgcfd_tpu.monitor.opstats import measure_instrumented

WHICH = sys.argv[1] if len(sys.argv) > 1 else "tet"
if WHICH == "tet":
    mesh = pickle.load(open(".golden/benchtet/mesh.pkl", "rb"))
    cfg = SolverConfig(dtype="float32", accumulate="window",
                       include_indirect_rw=False,
                       plan_cache_dir=".golden/benchtet/plans")
else:
    from mgcfd_tpu.bench import flagship_mesh
    mesh = flagship_mesh()
    cfg = SolverConfig(dtype="float32", accumulate="pallas",
                       include_indirect_rw=False)

s = InstrumentedSolver(mesh, cfg)
s.run(1)
m = measure_instrumented(s, cycles=2)
out = {f"{k}_l{l}": {"us_per_cycle": round(v["time_us"] / 2, 1),
                     "occ": v["occurrences"]}
       for (k, l), v in sorted(m.items())}
print(json.dumps(out, indent=1))
total = sum(v["time_us"] for v in m.values()) / 2
print(f"# total {total / 1e3:.2f} ms/cycle", file=sys.stderr)
