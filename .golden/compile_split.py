"""Where does the flagship-tet 'cold compile' wall actually go?
(VERDICT r03 #3). Splits the K-scan program build into phases:

  mesh-load | solver-build (plan cache) | trace+lower (host) |
  backend compile (server) | first execute | second execute

Usage (TPU serialized; cache honored via MGCFD_COMPILE_CACHE, default
.golden/xlacache, 'off' to disable):
  python .golden/compile_split.py [K] [box|tet]
"""
import os
import pickle
import sys
import time

import numpy as np

K = int(sys.argv[1]) if len(sys.argv) > 1 else 50
WHICH = sys.argv[2] if len(sys.argv) > 2 else "tet"

_cache = os.environ.get("MGCFD_COMPILE_CACHE", "")
if _cache.lower() not in ("off", "0", "none"):
    from mgcfd_tpu.utils.compilecache import enable_compile_cache
    enable_compile_cache(_cache or ".golden/xlacache")
    print(f"cache: ON ({_cache or '.golden/xlacache'})")
else:
    print("cache: OFF")

from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver import MGCFDSolver
from mgcfd_tpu.solver.solver import make_multi_cycle_fn

t = time.perf_counter()


def lap(name):
    global t
    now = time.perf_counter()
    print(f"{name:>24}: {now - t:8.1f} s", flush=True)
    t = now


if WHICH == "tet":
    mesh = pickle.load(open(".golden/benchtet/mesh.pkl", "rb"))
    plans = ".golden/benchtet/plans"
else:
    from mgcfd_tpu.bench import flagship_mesh
    mesh = flagship_mesh()
    plans = ".golden/benchmesh/plans"
lap("mesh load")

s = MGCFDSolver(mesh, SolverConfig(dtype="float32", accumulate="window",
                                   include_indirect_rw=False,
                                   plan_cache_dir=plans))
s.config.check_invalid_every = 10 ** 9
lap("solver build")

mm = make_multi_cycle_fn(s.dmesh, s.config, K)
lap("make_multi_cycle_fn")

low = mm.lower(s.state)
lap("trace+lower (host)")

comp = low.compile()
lap("backend compile")

state2, rms, inv = comp(s.state, mm.arrays)
np.asarray(rms)
lap("first execute")

t0 = time.perf_counter()
state3, rms2, inv2 = comp(state2, mm.arrays)
np.asarray(rms2)
lap("second execute")
print(f"per-cycle (2nd exec / K): "
      f"{(time.perf_counter() - t0) / K * 1e3:.3f} ms")
