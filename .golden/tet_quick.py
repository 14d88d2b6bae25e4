"""Quick tet-flagship V-cycle timing (K=50 wall + marginal slope) —
A/B harness for kernel-body changes. Run alone on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python .golden/tet_quick.py
"""
import pickle
import time

import numpy as np

from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver.solver import MGCFDSolver

import os

cache = ".golden/benchtet/mesh.pkl"
if os.path.exists(cache):
    mesh = pickle.load(open(cache, "rb"))
else:
    from mgcfd_tpu.mesh.unstructured import generate_unstructured_hierarchy
    from mgcfd_tpu.prep.renumber import renumber_hierarchy
    mesh = renumber_hierarchy(
        generate_unstructured_hierarchy(68, 64, 70, 4, seed=1))
    pickle.dump(mesh, open(cache, "wb"))
cfg = SolverConfig(dtype="float32", accumulate="window",
                   include_indirect_rw=False,
                   plan_cache_dir=".golden/benchtet/plans")
s = MGCFDSolver(mesh, cfg)
s.config.check_invalid_every = 10 ** 9


def batch_time(K):
    s.run_batched(K, K)
    b = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        s.run_batched(K, K)
        np.asarray(s.state["variables"][0].ravel()[:8])
        b = min(b, time.perf_counter() - t0)
    return b


t25, t50, t100 = batch_time(25), batch_time(50), batch_time(100)
print(f"K=50 wall {t50 / 50 * 1e3:.2f} ms/cycle; "
      f"marginal {(t100 - t25) / 75 * 1e3:.2f} ms/cycle")
rms = s.state.get("rms")
print("rms:", None if rms is None else np.asarray(rms))
