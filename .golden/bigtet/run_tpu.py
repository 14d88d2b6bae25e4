"""TPU capacity measurement on the ~8M-edge tet hierarchy (window
mode; whole-X + fused since the scoped-VMEM ceiling raise).
K=50 cycles/dispatch, best of 3 — the late-round-3 headline policy
(BASELINE.md); also prints the K=10 point for the K-scan fit.

PYTHONPATH=/root/repo:/root/.axon_site python .golden/bigtet/run_tpu.py
"""
import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver import MGCFDSolver

D = os.path.dirname(os.path.abspath(__file__))
mesh = pickle.load(open(os.path.join(D, "mesh.pkl"), "rb"))
for i, l in enumerate(mesh.levels):
    print(f"L{i}: {l.num_nodes} nodes {l.num_internal_edges} edges",
          flush=True)

K = 50
cfg = SolverConfig(dtype="float32", accumulate="window",
                   include_indirect_rw=False,
                   plan_cache_dir=os.path.join(D, "plans"))
t0 = time.time()
s = MGCFDSolver(mesh, cfg)
s.config.check_invalid_every = 10 ** 9
print(f"solver built {time.time()-t0:.0f}s", flush=True)
t0 = time.time()
s.run_batched(K, K)
np.asarray(s.state["variables"][0].ravel()[:8])
print(f"warm (compile) {time.time()-t0:.0f}s", flush=True)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    s.run_batched(K, K)
    np.asarray(s.state["variables"][0].ravel()[:8])
    best = min(best, (time.perf_counter() - t0) / K)
print(f"window: {best*1e3:.1f} ms/cycle", flush=True)
print("rms finite:", np.isfinite(s.rms_history).all() if
      len(s.rms_history) else "n/a", flush=True)
