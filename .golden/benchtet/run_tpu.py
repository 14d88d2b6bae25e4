"""TPU V-cycle benchmark on the tet-flagship hierarchy (window mode)."""
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import numpy as np

from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver import MGCFDSolver

mesh = pickle.load(open("/root/repo/.golden/benchtet/mesh.pkl", "rb"))
for i, l in enumerate(mesh.levels):
    print(f"L{i}: {l.num_nodes} nodes {l.num_internal_edges} edges")

t0 = time.time()
cfg = SolverConfig(dtype="float32", accumulate="window",
                   include_indirect_rw=False)
s = MGCFDSolver(mesh, cfg)
print("prepare (incl window plans)", round(time.time() - t0, 1))
cfg.check_invalid_every = 10 ** 9

t0 = time.time()
s.run_batched(5, 5)
print("first batch (compile+run)", round(time.time() - t0, 1))
print("rms history", [f"{x:.4e}" for x in s.rms_history])

best = float("inf")
for _ in range(3):
    t0 = time.time()
    s.run_batched(10, 10)
    jax.block_until_ready(s.state["variables"][0])
    best = min(best, (time.time() - t0) / 10)
print(f"V-cycle wall: {best*1e3:.2f} ms  "
      f"(CPU excl-rw 928 ms -> {0.928/best:.1f}x)")

# rw twin on
cfg2 = SolverConfig(dtype="float32", accumulate="window",
                    include_indirect_rw=True)
s2 = MGCFDSolver(mesh, cfg2)
s2.config.check_invalid_every = 10 ** 9
s2.run_batched(5, 5)
best2 = float("inf")
for _ in range(2):
    t0 = time.time()
    s2.run_batched(10, 10)
    jax.block_until_ready(s2.state["variables"][0])
    best2 = min(best2, (time.time() - t0) / 10)
print(f"V-cycle wall (rw twin on): {best2*1e3:.2f} ms  "
      f"(CPU incl-rw 1100 ms -> {1.100/best2:.1f}x)")
