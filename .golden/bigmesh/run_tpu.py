"""Capacity-point re-measure: 136x128x140 x 4 levels (2.44M nodes /
7.26M internal edges finest) on one v5e chip.

Reference CPU (recorded in BASELINE.md): 1884 ms/cycle (kernel Total
minus the rw twin, 3 cycles). TPU side: K=10 cycles per dispatch,
best of 3, twin off — same policy as BASELINE.md's capacity table.

PYTHONPATH=/root/repo:/root/.axon_site python .golden/bigmesh/run_tpu.py [modes...]
"""
import sys
import time

import numpy as np

from mgcfd_tpu.bench.flagship import FlagshipSpec, flagship_mesh
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver import MGCFDSolver

modes = sys.argv[1:] or ["window", "shift_t", "pallas"]

t0 = time.time()
mesh = flagship_mesh(FlagshipSpec(nx=136, ny=128, nz=140, num_levels=4))
print(f"mesh built {time.time()-t0:.0f}s; "
      f"E={mesh.levels[0].num_internal_edges}", flush=True)

K = 10
for mode in modes:
    try:
        cfg = SolverConfig(
            dtype="float32", include_indirect_rw=False,
            accumulate="shift" if mode == "shift_t" else mode,
            transposed=(mode == "shift_t"),
            plan_cache_dir=".golden/bigmesh/plans")
        t0 = time.time()
        s = MGCFDSolver(mesh, cfg)
        s.config.check_invalid_every = 10 ** 9
        print(f"{mode}: solver built {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        s.run_batched(K, K)
        np.asarray(s.state["variables"][0].ravel()[:8])
        print(f"{mode}: warm (compile) {time.time()-t0:.0f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            s.run_batched(K, K)
            np.asarray(s.state["variables"][0].ravel()[:8])
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"{mode}: {best*1e3:.1f} ms/cycle "
              f"({1.884/best:.1f}x CPU)", flush=True)
        del s
    except Exception as e:
        print(f"{mode}: FAILED {type(e).__name__}: {e}", flush=True)
