"""Re-measure the fused window RK stage post-static-unroll, + plan depth
stats (layer_count vs l_max waste) on the tet flagship. TPU, K=50."""
import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import numpy as np

from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver import MGCFDSolver

D = "/root/repo/.golden/benchtet"
cache = os.path.join(D, "mesh.pkl")
if os.path.exists(cache):
    mesh = pickle.load(open(cache, "rb"))
else:
    from mgcfd_tpu.mesh.unstructured import generate_unstructured_hierarchy
    from mgcfd_tpu.prep.renumber import renumber_hierarchy
    t0 = time.time()
    mesh = renumber_hierarchy(
        generate_unstructured_hierarchy(68, 64, 70, 4, seed=1))
    print("mesh gen+rcm", round(time.time() - t0, 1))
    pickle.dump(mesh, open(cache, "wb"))
for i, l in enumerate(mesh.levels):
    print(f"L{i}: {l.num_nodes} nodes {l.num_internal_edges} edges")


def cycle_time(fuse):
    cfg = SolverConfig(dtype="float32", accumulate="window",
                       include_indirect_rw=False,
                       fuse_window_stage=fuse,
                       plan_cache_dir=os.path.join(D, "plans"))
    t0 = time.time()
    s = MGCFDSolver(mesh, cfg)
    print(f"fuse={fuse}: prepare {time.time()-t0:.1f}s")
    if not fuse:
        # depth stats per level (same plans both ways)
        for i, lvl in enumerate(s.dmesh.levels):
            wf = lvl.window_flux
            if wf is None:
                continue
            p = wf.plan
            lc = np.asarray(p.layer_count)
            print(f"  L{i}: n_win={p.n_win} l_max={p.l_max} "
                  f"lc mean={lc.mean():.1f} p50={np.percentile(lc,50):.0f} "
                  f"p90={np.percentile(lc,90):.0f} max={lc.max()} "
                  f"unroll-waste={(p.l_max-lc.mean())/p.l_max:.1%}")
    s.config.check_invalid_every = 10 ** 9
    t0 = time.time()
    s.run_batched(50, 50)
    print(f"  first batch (compile+run) {time.time()-t0:.1f}s")
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s.run_batched(50, 50)
        np.asarray(s.state["variables"][0].ravel()[:8])
        best = min(best, (time.perf_counter() - t0) / 50)
    print(f"  V-cycle wall: {best*1e3:.2f} ms")
    return best


t_off = cycle_time(False)
t_on = cycle_time(True)
print(f"fused-window-stage: off {t_off*1e3:.2f} ms, on {t_on*1e3:.2f} ms "
      f"({t_off/t_on:.3f}x)")
