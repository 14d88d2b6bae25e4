"""Honest per-piece timing of the tet window cycle: flux per level,
restrict, prolong — K scan-chained applications per dispatch, two K's
differenced (fixed overhead cancels).

PYTHONPATH=/root/repo:/root/.axon_site python .golden/tet_mg_split.py
"""
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np

from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver import MGCFDSolver
from mgcfd_tpu.solver.solver import (apply_restrict_padded,
                                     apply_prolong_padded)

mesh = pickle.load(open(".golden/benchtet/mesh.pkl", "rb"))
cfg = SolverConfig(dtype="float32", accumulate="window",
                   include_indirect_rw=False,
                   plan_cache_dir=".golden/benchtet/plans")
s = MGCFDSolver(mesh, cfg)
dm = s.dmesh


def timeit(name, fn, x0, K=60):
    def runner(k):
        @jax.jit
        def run(x):
            def step(c, _):
                return c + fn(c) * jnp.float32(1e-12), None
            y, _ = jax.lax.scan(step, x, None, length=k)
            return y
        y = run(x0)
        np.asarray(y.ravel()[:8])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            y = run(x0)
            np.asarray(y.ravel()[:8])
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (runner(K) - runner(K // 4)) / (K - K // 4)
    print(f"{name:28s} {dt*1e3:8.3f} ms/eval", flush=True)
    return dt


for i, lvl in enumerate(dm.levels):
    wf, arrs = lvl.window_flux, lvl.window_arrays
    if wf is None:
        continue
    q = s.state["variables"][i]
    timeit(f"flux L{i} ({lvl.num_nodes} nodes)",
           lambda v, wf=wf, a=arrs: wf(v, a), q)

for i in range(len(dm.levels) - 1):
    fine, coarse = dm.levels[i], dm.levels[i + 1]
    vf = s.state["variables"][i]
    vc = s.state["variables"][i + 1]
    rf = s.state["residuals"][i]

    def restrict(v, fine=fine, coarse=coarse, vc=vc):
        out = apply_restrict_padded(fine, coarse, v * 1.0, vc, True)
        # map back to fine width so the chain stays same-shaped
        return jnp.zeros_like(v) + out.sum() * jnp.float32(1e-20)
    timeit(f"restrict L{i}->L{i+1}", restrict, vf)

    def prolong(rc_like, fine=fine, coarse=coarse, rf=rf, vf=vf, vc=vc):
        out = apply_prolong_padded(fine, coarse, vc * 1.0, rf, vf, True)
        return rc_like + out[:, :rc_like.shape[1]] * jnp.float32(1e-20)
    timeit(f"prolong L{i+1}->L{i}", prolong, vf)
