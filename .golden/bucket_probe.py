"""Depth-bucketed window dispatch: exact-equality + timing probe on the
tet flagship plans (real TPU).

PYTHONPATH=/root/repo:/root/.axon_site python .golden/bucket_probe.py
"""
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np

from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver import MGCFDSolver
from mgcfd_tpu.pallas.flux_window import PallasWindowFlux

mesh = pickle.load(open(".golden/benchtet/mesh.pkl", "rb"))
cfg = SolverConfig(dtype="float32", accumulate="window",
                   include_indirect_rw=False,
                   plan_cache_dir=".golden/benchtet/plans")
s = MGCFDSolver(mesh, cfg)
dm = s.dmesh


def timeit(fn, x0, K=60):
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
    return (runner(K) - runner(K // 4)) / (K - K // 4)


# --- flux kernels per level: bucketed (now the default) vs single ---
for i, lvl in enumerate(dm.levels):
    wf, arrs = lvl.window_flux, lvl.window_arrays
    if wf is None:
        continue
    q = s.state["variables"][i]
    single = PallasWindowFlux(wf.plan, lvl.num_nodes, dtype=wf.dtype,
                              arrays=wf.arrays, mode=wf.mode,
                              bucket=False)
    a = np.asarray(jax.jit(lambda v: wf(v, arrs))(q))
    b = np.asarray(jax.jit(lambda v: single(v, arrs))(q))
    exact = np.array_equal(a, b)
    ta = timeit(lambda v: wf(v, arrs), q)
    tb = timeit(lambda v: single(v, arrs), q)
    print(f"flux L{i}: buckets={wf.buckets} equal={exact} "
          f"bucketed {ta*1e3:.3f} ms vs single {tb*1e3:.3f} ms")

# --- composed prolong kernel L0 ---
pw = dm.levels[0].prolong_window
ck = pw["composed_kernel"]
rc = s.state["variables"][1]
cs = PallasWindowFlux(ck.plan, dm.levels[0].num_nodes, dtype=ck.dtype,
                      arrays=ck.arrays, mode="wsum", bucket=False)
a = np.asarray(jax.jit(lambda v: ck(v, pw["composed_arrays"]))(rc))
b = np.asarray(jax.jit(lambda v: cs(v, pw["composed_arrays"]))(rc))


def chain(k):
    # cross-space: collapse the fine output back to a coarse-shaped
    # perturbation so the scan chain stays shape-stable
    def f(v):
        return v + k(v, pw["composed_arrays"]).sum() * jnp.float32(1e-20)
    return f


print(f"prolong L0: buckets={ck.buckets} equal={np.array_equal(a, b)} "
      f"bucketed {timeit(chain(ck), rc)*1e3:.3f} ms "
      f"vs single {timeit(chain(cs), rc)*1e3:.3f} ms")
