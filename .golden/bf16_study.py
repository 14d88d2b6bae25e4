"""bfloat16 measurement (VERDICT r02 #5): perf row + accuracy study.

Runs the flagship box hierarchy in bfloat16 on the production pallas
path and measures (a) flux kernel throughput, (b) fused V-cycle wall
time at K=50, (c) elementwise accuracy after 5 cycles against the fp64
oracle (CPU path), (d) whether the NaN guard trips.
"""
import time
import jax
import jax.numpy as jnp
import numpy as np
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.bench.flagship import flagship_mesh
from mgcfd_tpu.solver import MGCFDSolver

mesh = flagship_mesh()
E = mesh.levels[0].num_internal_edges


def run(dtype, acc="pallas"):
    s = MGCFDSolver(mesh, SolverConfig(dtype=dtype, accumulate=acc,
                                       include_indirect_rw=False))
    s.config.check_invalid_every = 10 ** 9

    # flux kernel rate (chained slope timing — tunnel lies otherwise)
    lvl0 = s.dmesh.levels[0]
    kern = lvl0.pallas_flux
    f = jax.jit(lambda v: kern(v))
    q = s.state["variables"][0]

    def chain(k):
        x = q
        t0 = time.perf_counter()
        for _ in range(k):
            x = x + f(x) * jnp.asarray(1e-12, x.dtype)
        jax.block_until_ready(x)
        return time.perf_counter() - t0

    chain(2)
    dt = (chain(22) - chain(2)) / 20
    rate = E / dt

    K = 50
    s.run_batched(K, K)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        s.run_batched(K, K)
        jax.block_until_ready(s.state["variables"][0])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{dtype}: flux {rate/1e6:.0f}M edges/s, "
          f"V-cycle {best*1e3:.2f} ms (K={K}), "
          f"rms={s.rms_history[-1]:.3e}")
    return rate, best


r32, c32 = run("float32")
rbf, cbf = run("bfloat16")
print(f"bf16/f32 flux ratio {rbf/r32:.2f}, cycle ratio {c32/cbf:.2f}")

# accuracy after 5 cycles vs the fp64 oracle
oracle = MGCFDSolver(mesh, SolverConfig(dtype="float64",
                                        accumulate="segment",
                                        include_indirect_rw=False),
                     device=jax.devices("cpu")[0])
print("running fp64 oracle (CPU, 5 cycles)...")
oracle.run(5)
for dtype in ("float32", "bfloat16"):
    s = MGCFDSolver(mesh, SolverConfig(dtype=dtype, accumulate="pallas",
                                       include_indirect_rw=False))
    s.run(5)   # NaN guard active every cycle
    v = s.variables(0).astype(np.float64)
    w = oracle.variables(0)
    rel = np.abs(v - w) / np.maximum(np.abs(w), 1e-30)
    print(f"{dtype}: max rel err vs fp64 oracle = {rel.max():.3e}, "
          f"median = {np.median(rel):.3e}, NaN guard clean")
