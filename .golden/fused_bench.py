import time, jax
import jax.numpy as jnp
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.bench.flagship import flagship_mesh
from mgcfd_tpu.solver import MGCFDSolver

print(jax.devices())
mesh = flagship_mesh()

def cyc(cfg_kw):
    s = MGCFDSolver(mesh, SolverConfig(dtype="float32",
                                       include_indirect_rw=False,
                                       accumulate="pallas", **cfg_kw))
    s.config.check_invalid_every = 10**9
    s.run_batched(5, 5)   # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s.run_batched(10, 10)
        jax.block_until_ready(s.state["variables"][0])
        best = min(best, (time.perf_counter() - t0) / 10)
    return best, s

b_unf, _ = cyc({"fuse_stage": False})
print(f"unfused V-cycle: {b_unf*1e3:.2f} ms")
b_fus, s = cyc({"fuse_stage": True})
print(f"fused   V-cycle: {b_fus*1e3:.2f} ms")
