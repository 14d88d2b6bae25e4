import time, jax
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.bench.flagship import flagship_mesh
from mgcfd_tpu.solver import MGCFDSolver

mesh = flagship_mesh()
s = MGCFDSolver(mesh, SolverConfig(dtype="float32", include_indirect_rw=False,
                                   accumulate="pallas"))
s.config.check_invalid_every = 10**9
for K in (10, 25, 50):
    s.run_batched(K, K)  # compile+warm this K
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        s.run_batched(K, K)
        jax.block_until_ready(s.state["variables"][0])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"K={K}: {best*1e3:.2f} ms/cycle")
