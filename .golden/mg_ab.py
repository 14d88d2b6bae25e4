import time, jax
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.bench.flagship import flagship_mesh
from mgcfd_tpu.solver import MGCFDSolver
import numpy as np

mesh = flagship_mesh()

def run(tag, **kw):
    s = MGCFDSolver(mesh, SolverConfig(dtype="float32", include_indirect_rw=False,
                                       accumulate="pallas", **kw))
    s.config.check_invalid_every = 10**9
    K = 50
    s.run_batched(K, K)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        s.run_batched(K, K)
        jax.block_until_ready(s.state["variables"][0])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{tag}: {best*1e3:.2f} ms/cycle  rms={s.rms_history[-1]:.4e}")
    return s

a = run("pallas fused + windowed MG")
