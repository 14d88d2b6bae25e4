import time, jax
from mgcfd_tpu.bench import flagship_mesh
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver import MGCFDSolver
mesh = flagship_mesh()
s = MGCFDSolver(mesh, SolverConfig(dtype="float32", accumulate="shift",
                                   transposed=True, include_indirect_rw=False))
s.run_batched(10, 10)  # compile
for t in range(3):
    t0 = time.perf_counter()
    s.run_batched(20, 10)
    jax.block_until_ready(s.state["variables"][0])
    print(f"trial {t}: {(time.perf_counter()-t0)/20*1e3:.2f} ms/cycle", flush=True)
