import time, jax
from mgcfd_tpu.bench.flagship import FlagshipSpec, flagship_mesh
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver import MGCFDSolver

spec = FlagshipSpec(nx=136, ny=128, nz=140, num_levels=4)
mesh = flagship_mesh(spec)
s = MGCFDSolver(mesh, SolverConfig(dtype="float32", accumulate="shift",
                                   transposed=True,
                                   include_indirect_rw=False))
s.run_batched(10, 10)  # warmup at the same K (compiles once)
for t in range(3):
    t0 = time.perf_counter()
    s.run_batched(10, 10)
    jax.block_until_ready(s.state["variables"][0])
    dt = (time.perf_counter()-t0)/10
    print(f"trial {t}: {dt*1e3:.1f} ms/cycle", flush=True)
