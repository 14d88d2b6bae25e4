import time, jax
from mgcfd_tpu.bench import flagship_mesh
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver import MGCFDSolver
mesh = flagship_mesh()
s = MGCFDSolver(mesh, SolverConfig(dtype="float32", accumulate="shift",
                                   transposed=True,
                                   include_indirect_rw=False,
                                   check_invalid_every=5))
t0 = time.perf_counter()
s.run(cycles=25, verbose=False)
print(f"25 cycles in {time.perf_counter()-t0:.1f}s")
print("rms history:", [f"{x:.3e}" for x in s.rms_history])
