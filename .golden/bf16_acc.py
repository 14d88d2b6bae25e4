import jax
jax.config.update("jax_enable_x64", True)
import numpy as np
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.bench.flagship import flagship_mesh
from mgcfd_tpu.solver import MGCFDSolver

mesh = flagship_mesh()
oracle = MGCFDSolver(mesh, SolverConfig(dtype="float64",
                                        accumulate="segment",
                                        include_indirect_rw=False),
                     device=jax.devices("cpu")[0])
print("running fp64 oracle (CPU, 5 cycles)...")
oracle.run(5)
w = oracle.variables(0)
for dtype in ("float32", "bfloat16"):
    s = MGCFDSolver(mesh, SolverConfig(dtype=dtype, accumulate="pallas",
                                       include_indirect_rw=False))
    s.run(5)   # NaN guard active every cycle
    v = s.variables(0).astype(np.float64)
    rel = np.abs(v - w) / np.maximum(np.abs(w), 1e-30)
    print(f"{dtype}: max rel err vs fp64 oracle = {rel.max():.3e}, "
          f"median = {np.median(rel):.3e}, NaN guard clean, "
          f"rms={s.rms_history[-1]:.3e} (oracle {oracle.rms_history[-1]:.3e})")
