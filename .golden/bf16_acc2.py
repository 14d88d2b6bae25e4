import numpy as np
z = np.load(".golden/bf16_oracle.npz")
w, orms = z["v"], float(z["rms"])
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.bench.flagship import flagship_mesh
from mgcfd_tpu.solver import MGCFDSolver
mesh = flagship_mesh()
names = ["rho", "mx", "my", "mz", "E"]
for dtype in ("float32", "bfloat16"):
    s = MGCFDSolver(mesh, SolverConfig(dtype=dtype, accumulate="pallas",
                                       include_indirect_rw=False))
    s.run(5)
    v = s.variables(0).astype(np.float64)
    scale = np.abs(w).max(axis=0)          # per-variable magnitude
    serr = (np.abs(v - w) / scale).max(axis=0)
    # identify_differences-style count at the reference tolerances
    acceptable = np.maximum(np.abs(w) * 1e-8, 3e-19)
    viol = int((np.abs(v - w) > acceptable).sum())
    print(f"{dtype}: scale-relative max err per var = "
          + ", ".join(f"{n}={e:.2e}" for n, e in zip(names, serr))
          + f"; identify_differences violations at fp64 tolerances: "
          f"{viol}/{w.size}", flush=True)
