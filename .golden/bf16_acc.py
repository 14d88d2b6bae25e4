"""bf16/f32 accuracy vs fp64 oracle — two isolated phases.

Phase A (subprocess, CPU backend + x64): fp64 segment-mode oracle, 5
cycles, saved to npz. Phase B (this process, TPU): f32 and bf16 pallas
fused runs, elementwise comparison. Keeping x64 out of the TPU process
sidesteps the x64+Mosaic dtype traps (and regression-tests the fixed
ones via the CI interpret path instead).
"""
import os
import subprocess
import sys

ORACLE = ".golden/bf16_oracle.npz"
if not os.path.exists(ORACLE):
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "jax.config.update('jax_enable_x64', True)\n"
        "import numpy as np\n"
        "from mgcfd_tpu.core.config import SolverConfig\n"
        "from mgcfd_tpu.bench.flagship import flagship_mesh\n"
        "from mgcfd_tpu.solver import MGCFDSolver\n"
        "mesh = flagship_mesh()\n"
        "o = MGCFDSolver(mesh, SolverConfig(dtype='float64',\n"
        "    accumulate='segment', include_indirect_rw=False))\n"
        "print('oracle running...', flush=True)\n"
        "o.run(5)\n"
        f"np.savez({ORACLE!r}, v=o.variables(0), rms=o.rms_history[-1])\n"
        "print('oracle done', flush=True)\n")
    r = subprocess.run([sys.executable, "-u", "-c", code])
    assert r.returncode == 0

import numpy as np  # noqa: E402
z = np.load(ORACLE)
w, orms = z["v"], float(z["rms"])
from mgcfd_tpu.core.config import SolverConfig  # noqa: E402
from mgcfd_tpu.bench.flagship import flagship_mesh  # noqa: E402
from mgcfd_tpu.solver import MGCFDSolver  # noqa: E402
mesh = flagship_mesh()
for dtype in ("float32", "bfloat16"):
    s = MGCFDSolver(mesh, SolverConfig(dtype=dtype, accumulate="pallas",
                                       include_indirect_rw=False))
    s.run(5)   # NaN guard active every cycle
    v = s.variables(0).astype(np.float64)
    rel = np.abs(v - w) / np.maximum(np.abs(w), 1e-30)
    print(f"{dtype}: max rel err vs fp64 oracle = {rel.max():.3e}, "
          f"median = {np.median(rel):.3e}, NaN guard clean, "
          f"rms={s.rms_history[-1]:.3e} (oracle {orms:.3e})", flush=True)
