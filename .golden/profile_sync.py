import time, jax
from mgcfd_tpu.bench import flagship_mesh
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver import MGCFDSolver

mesh = flagship_mesh()
for check in (1, 10):
    cfg = SolverConfig(dtype="float32", include_indirect_rw=False,
                       accumulate="shift", transposed=True,
                       check_invalid_every=check)
    s = MGCFDSolver(mesh, cfg)
    s.run(cycles=1)
    t0 = time.perf_counter()
    s.run(cycles=10)
    jax.block_until_ready(s.state["variables"][0])
    dt = (time.perf_counter() - t0) / 10
    print(f"check_every={check}: {dt*1e3:.1f} ms/cycle", flush=True)
