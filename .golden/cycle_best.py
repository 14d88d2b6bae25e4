import time, jax
from mgcfd_tpu.bench import flagship_mesh
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver import MGCFDSolver
mesh = flagship_mesh()
s = MGCFDSolver(mesh, SolverConfig(dtype="float32", accumulate="shift",
                                   transposed=True, include_indirect_rw=False,
                                   check_invalid_every=10**9))
s.run(cycles=1)
best = 1e9
for t in range(4):
    t0 = time.perf_counter()
    s.run(cycles=10)
    jax.block_until_ready(s.state["variables"][0])
    dt = (time.perf_counter()-t0)/10
    best = min(best, dt)
    print(f"trial {t}: {dt*1e3:.2f} ms/cycle", flush=True)
print(f"best: {best*1e3:.2f} ms/cycle = {0.2433/best:.1f}x CPU")
