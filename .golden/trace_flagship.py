import jax
from mgcfd_tpu.bench import flagship_mesh
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver import MGCFDSolver
mesh = flagship_mesh()
s = MGCFDSolver(mesh, SolverConfig(dtype="float32", accumulate="shift",
                                   transposed=True, include_indirect_rw=False,
                                   check_invalid_every=100))
s.run(cycles=1)
with jax.profiler.trace("/root/repo/.golden/trace_fl"):
    s.run(cycles=3)
    jax.block_until_ready(s.state["variables"][0])
print("trace done")
