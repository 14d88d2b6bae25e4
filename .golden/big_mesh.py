import time, jax
from mgcfd_tpu.bench.flagship import FlagshipSpec, flagship_mesh
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver import MGCFDSolver

# ~8M-edge problem (BASELINE.json config 4): 136x128x140 = 2.44M nodes
spec = FlagshipSpec(nx=136, ny=128, nz=140, num_levels=4)
mesh = flagship_mesh(spec)
print("nodes", mesh.levels[0].num_nodes,
      "edges", mesh.levels[0].num_internal_edges, flush=True)
s = MGCFDSolver(mesh, SolverConfig(dtype="float32", accumulate="shift",
                                   transposed=True,
                                   include_indirect_rw=False))
s.run_batched(5, 5)
for t in range(2):
    t0 = time.perf_counter()
    s.run_batched(10, 10)
    jax.block_until_ready(s.state["variables"][0])
    dt = (time.perf_counter()-t0)/10
    e = mesh.levels[0].num_internal_edges
    print(f"trial {t}: {dt*1e3:.1f} ms/cycle "
          f"({3*e/dt/1e9:.2f} Gedge-visits/s level0)", flush=True)

# per-op overhead probe
import jax.numpy as jnp
x = jnp.ones((8,128), jnp.float32)
def chain(x):
    for i in range(400):
        x = x + 1.0
        x = x * 0.999
    return x
f = jax.jit(chain)
jax.block_until_ready(f(x))
t0 = time.perf_counter()
for _ in range(10):
    y = f(x)
jax.block_until_ready(y)
per_op = (time.perf_counter()-t0)/10/800
print(f"per-tiny-op overhead: {per_op*1e6:.1f} us", flush=True)
