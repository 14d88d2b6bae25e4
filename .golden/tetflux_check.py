import pickle, time, jax
import jax.numpy as jnp
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver import MGCFDSolver
mesh = pickle.load(open(".golden/benchtet/mesh.pkl", "rb"))
s = MGCFDSolver(mesh, SolverConfig(dtype="float32", accumulate="window",
                                   include_indirect_rw=False,
                                   plan_cache_dir=".golden/benchtet/plans"))
E = mesh.levels[0].num_internal_edges
lvl0 = s.dmesh.levels[0]
wf, arrs = lvl0.window_flux, lvl0.window_arrays
f = jax.jit(lambda v, a: wf(v, a))
q = s.state["variables"][0]
def chain(k):
    x = q
    t0 = time.perf_counter()
    for _ in range(k):
        x = x + f(x, arrs) * jnp.float32(1e-12)
    jax.block_until_ready(x)
    return time.perf_counter() - t0
chain(2)
for _ in range(3):
    dt = (chain(22) - chain(2)) / 20
    print(f"tet flux: {E/dt/1e6:.0f}M edges/s ({dt*1e3:.2f} ms/eval)", flush=True)
