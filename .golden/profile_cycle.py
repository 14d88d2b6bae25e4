import time, jax, jax.numpy as jnp, numpy as np
from mgcfd_tpu.bench import flagship_mesh
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver import MGCFDSolver
from mgcfd_tpu.solver.solver import _visit, _visit_transposed
from mgcfd_tpu.ops.mg import prolong_gather, mg_restrict_gather
from mgcfd_tpu.ops import calc_rms

mesh = flagship_mesh()
cfg = SolverConfig(dtype="float32", include_indirect_rw=False,
                   accumulate="shift", transposed=True)
s = MGCFDSolver(mesh, cfg)
dm = s.dmesh
v0 = s.state["variables"][0]
v1 = s.state["variables"][1]
r0 = s.state["residuals"][0]
r1 = s.state["residuals"][1]

def bench(name, fn, *args, reps=20):
    fn = jax.jit(fn)
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:26s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms", flush=True)

legacy = dm.variant.uses_legacy_step_factor
bench("visit_L0(3 RK stages)", lambda v: _visit(dm.levels[0], v, dm.ff_flux, cfg, legacy)[0], v0)
bench("visit_L1", lambda v: _visit(dm.levels[1], v, dm.ff_flux, cfg, legacy)[0], v1)
bench("restrict_L0->L1", lambda a, b: mg_restrict_gather(a, b, *dm.levels[0].restrict_tables), v0, v1)
bench("prolong_L1->L0", lambda rc, rf, vf: prolong_gather(rc, rf, vf, dm.levels[0].prolong_tables), r1, r0, v0)
bench("transpose", lambda v: v.T + 0.0, v0)
bench("rms", lambda r: calc_rms(r), r0)
from mgcfd_tpu.ops import invalid_variables_count, time_step
bench("invalid_count", lambda v: invalid_variables_count(v), v0)
sf = jnp.ones((v0.shape[0],), v0.dtype)
bench("time_step_nodemajor", lambda v: time_step(0, sf, v, v), v0)
