import jax, jax.numpy as jnp, numpy as np, sys, time
from mgcfd_tpu.mesh import generate_box_mesh
from mgcfd_tpu.prep.shift import build_shift_plan
from mgcfd_tpu.pallas.flux_shift import PallasShiftFlux

lvl = generate_box_mesh(32, 16, 16)
plan = build_shift_plan(lvl)
n = lvl.num_nodes
print("deltas", plan.deltas, "n", n)
pf = PallasShiftFlux(plan.deltas, plan.weights, n, dtype=jnp.float32,
                     block_lanes=512, interpret=False)
q = jnp.asarray(np.random.default_rng(0).random((5, n)) + 1.0, jnp.float32)
try:
    out = jax.block_until_ready(pf(q))
    print("pallas compiled+ran ok", out.shape, float(out.sum()))
except Exception as e:
    print("FAILED:", type(e).__name__)
    print(str(e)[:3000])
