"""Experiment: batched-roll shift flux vs per-span slice version."""
import time, jax, jax.numpy as jnp, numpy as np
from mgcfd_tpu.bench import flagship_mesh
from mgcfd_tpu.prep.shift import build_shift_plan
from mgcfd_tpu.ops import tops

mesh = flagship_mesh()
lvl = mesh.levels[0]
plan = build_shift_plan(lvl)
N = lvl.num_nodes
deltas = plan.deltas
print("deltas", deltas)
dt = jnp.float32
q = jnp.asarray(np.random.default_rng(0).random((5, N)) + 1.0, dt)
weights_t = [jnp.asarray(w.T, dt) for w in plan.weights]
# padded weights (D, 3, N)
wpad = jnp.stack([jnp.pad(w, ((0,0),(0,N-w.shape[1]))) for w in weights_t])

def bench(name, fn, *args, reps=30):
    fn = jax.jit(fn)
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    t = (time.perf_counter()-t0)/reps
    print(f"{name:24s} {t*1e3:7.2f} ms  {900328/t/1e6:8.0f} M edges/s", flush=True)

def current(q):
    return tops.t_shift_flux(deltas, weights_t, q, N)
bench("per-span slices", current, q)

def rolled(q):
    # q_b views for all spans: roll along lanes
    qb = jnp.stack([jnp.roll(q, -d, axis=1) for d in deltas])  # (D,5,N)
    qa = jnp.broadcast_to(q, qb.shape)
    val = tops.t_internal_edge_flux(
        qa.reshape(5*0 + len(deltas)*5, N).reshape(len(deltas),5,N).transpose(1,0,2).reshape(5, -1),
        qb.transpose(1,0,2).reshape(5, -1),
        wpad.transpose(1,0,2).reshape(3, -1)).reshape(5, len(deltas), N)
    flux = jnp.sum(val, axis=1)
    for i, d in enumerate(deltas):
        flux = flux - jnp.roll(val[:, i, :], d, axis=1)
    return flux
bench("batched-roll", rolled, q)

# check numerics agree (rolls wrap around; wrapped lanes have zero weights
# ... except val wraps: rolled q_b at tail lanes uses wrapped data but weight 0 -> val 0; the -roll brings val back: val[:, i, N-d:] rolled to front lanes [0,d) -> those val are 0 since weights were 0 there? weights at rows >= N-d are 0 (padded) -> val 0 -> ok
a = np.asarray(jax.jit(current)(q))
b = np.asarray(jax.jit(rolled)(q))
print("max diff", np.abs(a-b).max())
