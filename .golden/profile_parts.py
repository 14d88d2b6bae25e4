import time, functools
import jax, jax.numpy as jnp, numpy as np
from mgcfd_tpu.bench import flagship_mesh
from mgcfd_tpu.ops import internal_edge_flux

mesh = flagship_mesh()
lvl = mesh.levels[0]
N, E = lvl.num_nodes, lvl.num_internal_edges
dt = jnp.float32
v = jnp.asarray(np.random.default_rng(0).random((N, 5)) + 1.0, dt)
ea = jnp.asarray(lvl.edge_a); eb = jnp.asarray(lvl.edge_b)
ew = jnp.asarray(lvl.edge_w, dt)
qa0 = v[ea]; qb0 = v[eb]

def bench(name, fn, *args, reps=20):
    fn = jax.jit(fn)
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dtime = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dtime*1e3:8.2f} ms   {E/dtime/1e6:10.1f} Medges/s")

bench("gather_a", lambda v: v[ea], v)
bench("gather_both", lambda v: (v[ea], v[eb]), v)
bench("flux_math_only", lambda qa, qb: internal_edge_flux(qa, qb, ew), qa0, qb0)
val0 = internal_edge_flux(qa0, qb0, ew)
bench("segsum_1stream", lambda val: jax.ops.segment_sum(val, ea, num_segments=N), val0)
bench("segsum_2stream", lambda val: jax.ops.segment_sum(
    jnp.concatenate([val, -val]), jnp.concatenate([ea, eb]), num_segments=N), val0)
bench("scatter_add", lambda val: jnp.zeros((N,5), dt).at[ea].add(val).at[eb].add(-val), val0)
# sorted segment sum (edges already sorted by b; use b-sorted stream)
bench("segsum_sorted_b", lambda val: jax.ops.segment_sum(val, eb, num_segments=N,
      indices_are_sorted=True), val0)
bench("full_current", lambda v: jax.ops.segment_sum(
    jnp.concatenate([internal_edge_flux(v[ea], v[eb], ew),
                     -internal_edge_flux(v[ea], v[eb], ew)]),
    jnp.concatenate([ea, eb]), num_segments=N), v)
