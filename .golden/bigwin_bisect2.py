"""Finer bisect of the capacity-scale bucketed window crash: run ONE
_dispatch (one pallas_call) with chosen (bucket index, prev aliasing).

usage: bigwin_bisect2.py <bucket_idx 0|1> <with_prev 0|1> [whole_x 0|1]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from mgcfd_tpu.bench.flagship import FlagshipSpec, flagship_mesh
from mgcfd_tpu.prep.renumber import tile_interleave_levels
from mgcfd_tpu.prep.window import build_window_plan, cached_plan
from mgcfd_tpu.pallas import flux_window as fw
from mgcfd_tpu.pallas.flux_window import PallasWindowFlux, _MATH

if ":" in sys.argv[1]:
    bidx = None
    estart, ecount, elmax = map(int, sys.argv[1].split(":"))
else:
    bidx = int(sys.argv[1])
with_prev = bool(int(sys.argv[2]))
force_whole = int(sys.argv[3]) if len(sys.argv) > 3 else None

mesh = flagship_mesh(FlagshipSpec(nx=136, ny=128, nz=140, num_levels=4))
levels, _ = tile_interleave_levels(mesh.levels)
l = levels[0]

wplan = cached_plan(
    ".golden/bigmesh/plans", "flux",
    (l.edge_a, l.edge_b, l.edge_w, np.asarray([l.num_nodes]),
     np.frombuffer(b"linear", np.uint8)),
    lambda: build_window_plan(l, node_map="linear"))

flux = PallasWindowFlux(wplan, l.num_nodes, dtype=jnp.float32,
                        bucket=True)
print("buckets:", flux.buckets, flush=True)
if bidx is None:
    bstart, bcount, blmax = estart, ecount, elmax
else:
    bstart, bcount, blmax = flux.buckets[bidx]

nch, math = _MATH["flux"]
nw = wplan.w4.shape[2]
linear = bool(wplan.linear_layout)
whole_x = wplan.src_windows * nch * 4096 <= fw.WHOLE_X_LIMIT_BYTES
if force_whole is not None:
    whole_x = bool(force_whole)
print(f"bucket[{bidx}]=({bstart},{bcount},{blmax}) whole_x={whole_x} "
      f"with_prev={with_prev} linear={linear}", flush=True)

rng = np.random.default_rng(0)
q = np.tile(np.asarray([1.4, 0.1, 0.05, -0.02, 2.3])[:, None],
            (1, flux.padded_in)).astype(np.float32)
q += rng.normal(0, 1e-3, q.shape).astype(np.float32)
qd = jnp.asarray(q)


def run(qq, arrays, prev):
    X = flux._channels(qq)
    Xw = X.reshape(nch, wplan.src_windows, 8, 128)
    return flux._dispatch(Xw, arrays, nch, math, nw, whole_x, linear,
                          bstart, bcount, blmax, prev)


prev = (jnp.zeros((5, wplan.n_win, 8, 128), jnp.float32)
        if with_prev else None)
args = (qd, flux.arrays, prev) if with_prev else (qd, flux.arrays, None)
fn = jax.jit(lambda qq, arr: run(qq, arr, prev))
t0 = time.time()
out = fn(qd, flux.arrays)
out.block_until_ready()
print(f"compile+run {time.time()-t0:.0f}s", flush=True)
val = np.asarray(out)
print("readback ok; finite:", np.isfinite(val).all(),
      "norm:", float(np.abs(val).sum()), flush=True)
