"""Bisect the capacity-scale (136x128x140 L4) window-path device crash:
evaluate ONE windowed kernel on the real chip per invocation.

usage: bigwin_bisect.py flux <level> <bucket 0|1>
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
from mgcfd_tpu.pallas.flux_window import PallasWindowFlux

kind = sys.argv[1]
level = int(sys.argv[2])
bucket = bool(int(sys.argv[3]))

mesh = flagship_mesh(FlagshipSpec(nx=136, ny=128, nz=140, num_levels=4))
levels, _ = tile_interleave_levels(mesh.levels)
l = levels[level]
print(f"L{level}: {l.num_nodes} nodes {l.num_internal_edges} edges",
      flush=True)

wplan = cached_plan(
    ".golden/bigmesh/plans", "flux",
    (l.edge_a, l.edge_b, l.edge_w, np.asarray([l.num_nodes]),
     np.frombuffer(b"linear", np.uint8)),
    lambda: build_window_plan(l, node_map="linear"))
print(f"plan: n_win={wplan.n_win} src_windows={wplan.src_windows} "
      f"kw={wplan.kw} l_max={wplan.l_max} "
      f"layers mean {wplan.layer_count.mean():.1f}", flush=True)

flux = PallasWindowFlux(wplan, l.num_nodes, dtype=jnp.float32,
                        bucket=bucket)
print(f"bucket={bucket} buckets={flux.buckets} whole_x_lim? "
      f"{wplan.src_windows * 8 * 4096}", flush=True)

rng = np.random.default_rng(0)
q = np.tile(np.asarray([1.4, 0.1, 0.05, -0.02, 2.3])[:, None],
            (1, flux.padded_in)).astype(np.float32)
q += rng.normal(0, 1e-3, q.shape).astype(np.float32)
qd = jnp.asarray(q)

fn = jax.jit(lambda qq, arr: flux(qq, arrays=arr))
t0 = time.time()
out = fn(qd, flux.arrays)
out.block_until_ready()
print(f"compile+run {time.time()-t0:.0f}s", flush=True)
val = np.asarray(out)
print("readback ok; finite:", np.isfinite(val).all(),
      "norm:", float(np.abs(val).sum()), flush=True)
