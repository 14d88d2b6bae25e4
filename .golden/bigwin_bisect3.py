"""Test: does pre-gathering base by depth-order (single scalar
indirection base_sorted[start+w] in the ELEMENT x index map, output
still via wmap) avoid the capacity-scale bucketed abort?

usage: bigwin_bisect3.py <start:count:lmax>
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mgcfd_tpu.bench.flagship import FlagshipSpec, flagship_mesh
from mgcfd_tpu.prep.renumber import tile_interleave_levels
from mgcfd_tpu.prep.window import build_window_plan, cached_plan
from mgcfd_tpu.pallas import flux_window as fw
from mgcfd_tpu.pallas.flux_window import (PallasWindowFlux, _MATH,
                                          _window_kernel)

estart, ecount, elmax = map(int, sys.argv[1].split(":"))

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
order = np.asarray(flux.wmap_dev)
base_sorted = jnp.asarray(np.asarray(wplan.base_win)[order], jnp.int32)

nch, math = _MATH["flux"]
nw = wplan.w4.shape[2]
S = wplan.n_src
plan = wplan
start, count, l_max_b = estart, ecount, elmax
print(f"({start},{count},{l_max_b}) single-indirection x map",
      flush=True)

# kernel expects refs (base, nl, own, wmap, x, ...): keep wmap for the
# in-kernel w; only the X INDEX MAP changes to base_sorted[start+w]
kernel = functools.partial(_window_kernel, S, l_max_b, nch, math, nw,
                           True, True, True, start)

def widx(w, bs, base, nl, own, wmap):
    return wmap[start + w]

x_spec = pl.BlockSpec(
    (pl.Element(nch), pl.Element(plan.kw), pl.Element(8),
     pl.Element(128)),
    lambda w, bs, *sc: (0, bs[start + w], 0, 0))
out_spec = pl.BlockSpec((5, 1, 8, 128),
                        lambda w, *sc: (0, widx(w, *sc), 0, 0))
out_shape = jax.ShapeDtypeStruct((5, plan.n_win, 8, 128), jnp.float32)
in_specs = [
    x_spec,
    pl.BlockSpec((1, plan.l_max, S), lambda w, *sc: (widx(w, *sc), 0, 0)),
    pl.BlockSpec((1, l_max_b, 8, 128), lambda w, *sc: (widx(w, *sc), 0, 0, 0)),
    pl.BlockSpec((1, l_max_b, 8, 128), lambda w, *sc: (widx(w, *sc), 0, 0, 0)),
    pl.BlockSpec((1, l_max_b, 8, 128), lambda w, *sc: (widx(w, *sc), 0, 0, 0)),
    pl.BlockSpec((1, l_max_b, nw, 8, 128),
                 lambda w, *sc: (widx(w, *sc), 0, 0, 0, 0)),
]

def kern_body(bs_ref, base_ref, nl_ref, own_ref, wmap_ref, *rest):
    # drop the extra bs scalar ref; pass the rest to the real kernel
    kernel(base_ref, nl_ref, own_ref, wmap_ref, *rest)

arrays = flux.arrays
rng = np.random.default_rng(0)
q = np.tile(np.asarray([1.4, 0.1, 0.05, -0.02, 2.3])[:, None],
            (1, flux.padded_in)).astype(np.float32)
q += rng.normal(0, 1e-3, q.shape).astype(np.float32)
qd = jnp.asarray(q)

def run(qq, arr):
    X = flux._channels(qq)
    Xw = X.reshape(nch, plan.src_windows, 8, 128)
    return pl.pallas_call(
        kern_body,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(count,),
            in_specs=in_specs,
            out_specs=out_spec,
        ),
        out_shape=out_shape,
    )(base_sorted, arr["base"], arr["nl"], arr["own"], flux.wmap_dev,
      Xw, arr["lwins"], arr["wsel"], arr["ci"], arr["rs"], arr["w4"])

fn = jax.jit(run)
t0 = time.time()
out = fn(qd, arrays)
out.block_until_ready()
print(f"compile+run {time.time()-t0:.0f}s", flush=True)
val = np.asarray(out)
print("readback ok; finite:", np.isfinite(val).all(),
      "norm:", float(np.abs(val).sum()), flush=True)
