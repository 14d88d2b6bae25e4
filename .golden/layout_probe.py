"""Isolate per-op VPU cost for 1-D rows vs (8,L) blocks inside Pallas.

Measurement: K chained kernel applications inside ONE lax.scan dispatch
(the only timing the tunnel reports honestly — verify skill), minus the
same dispatch at a lower op count: fixed overheads cancel, leaving pure
per-op device time.

PYTHONPATH=/root/repo:/root/.axon_site python .golden/layout_probe.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

L = 8 * 1024 * 16  # per-row lanes
K = 400            # kernel applications per dispatch


def make(kind, nops):
    if kind == "1d":
        def body(x_ref, o_ref):
            a = x_ref[0]
            b = x_ref[1]
            for _ in range(nops):
                a = a * b + a
            o_ref[...] = jnp.broadcast_to(a * 1e-12, o_ref.shape)
    elif kind == "2d8":
        def body(x_ref, o_ref):
            a = x_ref[:]
            b = x_ref[:] + 1.0
            for _ in range(nops):
                a = a * b + a
            o_ref[...] = a * 1e-12
    elif kind == "2d5":
        def body(x_ref, o_ref):
            a = x_ref[:5]
            b = x_ref[:5] + 1.0
            for _ in range(nops):
                a = a * b + a
            o_ref[...] = jnp.broadcast_to(a[:1] * 1e-12, o_ref.shape)
    f = pl.pallas_call(
        body, out_shape=jax.ShapeDtypeStruct((8, L), jnp.float32))

    @jax.jit
    def run(x):
        def step(c, _):
            return c + f(c), None
        y, _ = jax.lax.scan(step, x, None, length=K)
        return y

    return run


def timeit(fn, x0, trials=3):
    y = fn(x0)
    np.asarray(y.ravel()[:8])
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        y = fn(x0)
        np.asarray(y.ravel()[:8])
        best = min(best, time.perf_counter() - t0)
    return best


x8 = jnp.ones((8, L), jnp.float32)
for kind, rows in (("1d", 1), ("2d8", 8), ("2d5", 5)):
    t_lo = timeit(make(kind, 8), x8)
    t_hi = timeit(make(kind, 72), x8)
    per_op = (t_hi - t_lo) / 64 / K
    elems = rows * L
    print(f"{kind:5s} lo {t_lo*1e3:7.1f} ms hi {t_hi*1e3:7.1f} ms "
          f"per-op {per_op*1e9:8.1f} ns "
          f"({per_op/elems*1e12:6.2f} ps/elem)", flush=True)
