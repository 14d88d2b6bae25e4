"""Probe: tpu.dynamic_gather (jnp.take_along_axis in Pallas) shapes+speed.

If per-lane dynamic gather within a block is fast, the unstructured-mesh
flux can gather q_b inside windows instead of XLA's 167M rows/s gather.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def timeit_chain(step, x0, reps=10):
    x = jax.block_until_ready(step(x0))
    t0 = time.perf_counter()
    for _ in range(reps):
        x = step(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / reps


def gather_kernel(x_ref, idx_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(x_ref[...], idx_ref[...], axis=1)


def make(G, R, L, interpret=False):
    @jax.jit
    def step(x, idx):
        out = pl.pallas_call(
            gather_kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec((R, L), lambda g: (g, 0)),
                      pl.BlockSpec((R, L), lambda g: (g, 0))],
            out_specs=pl.BlockSpec((R, L), lambda g: (g, 0)),
            out_shape=jax.ShapeDtypeStruct((G * R, L), x.dtype),
            interpret=interpret,
        )(x, idx)
        return out

    return step


def main():
    rng = np.random.default_rng(0)
    backend = jax.default_backend()
    interp = backend == "cpu"
    print("backend:", backend)

    # correctness (small)
    G, R, L = 2, 8, 256
    x = jnp.asarray(rng.random((G * R, L)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, L, (G * R, L)), jnp.int32)
    out = make(G, R, L, interp)(x, idx)
    ref = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
    print("correct:", np.array_equal(np.asarray(out), ref))

    if interp:
        return

    # throughput vs lane width
    for R, L in ((8, 512), (8, 1024), (8, 4096), (16, 512), (256, 512),
                 (8, 8192)):
        G = max(1, 50_000_000 // (R * L))
        x0 = jnp.asarray(rng.random((G * R, L)), jnp.float32)
        idxs = jnp.asarray(rng.integers(0, L, (G * R, L)), jnp.int32)
        try:
            f = make(G, R, L)

            def step(x, idxs=idxs, f=f):
                o = f(x, idxs)
                return o  # chain: output becomes next input (same shape)
            t = timeit_chain(step, x0)
            n = G * R * L
            print(f"R={R:4d} L={L:5d} G={G:5d}: {t*1e3:8.3f} ms  "
                  f"{n/t/1e9:7.2f} Gelem/s")
        except Exception as e:
            print(f"R={R} L={L}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")

    # mixed widths: gather 512 outputs from a 4096-lane window
    def gk2(x_ref, idx_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(
            x_ref[...], idx_ref[...], axis=1)

    G = 64
    try:
        @jax.jit
        def step2(x, idx):
            return pl.pallas_call(
                gk2, grid=(G,),
                in_specs=[pl.BlockSpec((8, 4096), lambda g: (g, 0)),
                          pl.BlockSpec((8, 512), lambda g: (g, 0))],
                out_specs=pl.BlockSpec((8, 512), lambda g: (g, 0)),
                out_shape=jax.ShapeDtypeStruct((G * 8, 512), jnp.float32),
            )(x, idx)
        x0 = jnp.asarray(rng.random((G * 8, 4096)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, 4096, (G * 8, 512)), jnp.int32)
        out = jax.block_until_ready(step2(x0, idx))
        ref = np.take_along_axis(np.asarray(x0), np.asarray(idx), axis=1)
        print("wide-window gather works:",
              np.array_equal(np.asarray(out), ref))
    except Exception as e:
        print(f"wide-window gather: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
