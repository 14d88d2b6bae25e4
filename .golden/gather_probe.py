"""Microbenchmark: XLA gather/scatter rates on the TPU vs operand shape.

Decides the unstructured-mesh flux design (VERDICT item 3). Each rep is
CHAINED (output feeds the next input) so identical-request caching or
overlap cannot fake the timing; a dense-copy control calibrates against
known HBM bandwidth (~819 GB/s on v5e).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np


def chain_time(step, x0, reps=10):
    """step: x -> x (same shape/dtype). Returns secs per step."""
    x = jax.block_until_ready(step(x0))     # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        x = step(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / reps


def main():
    N = 304_640
    E = 2_278_779
    rng = np.random.default_rng(0)
    base = (np.arange(E) * (N / E)).astype(np.int64)
    idx = np.clip(base + rng.integers(-4800, 4800, E), 0, N - 1)
    idx_d = jnp.asarray(idx, jnp.int32)
    idx_sorted_d = jnp.asarray(np.sort(idx), jnp.int32)

    print("== control: dense copy (N, 512) = 624 MB r+w ==")
    x0 = jnp.asarray(rng.random((N, 512)), jnp.float32)
    t = chain_time(jax.jit(lambda x: x + 1.0), x0)
    print(f"  {t*1e3:8.3f} ms -> {2*N*512*4/t/1e9:7.1f} GB/s")

    print("== gather (E rows from (N, W)), chained via mean feedback ==")
    for W in (5, 8, 16, 32, 64, 128):
        src0 = jnp.asarray(rng.random((N, W)), jnp.float32)

        def step(s, idx=idx_d):
            g = s[idx]                       # (E, W) gather
            return s + jnp.mean(g) * 1e-9    # depends on the gather
        t = chain_time(jax.jit(step), src0)
        print(f"W={W:4d}: {t*1e3:8.3f} ms  {E/t/1e6:9.1f} Mrows/s  "
              f"{E*W*4/t/1e9:7.1f} GB/s payload")

    print("== gather sorted indices ==")
    for W in (5, 128):
        src0 = jnp.asarray(rng.random((N, W)), jnp.float32)

        def step(s, idx=idx_sorted_d):
            g = jnp.take(s, idx, axis=0, indices_are_sorted=True)
            return s + jnp.mean(g) * 1e-9
        t = chain_time(jax.jit(step), src0)
        print(f"W={W:4d}: {t*1e3:8.3f} ms  {E/t/1e6:9.1f} Mrows/s")

    print("== gather transposed ((5, N) -> (5, E) lane gather) ==")
    src0 = jnp.asarray(rng.random((5, N)), jnp.float32)

    def stepT(s, idx=idx_d):
        g = s[:, idx]
        return s + jnp.mean(g) * 1e-9
    t = chain_time(jax.jit(stepT), src0)
    print(f"W=   5: {t*1e3:8.3f} ms  {E/t/1e6:9.1f} Mlanes/s")

    print("== scatter-add (segment_sum E rows -> N) ==")
    for W, srt in ((5, False), (5, True), (128, False)):
        v0 = jnp.asarray(rng.random((E, W)), jnp.float32)
        ii = idx_sorted_d if srt else idx_d

        def step(v, ii=ii, srt=srt):
            s = jax.ops.segment_sum(v, ii, num_segments=N,
                                    indices_are_sorted=srt)
            return v + jnp.mean(s) * 1e-9
        t = chain_time(jax.jit(step), v0)
        print(f"W={W:4d} sorted={srt}: {t*1e3:8.3f} ms  "
              f"{E/t/1e6:9.1f} Mrows/s")

    print("== one-hot matmul scatter (G batched tiles, f32) ==")
    G, R, Eg, V = 1190, 256, 4096, 32
    oh_idx = jnp.asarray(rng.integers(0, R, (G, Eg)), jnp.int32)
    v0 = jnp.asarray(rng.random((G, Eg, V)), jnp.float32)

    def step(v, oi=oh_idx):
        oh = (oi[:, None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (1, R, 1), 1)).astype(jnp.float32)
        c = jnp.einsum("gre,gev->grv", oh, v)
        return v + jnp.mean(c) * 1e-9
    t = chain_time(jax.jit(step), v0)
    nnz = G * Eg
    print(f"G={G} R={R} Eg={Eg} V={V}: {t*1e3:.3f} ms "
          f"{nnz/t/1e6:9.1f} Mnnz/s  ({2*nnz*R*V/t/1e12:.2f} TFLOP/s)")

    print("== one-hot matmul BOTH sides (gather window Cw + scatter R) ==")
    G2, R2, Eg2, Cw, V2 = 595, 512, 4096, 512, 32
    ga = jnp.asarray(rng.integers(0, Cw, (G2, Eg2)), jnp.int32)
    sc = jnp.asarray(rng.integers(0, R2, (G2, Eg2)), jnp.int32)
    x0 = jnp.asarray(rng.random((G2, Cw, V2)), jnp.float32)

    def step2(x, ga=ga, sc=sc):
        ohg = (ga[:, :, None] == jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, Cw), 2)).astype(jnp.float32)
        vals = jnp.einsum("gec,gcv->gev", ohg, x)        # gather
        ohs = (sc[:, None, :] == jax.lax.broadcasted_iota(
            jnp.int32, (1, R2, 1), 1)).astype(jnp.float32)
        c = jnp.einsum("gre,gev->grv", ohs, vals)        # scatter
        return x + jnp.mean(c) * 1e-9
    t = chain_time(jax.jit(step2), x0)
    nnz = G2 * Eg2
    print(f"G={G2} R={R2} Eg={Eg2} Cw={Cw} V={V2}: {t*1e3:.3f} ms "
          f"{nnz/t/1e6:9.1f} Mnnz/s")


if __name__ == "__main__":
    main()
