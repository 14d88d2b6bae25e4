"""Probe 2: single-vreg tpu.dynamic_gather speed + the two-step
(axis1-then-axis0) 1024-window gather trick + one-hot einsum variants.

The two-step trick: a (8,128) f32 vreg-tile holds a 1024-entry table
(entry j at row j//128, lane j%128). Edge slots packed so that each
lane-column's 8 slots want 8 DISTINCT table rows. Then
  t1[r, l] = x[r, col_idx[r, l]]        (axis=1 gather: per-row lanes)
  t2[r, l] = t1[row_sel[r, l], l]       (axis=0 gather: per-lane rows)
gives t2[slot] = x[row_want[slot], col_want[slot]] when
col_idx[row_want[slot], l] == col_want[slot] (guaranteed by packing).
"""
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


def main():
    rng = np.random.default_rng(0)
    backend = jax.default_backend()
    interp = backend == "cpu"
    print("backend:", backend)

    # ---------------- correctness: two-step 1024-window gather ---------
    # table: 1024 values in one (8,128) tile
    table = rng.random((8, 128)).astype(np.float32)
    # 1024 slots, each wanting a random (row, col)
    want_row = rng.integers(0, 8, (8, 128)).astype(np.int32)
    want_col = rng.integers(0, 128, (8, 128)).astype(np.int32)
    # packing constraint: in each lane-column l, the 8 slots must want
    # distinct rows. Force it: want_row[:, l] = a permutation.
    for l in range(128):
        want_row[:, l] = rng.permutation(8)
    # col_idx[r', l] = col wanted by the slot in column l with row r'
    col_idx = np.zeros((8, 128), np.int32)
    for l in range(128):
        for r in range(8):
            col_idx[want_row[r, l], l] = want_col[r, l]

    def two_step_kernel(x_ref, ci_ref, rs_ref, o_ref):
        t1 = jnp.take_along_axis(x_ref[...], ci_ref[...], axis=1)
        o_ref[...] = jnp.take_along_axis(t1, rs_ref[...], axis=0)

    f = pl.pallas_call(
        two_step_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=interp,
    )
    try:
        out = np.asarray(f(jnp.asarray(table), jnp.asarray(col_idx),
                           jnp.asarray(want_row)))
        ref = table[want_row, want_col]
        print("two-step gather correct:", np.array_equal(out, ref))
    except Exception as e:
        print("two-step FAILED:", type(e).__name__, str(e)[:300])

    if interp:
        return

    # ---------------- speed: chained K gathers per grid step -----------
    # block (8, 128*K): kernel reshapes... simpler: block (8*K, 128) and
    # gather within each (8,128) sub-tile via a fori loop.
    K = 64            # sub-tiles per grid step
    G = 512           # grid steps
    def many_gather_kernel(x_ref, idx_ref, o_ref):
        def body(k, acc):
            xk = x_ref[pl.ds(8 * k, 8), :]
            ik = idx_ref[pl.ds(8 * k, 8), :]
            t1 = jnp.take_along_axis(xk, ik, axis=1)
            t2 = jnp.take_along_axis(t1, (ik + 3) & 7, axis=0)
            return acc + t2
        acc = jax.lax.fori_loop(0, K, body,
                                jnp.zeros((8, 128), jnp.float32))
        o_ref[...] = acc

    @jax.jit
    def step(x, idx):
        return pl.pallas_call(
            many_gather_kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec((8 * K, 128), lambda g: (g, 0)),
                      pl.BlockSpec((8 * K, 128), lambda g: (g, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda g: (g, 0)),
            out_shape=jax.ShapeDtypeStruct((G * 8, 128), jnp.float32),
        )(x, idx)

    x0 = jnp.asarray(rng.random((G * 8 * K, 128)), jnp.float32)
    idx0 = jnp.asarray(rng.integers(0, 128, (G * 8 * K, 128)), jnp.int32)
    try:
        def chain(x, idx0=idx0):
            o = step(x, idx0)               # (G*8, 128)
            return x + jnp.tile(o, (K, 1)) * 1e-9
        t = timeit_chain(jax.jit(chain), x0)
        n_gathered = G * K * 8 * 128 * 2    # two gathers per sub-tile
        print(f"two-step gather rate: {t*1e3:.3f} ms for {n_gathered/1e6:.1f}M "
              f"gathered elems -> {n_gathered/t/1e9:.2f} Gelem/s")
    except Exception as e:
        print("speed probe FAILED:", type(e).__name__, str(e)[:300])

    # ---------------- one-hot einsum variants --------------------------
    for (G2, R, Eg, V, label) in (
            (595, 512, 3840, 8, "contiguous dest-tile scatter"),
            (23000, 512, 128, 8, "fragmented runs scatter"),
    ):
        oh_idx = jnp.asarray(rng.integers(0, R, (G2, Eg)), jnp.int32)
        v0 = jnp.asarray(rng.random((G2, Eg, V)), jnp.float32)

        def stepo(v, oi=oh_idx, R=R):
            oh = (oi[:, None, :] == jax.lax.broadcasted_iota(
                jnp.int32, (1, R, 1), 1)).astype(jnp.float32)
            c = jnp.einsum("gre,gev->grv", oh, v)
            return v + jnp.mean(c) * 1e-9
        try:
            t = timeit_chain(jax.jit(stepo), v0)
            nnz = G2 * Eg
            print(f"{label}: G={G2} R={R} Eg={Eg} V={V}: {t*1e3:.3f} ms "
                  f"{nnz/t/1e6:9.1f} Mnnz/s")
        except Exception as e:
            print(f"{label} FAILED:", type(e).__name__, str(e)[:200])


if __name__ == "__main__":
    main()
