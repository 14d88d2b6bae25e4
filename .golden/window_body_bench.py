"""Microbench: current windowed kernel body (S gathers + selects per
channel per layer, cell-keyed wsel) vs the select-first body (S selects
to build a composite table + 2 gathers, position-keyed wsel).

Plans are DUMMY (random valid-range indices, same shapes as the tet
flagship) — numerics are garbage, perf is shape-faithful. Timing:
repeated dispatch (the trustworthy method per BASELINE.md).

Run alone on the chip: PYTHONPATH=/root/repo:/root/.axon_site python .golden/window_body_bench.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mgcfd_tpu.pallas.flux_window import _take_i32, _flux_math

N_WIN = 298
KW = 21
NCH = 8
HALVES = 4_557_558


def make_args(S, l_max, nl_mean, seed=0):
    rng = np.random.default_rng(seed)
    nl = np.clip(rng.normal(nl_mean, 3, N_WIN).astype(np.int32), 8, l_max)
    base = np.clip(np.arange(N_WIN) - KW // 2, 0, N_WIN - KW).astype(np.int32)
    own = np.clip(np.arange(N_WIN) - base, 0, KW - 1).astype(np.int32)
    lwins = rng.integers(0, KW, (N_WIN, l_max, S), np.int32)
    wsel = rng.integers(0, S, (N_WIN, l_max, 8, 128), np.int32)
    ci = rng.integers(0, 128, (N_WIN, l_max, 8, 128), np.int32)
    rs = rng.integers(0, 8, (N_WIN, l_max, 8, 128), np.int32)
    w4 = rng.normal(0, 1e-3, (N_WIN, l_max, 4, 8, 128)).astype(np.float32)
    X = rng.normal(1, 0.01, (N_WIN, NCH, 8, 128)).astype(np.float32)
    return dict(base=jnp.asarray(base), nl=jnp.asarray(nl),
                own=jnp.asarray(own), lwins=jnp.asarray(lwins),
                wsel=jnp.asarray(wsel), ci=jnp.asarray(ci),
                rs=jnp.asarray(rs), w4=jnp.asarray(w4),
                X=jnp.asarray(X))


def body_current(S, l_max, base_ref, nl_ref, own_ref, x_ref, lwins_ref,
                 wsel_ref, ci_ref, rs_ref, w_ref, o_ref):
    w = pl.program_id(0)
    qo = [x_ref[own_ref[w] + base_ref[w] * 0, ch] for ch in range(NCH)]

    def body(l, acc):
        sel = wsel_ref[0, l]
        ci = ci_ref[0, l]
        rs = rs_ref[0, l]
        qn = []
        for ch in range(NCH):
            t1 = _take_i32(x_ref[lwins_ref[0, l, 0], ch], ci, axis=1)
            for s in range(1, S):
                t1s = _take_i32(x_ref[lwins_ref[0, l, s], ch], ci, axis=1)
                t1 = jnp.where(sel == s, t1s, t1)
            qn.append(_take_i32(t1, rs, axis=0))
        vals = _flux_math(qo, qn, w_ref[0, l, 0], w_ref[0, l, 1],
                          w_ref[0, l, 2], w_ref[0, l, 3])
        return tuple(a + v for a, v in zip(acc, vals))

    acc = jax.lax.fori_loop(0, nl_ref[w], body,
                            (jnp.zeros((8, 128), jnp.float32),) * 5)
    for v in range(5):
        o_ref[0, v] = acc[v]


def body_possel(S, l_max, base_ref, nl_ref, own_ref, x_ref, lwins_ref,
                wsel_ref, ci_ref, rs_ref, w_ref, o_ref):
    w = pl.program_id(0)
    qo = [x_ref[own_ref[w] + base_ref[w] * 0, ch] for ch in range(NCH)]

    def body(l, acc):
        sel = wsel_ref[0, l]          # POSITION-keyed source select
        ci = ci_ref[0, l]
        rs = rs_ref[0, l]
        qn = []
        for ch in range(NCH):
            t = x_ref[lwins_ref[0, l, 0], ch]
            for s in range(1, S):
                t = jnp.where(sel == s, x_ref[lwins_ref[0, l, s], ch], t)
            t1 = _take_i32(t, ci, axis=1)
            qn.append(_take_i32(t1, rs, axis=0))
        vals = _flux_math(qo, qn, w_ref[0, l, 0], w_ref[0, l, 1],
                          w_ref[0, l, 2], w_ref[0, l, 3])
        return tuple(a + v for a, v in zip(acc, vals))

    acc = jax.lax.fori_loop(0, nl_ref[w], body,
                            (jnp.zeros((8, 128), jnp.float32),) * 5)
    for v in range(5):
        o_ref[0, v] = acc[v]


def body_batched(S, l_max, base_ref, nl_ref, own_ref, x_ref, lwins_ref,
                 wsel_ref, ci_ref, rs_ref, w_ref, o_ref):
    """Channel-BATCHED gather stage — NEGATIVE RESULT (kept as record):
    Mosaic rejects 3-D gathers ("Only 2D gather is supported") and a
    (NCH*8, 128) axis-0 gather spans vregs ("Not implemented: Multiple
    source vregs along gather dimension"). dynamic_gather is strictly
    single-vreg along the gather dim, so the per-channel two-gather
    formulation is the floor for this kernel."""
    w = pl.program_id(0)
    qo = [x_ref[own_ref[w] + base_ref[w] * 0, ch] for ch in range(NCH)]

    def body(l, acc):
        sel = wsel_ref[0, l]
        ci = ci_ref[0, l]
        rs = rs_ref[0, l]
        t = x_ref[lwins_ref[0, l, 0]]            # (NCH, 8, 128)
        for s in range(1, S):
            t = jnp.where((sel == s)[None], x_ref[lwins_ref[0, l, s]], t)
        t2d = t.reshape(NCH * 8, 128)
        ci2d = jnp.broadcast_to(ci[None], (NCH, 8, 128)).reshape(
            NCH * 8, 128)
        t1 = _take_i32(t2d, ci2d, axis=1)
        roff = jax.lax.broadcasted_iota(jnp.int32, (NCH, 8, 128), 0) * 8
        rs2d = (jnp.broadcast_to(rs[None], (NCH, 8, 128)) + roff).reshape(
            NCH * 8, 128)
        qn_all = _take_i32(t1, rs2d, axis=0).reshape(NCH, 8, 128)
        qn = [qn_all[ch] for ch in range(NCH)]
        vals = _flux_math(qo, qn, w_ref[0, l, 0], w_ref[0, l, 1],
                          w_ref[0, l, 2], w_ref[0, l, 3])
        return tuple(a + v for a, v in zip(acc, vals))

    acc = jax.lax.fori_loop(0, nl_ref[w], body,
                            (jnp.zeros((8, 128), jnp.float32),) * 5)
    for v in range(5):
        o_ref[0, v] = acc[v]


def body_unroll(S, l_max, base_ref, nl_ref, own_ref, x_ref, lwins_ref,
                wsel_ref, ci_ref, rs_ref, w_ref, o_ref):
    """Static unroll over ALL l_max layers (no fori_loop): dead layers
    are inert via zero weights in the real plan. Probes fori_loop
    per-iteration overhead (per-layer cost measured channel-independent
    ~300 ns for both the 8-ch flux and 5-ch wsum kernels)."""
    w = pl.program_id(0)
    qo = [x_ref[own_ref[w] + base_ref[w] * 0, ch] for ch in range(NCH)]

    acc = (jnp.zeros((8, 128), jnp.float32),) * 5
    for l in range(l_max):
        sel = wsel_ref[0, l]
        ci = ci_ref[0, l]
        rs = rs_ref[0, l]
        qn = []
        for ch in range(NCH):
            t = x_ref[lwins_ref[0, l, 0], ch]
            for s in range(1, S):
                t = jnp.where(sel == s, x_ref[lwins_ref[0, l, s], ch], t)
            t1 = _take_i32(t, ci, axis=1)
            qn.append(_take_i32(t1, rs, axis=0))
        vals = _flux_math(qo, qn, w_ref[0, l, 0], w_ref[0, l, 1],
                          w_ref[0, l, 2], w_ref[0, l, 3])
        acc = tuple(a + v for a, v in zip(acc, vals))
    for v in range(5):
        o_ref[0, v] = acc[v]


def body_unroll_guard(S, l_max, base_ref, nl_ref, own_ref, x_ref,
                      lwins_ref, wsel_ref, ci_ref, rs_ref, w_ref, o_ref,
                      acc_ref):
    """Static unroll with per-layer pl.when(l < nl) guards beyond a
    static always-live prefix: dead layers cost a scalar-core branch
    instead of 16 gathers + flux math. acc lives in VMEM scratch
    (pl.when cannot carry values)."""
    w = pl.program_id(0)
    qo = [x_ref[own_ref[w] + base_ref[w] * 0, ch] for ch in range(NCH)]
    nl = nl_ref[w]
    acc_ref[...] = jnp.zeros((5, 8, 128), jnp.float32)

    def layer(l):
        sel = wsel_ref[0, l]
        ci = ci_ref[0, l]
        rs = rs_ref[0, l]
        qn = []
        for ch in range(NCH):
            t = x_ref[lwins_ref[0, l, 0], ch]
            for s in range(1, S):
                t = jnp.where(sel == s, x_ref[lwins_ref[0, l, s], ch], t)
            t1 = _take_i32(t, ci, axis=1)
            qn.append(_take_i32(t1, rs, axis=0))
        vals = _flux_math(qo, qn, w_ref[0, l, 0], w_ref[0, l, 1],
                          w_ref[0, l, 2], w_ref[0, l, 3])
        for v in range(5):
            acc_ref[v] += vals[v]

    GUARD_FROM = 8  # min live layers in the dummy plans
    for l in range(l_max):
        if l < GUARD_FROM:
            layer(l)
        else:
            pl.when(l < nl)(lambda l=l: layer(l))
    for v in range(5):
        o_ref[0, v] = acc_ref[v]


def build(body, S, l_max):
    kern = functools.partial(body, S, l_max)
    scratch = ([pltpu.VMEM((5, 8, 128), jnp.float32)]
               if body is body_unroll_guard else [])
    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(N_WIN,),
            scratch_shapes=scratch,
            in_specs=[
                pl.BlockSpec((N_WIN, NCH, 8, 128),
                             lambda w, *_: (0, 0, 0, 0)),
                pl.BlockSpec((1, l_max, S), lambda w, *_: (w, 0, 0)),
                pl.BlockSpec((1, l_max, 8, 128),
                             lambda w, *_: (w, 0, 0, 0)),
                pl.BlockSpec((1, l_max, 8, 128),
                             lambda w, *_: (w, 0, 0, 0)),
                pl.BlockSpec((1, l_max, 8, 128),
                             lambda w, *_: (w, 0, 0, 0)),
                pl.BlockSpec((1, l_max, 4, 8, 128),
                             lambda w, *_: (w, 0, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 5, 8, 128),
                                   lambda w, *_: (w, 0, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((N_WIN, 5, 8, 128), jnp.float32),
    )

    @jax.jit
    def fn(a):
        return call(a["base"], a["nl"], a["own"], a["X"], a["lwins"],
                    a["wsel"], a["ci"], a["rs"], a["w4"])
    return fn


def build_chain(body, S, l_max, K):
    """K data-dependent evals per dispatch (lax.scan, output fed back
    into X) so the tunnel cannot elide or overlap them; the caller
    fetches a slice to force real completion (tpu-tunnel-timing)."""
    call = build(body, S, l_max)

    @functools.partial(jax.jit, static_argnums=1)
    def fn(a, K):
        def step(X, _):
            out = call(dict(a, X=X))
            X2 = X.at[:, :5].add(out * 1e-12)
            return X2, ()

        X, _ = jax.lax.scan(step, a["X"], None, length=K)
        return X

    return fn


def timeit_chain(fn, a, Ks=(10, 40)):
    times = {}
    for K in Ks:
        out = fn(a, K)
        np.asarray(jax.device_get(out.ravel()[:8]))  # true completion
        t0 = time.perf_counter()
        out = fn(a, K)
        np.asarray(jax.device_get(out.ravel()[:8]))
        times[K] = time.perf_counter() - t0
    k0, k1 = Ks
    per = (times[k1] - times[k0]) / (k1 - k0) * 1e3
    over = times[k0] * 1e3 - per * k0
    return per, over


def main():
    print(f"devices: {jax.devices()}")
    # nl means from REAL tet-flagship plans (v5 packer, measured):
    # S=4: 33.6/46, S=5: 29.6/38, S=6: 27.4/34, S=8: 25.3/30
    cases = [
        ("possel  S=8 l_max=30 nl~25", body_possel, 8, 30, 25.3),
        ("unroll  S=8 l_max=30 (all)", body_unroll, 8, 30, 25.3),
        ("guarded S=8 l_max=30 nl~25", body_unroll_guard, 8, 30, 25.3),
        # ("batched S=8", body_batched, 8, 28, 24.9),  # does not lower
    ]
    for label, body, S, l_max, nl_mean in cases:
        a = make_args(S, l_max, nl_mean)
        fn = build_chain(body, S, l_max, 0)
        ms, over = timeit_chain(fn, a)
        floor = l_max * N_WIN * 28 * 1024 / 819e9 * 1e3
        rate = HALVES / 2 / (ms * 1e-3) / 1e6
        print(f"{label}: {ms:.3f} ms/eval (overhead {over:.0f} ms, "
              f"plan-stream floor {floor:.2f} ms)  {rate:.0f}M e/s")


if __name__ == "__main__":
    main()
