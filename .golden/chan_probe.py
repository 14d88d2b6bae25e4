"""Microbench: gather-count axis of the windowed flux kernel body.

The production body gathers NCH=8 channels per neighbor per layer
(rho, mx, my, mz, E, p, speed+sos, 1/rho); each channel costs S-1
selects + 2 dynamic_gathers, and the body is gather-issue-bound
(BASELINE.md). Variants here gather FEWER channels and recompute the
primitives in-kernel from the gathered conserved state:

  ch8  — current production body (baseline)
  ch7  — gather 7 (drop 1/rho), recompute ir = 1/rho
  ch6  — gather 6 (rho..E + s), recompute ir and p (1 recip, no sqrt)
  ch5  — gather 5 (conserved only), recompute ir, p, s (recip + 2 sqrt)

Dummy plans, shape-faithful to the tet flagship (S=8, l_max=30, static
unroll — the production dispatch). Timing: data-dependent scan chain +
fetched output slice (the window_body_bench method; relative numbers
within a session are trustworthy).

Run alone on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python .golden/chan_probe.py
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
HALVES = 4_557_558
GAMMA = 1.4


def make_args(S, l_max, nch, seed=0):
    rng = np.random.default_rng(seed)
    nl = np.clip(rng.normal(25.3, 3, N_WIN).astype(np.int32), 8, l_max)
    base = np.clip(np.arange(N_WIN) - KW // 2, 0, N_WIN - KW).astype(np.int32)
    own = np.clip(np.arange(N_WIN) - base, 0, KW - 1).astype(np.int32)
    lwins = rng.integers(0, KW, (N_WIN, l_max, S), np.int32)
    wsel = rng.integers(0, S, (N_WIN, l_max, 8, 128), np.int32)
    ci = rng.integers(0, 128, (N_WIN, l_max, 8, 128), np.int32)
    rs = rng.integers(0, 8, (N_WIN, l_max, 8, 128), np.int32)
    w4 = rng.normal(0, 1e-3, (N_WIN, l_max, 4, 8, 128)).astype(np.float32)
    X = rng.normal(1, 0.01, (N_WIN, nch, 8, 128)).astype(np.float32) + 2.0
    return dict(base=jnp.asarray(base), nl=jnp.asarray(nl),
                own=jnp.asarray(own), lwins=jnp.asarray(lwins),
                wsel=jnp.asarray(wsel), ci=jnp.asarray(ci),
                rs=jnp.asarray(rs), w4=jnp.asarray(w4),
                X=jnp.asarray(X))


def _complete8(q, nch):
    """Fill q (list of nch gathered channels) out to the 8-channel tuple
    (rho, mx, my, mz, E, p, s, ir) by in-kernel recompute."""
    if nch == 8:
        return q
    rho, mx, my, mz, E = q[:5]
    ir = 1.0 / rho
    if nch == 7:          # gathered p, s; recompute ir only
        p, s = q[5], q[6]
        return [rho, mx, my, mz, E, p, s, ir]
    m2 = mx * mx + my * my + mz * mz
    p = (GAMMA - 1.0) * (E - 0.5 * m2 * ir)
    if nch == 6:          # gathered s; recompute ir, p
        s = q[5]
        return [rho, mx, my, mz, E, p, s, ir]
    # nch == 5: recompute everything (2 sqrt)
    s = jnp.sqrt(m2) * ir + jnp.sqrt(GAMMA * p * ir)
    return [rho, mx, my, mz, E, p, s, ir]


def body(S, l_max, nch, base_ref, nl_ref, own_ref, x_ref, lwins_ref,
         wsel_ref, ci_ref, rs_ref, w_ref, o_ref):
    w = pl.program_id(0)
    qo = _complete8([x_ref[own_ref[w] + base_ref[w] * 0, ch]
                     for ch in range(nch)], nch)
    acc = (jnp.zeros((8, 128), jnp.float32),) * 5
    for l in range(l_max):
        sel = wsel_ref[0, l]
        ci = ci_ref[0, l]
        rs = rs_ref[0, l]
        masks = [sel == s for s in range(1, S)]
        qn = []
        for ch in range(nch):
            t = x_ref[lwins_ref[0, l, 0], ch]
            for s in range(1, S):
                t = jnp.where(masks[s - 1], x_ref[lwins_ref[0, l, s], ch], t)
            t1 = _take_i32(t, ci, axis=1)
            qn.append(_take_i32(t1, rs, axis=0))
        qn = _complete8(qn, nch)
        vals = _flux_math(qo, qn, w_ref[0, l, 0], w_ref[0, l, 1],
                          w_ref[0, l, 2], w_ref[0, l, 3])
        acc = tuple(a + v for a, v in zip(acc, vals))
    for v in range(5):
        o_ref[0, v] = acc[v]


def build(S, l_max, nch):
    kern = functools.partial(body, S, l_max, nch)
    call = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(N_WIN,),
            in_specs=[
                pl.BlockSpec((N_WIN, nch, 8, 128),
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

    @functools.partial(jax.jit, static_argnums=1)
    def fn(a, K):
        def step(X, _):
            out = call(a["base"], a["nl"], a["own"], X, a["lwins"],
                       a["wsel"], a["ci"], a["rs"], a["w4"])
            return X.at[:, :5].add(out * 1e-12), ()

        X, _ = jax.lax.scan(step, a["X"], None, length=K)
        return X

    return fn


def timeit_chain(fn, a, Ks=(10, 40)):
    times = {}
    for K in Ks:
        out = fn(a, K)
        np.asarray(jax.device_get(out.ravel()[:8]))
        t0 = time.perf_counter()
        out = fn(a, K)
        np.asarray(jax.device_get(out.ravel()[:8]))
        times[K] = time.perf_counter() - t0
    k0, k1 = Ks
    per = (times[k1] - times[k0]) / (k1 - k0) * 1e3
    return per


def main():
    print(f"devices: {jax.devices()}")
    S, l_max = 8, 30
    for label, nch in [("ch8 (production)", 8), ("ch7 (recomp ir)", 7),
                       ("ch6 (recomp ir,p)", 6), ("ch5 (recomp all)", 5)]:
        a = make_args(S, l_max, nch)
        fn = build(S, l_max, nch)
        ms = timeit_chain(fn, a)
        rate = HALVES / 2 / (ms * 1e-3) / 1e6
        print(f"{label}: {ms:.3f} ms/eval  {rate:.0f}M e/s")


def s_sweep():
    """With the 5-channel body the select share per layer shrank —
    re-probe the S (sources/layer) trade at the REAL packer layer
    counts (S=4: 33.6/46, S=5: 29.6/38, S=6: 27.4/34, S=8: 25.3/30)."""
    print(f"devices: {jax.devices()}")
    for label, S, l_max in [("S=8 l_max=30", 8, 30),
                            ("S=6 l_max=34", 6, 34),
                            ("S=5 l_max=38", 5, 38)]:
        a = make_args(S, l_max, 5)
        fn = build(S, l_max, 5)
        ms = timeit_chain(fn, a)
        rate = HALVES / 2 / (ms * 1e-3) / 1e6
        print(f"{label} ch5: {ms:.3f} ms/eval  {rate:.0f}M e/s")


if __name__ == "__main__":
    if len(__import__("sys").argv) > 1:
        s_sweep()
    else:
        main()
