"""Decompose the fused shift-stage kernel cost on the real TPU.

Variants of the span-loop body measured by chained slope timing with a
real fetch (RELATIVE comparison within one session; absolute values
carry the tunnel caveat — verify skill).

PYTHONPATH=/root/repo:/root/.axon_site python .golden/shift_body_bench.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from mgcfd_tpu.bench import flagship_mesh
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver import MGCFDSolver
from mgcfd_tpu.pallas import flux_shift as fs

mesh = flagship_mesh()
cfg = SolverConfig(dtype="float32", accumulate="pallas",
                   include_indirect_rw=False)
s = MGCFDSolver(mesh, cfg)
lvl0 = s.dmesh.levels[0]
pf = lvl0.pallas_flux
print("deltas:", pf.deltas, "bn:", pf.bn, "padded:", pf.padded, flush=True)
q = s.state["variables"][0]  # (5, padded)


def timeit(name, fn, x0, reps=None):
    """K chained applications inside ONE lax.scan dispatch (honest
    through the tunnel), minus fixed overhead via a K/4 run."""
    import jax.lax as lax
    K = 100
    jf = jax.jit(fn)

    def runner(k):
        @jax.jit
        def run(x):
            def step(c, _):
                return c + jf(c) * jnp.float32(1e-12), None
            y, _ = lax.scan(step, x, None, length=k)
            return y
        y = run(x0); np.asarray(y.ravel()[:8])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            y = run(x0); np.asarray(y.ravel()[:8])
            best = min(best, time.perf_counter() - t0)
        return best

    dt = (runner(K) - runner(K // 4)) / (K - K // 4)
    print(f"{name:34s} {dt*1e3:8.3f} ms/eval", flush=True)
    return dt



# --- the production kernel (flux) ---------------------------------------
timeit("prod kernel (flux)", lambda v: pf(v), q)
# --- rw twin: same rolls/slices/acc, near-zero math ----------------------
rw = lvl0.pallas_rw if getattr(lvl0, "pallas_rw", None) is not None else None
if rw is not None:
    timeit("rw twin (no math)", lambda v: rw(v), q)


SM = 0.2


def _edge_val_group(qa, qb, ew):
    """Sublane-GROUPED flux math: ew rows [|w|, wx, wy, wz] so the
    normal block sits at sublane offset 1, matching the momentum rows
    qa[1:4] — binary ops never mix sublane offsets. Bulk work runs on
    (5,L)/(3,L) groups instead of 1-D rows (each of which pays full
    8-sublane vregs)."""
    wm = ew[1:4]
    moma, momb = qa[1:4], qb[1:4]
    pa, pb = qa[5:6], qb[5:6]
    wmo = jnp.sum(wm * moma, 0, keepdims=True)
    wmn = jnp.sum(wm * momb, 0, keepdims=True)
    wvo = wmo * qa[7:8]
    wvn = wmn * qb[7:8]
    psum = pa + pb
    factor = ew[0:1] * (-0.5 * SM) * (qa[6:7] + qb[6:7])
    d5 = qa[:5] - qb[:5]
    cen123 = wvo * moma + wvn * momb + wm * psum
    cen0 = wmo + wmn
    cen4 = wvo * (qa[4:5] + pa) + wvn * (qb[4:5] + pb)
    central = jnp.concatenate([cen0, cen123, cen4], axis=0)
    return factor * d5 - 0.5 * central


# --- custom variants of the body -----------------------------------------
def make_variant(mode):
    deltas, bn, num_nodes = pf.deltas, pf.bn, pf.num_nodes
    w_pad = pf.w_pad
    if mode == "groupmath":
        w_pad = jnp.asarray(np.roll(np.asarray(pf.w_pad), 1, axis=1))

    def kern(q_prev, q_cur, q_next, w_prev, w_cur, out_ref):
        h = bn
        win = jnp.concatenate([q_prev[:], q_cur[:], q_next[:]], axis=1)
        node = (jax.lax.broadcasted_iota(jnp.int32, win.shape, 1)
                + (pl.program_id(0) - 1) * bn)
        row = jax.lax.broadcasted_iota(jnp.int32, win.shape, 0)
        quies = jnp.where((row == 0) | (row == 4), 1.0,
                          0.0).astype(win.dtype)
        win = jnp.where((node >= 0) & (node < num_nodes), win, quies)
        wwin = jnp.concatenate([w_prev[:], w_cur[:]], axis=2)
        ch = fs._stage_channels(win)
        acc = jnp.zeros(out_ref.shape, win.dtype)
        for di, d in enumerate(deltas):
            pad = fs._ceil128(d)
            sst = h - pad
            L = bn + pad
            qa = ch[:, sst: sst + L]
            if mode == "noroll":
                qb = ch[:, sst: sst + L]
            else:
                qb = fs._shifted_window(ch, sst + d, L, False)
            ew = wwin[di, :, sst: sst + L]
            if mode == "nomath":
                val = (qa[:5] - qb[:5]) * ew[3]
            elif mode == "groupmath":
                val = _edge_val_group(qa, qb, ew)
            else:
                val = fs._edge_val_ch(qa, qb, ew)
            if mode == "noroll":
                acc = acc + val[:, pad: pad + bn] - val[:, :bn]
            else:
                acc = (acc + val[:, pad: pad + bn]
                       - fs._shifted_window(val, pad - d, bn, False))
        out_ref[...] = acc.astype(out_ref.dtype)

    @jax.jit
    def run(q_pad):
        rows, total = q_pad.shape
        k = total // bn
        d_count = w_pad.shape[0]
        return pl.pallas_call(
            kern,
            grid=(k,),
            in_specs=[
                pl.BlockSpec((rows, bn),
                             lambda i: (0, jnp.maximum(i - 1, 0))),
                pl.BlockSpec((rows, bn), lambda i: (0, i)),
                pl.BlockSpec((rows, bn),
                             lambda i: (0, jnp.minimum(i + 1, k - 1))),
                pl.BlockSpec((d_count, 4, bn), lambda i: (0, 0, i)),
                pl.BlockSpec((d_count, 4, bn), lambda i: (0, 0, i + 1)),
            ],
            out_specs=pl.BlockSpec((rows, bn), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((rows, k * bn), q_pad.dtype),
        )(q_pad, q_pad, q_pad, w_pad, w_pad)

    return run


for mode in ("full", "groupmath", "nomath", "noroll"):
    timeit(f"variant {mode}", make_variant(mode), q)

