"""Windowed-gather Pallas flux kernel: arbitrary unstructured meshes.

Companion to prep/window.py (see its docstring for the plan geometry).
Per grid step = one owner window of 1024 nodes:

  for each layer l of the window:
    for s in S candidate source windows:        (streamed 2-bit select)
      t1_s[r', lane] = x[lws[s]][r', col_idx[r', lane]]   axis=1 gather
    t1 = select(wsel, t1_0..t1_3)               per-CELL window choice
    qn = t1[row_sel[slot], lane]                axis=0 gather
    acc += edge_flux(q_own, qn, w_layer)        dense, owner-aligned

Both gathers are single-vreg `tpu.dynamic_gather`s — the only TPU
primitive that does per-lane dynamic addressing at vector speed (XLA's
gather engine is ~6 ns/row regardless of width; measured, BASELINE.md).
All accumulation is dense adds into the owner-aligned (8,128) tile: the
scatter side of the reference's loop (flux_loops.cpp:78-153) does not
exist on this path at all.

State channels (built densely per evaluation, mgcfd_tpu.ops.tops
conventions): rho, mom_x, mom_y, mom_z, E, pressure, speed+sos, 1/rho —
the last three precomputed so the kernel does no divisions or square
roots per half-edge (TPU divides are Newton chains on the VPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import SMOOTHING_COEFFICIENT
from ..prep.window import WIN, WindowPlan

NCH = 8  # rho, mx, my, mz, E, p, s(=speed+sos), inv_rho

# Above this X-array footprint the kernel switches from whole-array VMEM
# residency to pl.Element kw-wide neighborhood blocks (see __call__);
# module-level so tests can force the blocked path on small meshes.
WHOLE_X_LIMIT_BYTES = 24 * 2 ** 20


def _flux_math(qo, qn, w0, w1, w2, wt):
    """Per-slot edge flux value (5 channels), owner-oriented.
    Mirrors ops.tops.t_internal_edge_flux on (8,128) tiles."""
    ro, mox, moy, moz, Eo, po, so, iro = qo
    rn, mnx, mny, mnz, En, pn, sn, irn = qn
    factor = wt * (-0.5 * SMOOTHING_COEFFICIENT) * (so + sn)
    # w . mom per side
    wmo = w0 * mox + w1 * moy + w2 * moz
    wmn = w0 * mnx + w1 * mny + w2 * mnz
    # w . vel per side (vel = mom * inv_rho)
    wvo = wmo * iro
    wvn = wmn * irn
    psum = po + pn
    v0 = factor * (ro - rn) - 0.5 * (wmo + wmn)
    v1 = factor * (mox - mnx) - 0.5 * (wvo * mox + wvn * mnx
                                       + w0 * psum)
    v2 = factor * (moy - mny) - 0.5 * (wvo * moy + wvn * mny
                                       + w1 * psum)
    v3 = factor * (moz - mnz) - 0.5 * (wvo * moz + wvn * mnz
                                       + w2 * psum)
    v4 = factor * (Eo - En) - 0.5 * (wvo * (Eo + po) + wvn * (En + pn))
    return v0, v1, v2, v3, v4


def _rw_math(qo, qn, w):
    """indirect_rw twin: same slicing/gather traffic, near-zero flops
    (indirect_rw_kernel.elemfunc.c:42-55)."""
    vals = []
    for co, cn in zip(qo[:5], qn[:5]):
        vals.append(co + cn + w[0] + w[1] + w[2])
    return tuple(vals)


def _wsum_math(qo, qn, w):
    """Weighted neighbor sum: acc[owner] += w0 * G[nbr] per channel —
    the windowed prolongation's only non-dense term (ops/mg.py:
    apply side; rc[b1] == G[b2] because b1 = mapping[b2])."""
    del qo
    return tuple(w[0] * cn for cn in qn)


_MATH = {"flux": (8, lambda qo, qn, w: _flux_math(qo, qn, w[0], w[1],
                                                  w[2], w[3])),
         "rw": (8, _rw_math),
         "wsum": (5, _wsum_math)}


def _window_kernel(S, l_max, nch, math, nw, local_x,
                   base_ref, nl_ref, own_ref,  # scalar prefetch
                   x_ref,                      # (kw|n_win_src, nch, 8, 128)
                   lwins_ref,                  # (1, l_max, S) i32
                   wsel_ref, ci_ref, rs_ref,   # (1, l_max, 8, 128) i32
                   w_ref,                      # (1, l_max, K, 8, 128)
                   o_ref):                     # (1, 5, 8, 128)
    # With local_x, x_ref is the kw-wide NEIGHBORHOOD block
    # (element-granular start base_ref[w] via pl.Element) and the
    # plan's local window offsets index it directly; otherwise x_ref is
    # the whole state and the base is added in-kernel.
    w = pl.program_id(0)
    off = 0 if local_x else base_ref[w]
    # bf16 = storage format only: gathers and VPU math run on f32 VMEM
    # tiles (Mosaic's dynamic_gather has no bf16 path, and the flux
    # arithmetic needs f32 mantissas) — casts are per-(8,128) tile
    bf16 = x_ref.dtype == jnp.bfloat16

    def up(x):
        return x.astype(jnp.float32) if bf16 else x

    qo = [up(x_ref[off + own_ref[w], ch]) for ch in range(nch)]

    def body(l, acc):
        sel = wsel_ref[0, l]
        ci = ci_ref[0, l]
        rs = rs_ref[0, l]
        qn = []
        for ch in range(nch):
            t1 = jnp.take_along_axis(
                up(x_ref[off + lwins_ref[0, l, 0], ch]), ci, axis=1)
            for s in range(1, S):
                t1s = jnp.take_along_axis(
                    up(x_ref[off + lwins_ref[0, l, s], ch]), ci, axis=1)
                t1 = jnp.where(sel == s, t1s, t1)
            qn.append(jnp.take_along_axis(t1, rs, axis=0))
        vals = math(qo, qn, [up(w_ref[0, l, k]) for k in range(nw)])
        return tuple(a + v for a, v in zip(acc, vals))

    zero = jnp.zeros((8, 128),
                     jnp.float32 if bf16 else o_ref.dtype)
    acc = jax.lax.fori_loop(0, nl_ref[w], body, (zero,) * 5)
    for v in range(5):
        o_ref[0, v] = acc[v].astype(o_ref.dtype)


class PallasWindowFlux:
    """Callable (NCH-channel state) windowed flux for one mesh level.

    __call__ takes variable-major q (5, num_lanes) with num_lanes ==
    plan.padded_nodes (the solver's lane padding covers this; tail nodes
    hold far-field gas) and returns the accumulated internal-edge flux
    (5, num_lanes). Spill edges (plan.spill_*) are NOT handled here —
    the caller routes them through the segment path.
    """

    def __init__(self, plan: WindowPlan, num_nodes: int, dtype=jnp.float32,
                 interpret: bool = False, rw: bool = False, arrays=None,
                 mode: str | None = None):
        self.plan = plan
        self.num_nodes = num_nodes
        self.padded = plan.padded_nodes           # OWNER/output lanes
        self.padded_in = plan.src_windows * WIN   # neighbor/input lanes
        self.dtype = jnp.dtype(dtype)
        self.interpret = interpret
        self.mode = mode or ("rw" if rw else "flux")
        f = np.asarray
        # kept as a dict so callers pass them through jit as ARGUMENTS —
        # closure-embedding ~450 MB of plan constants into the HLO blows
        # the serialized module (this env's remote compiler rejects large
        # bodies with HTTP 413) and slows every compile. Pass `arrays`
        # to share one device copy between the flux and rw variants.
        self.arrays = arrays if arrays is not None else {
            "base": jnp.asarray(f(plan.base_win), jnp.int32),
            "nl": jnp.asarray(f(plan.layer_count), jnp.int32),
            "own": jnp.asarray(f(plan.own_local), jnp.int32),
            "lwins": jnp.asarray(f(plan.layer_wins), jnp.int32),
            "wsel": jnp.asarray(f(plan.wsel), jnp.int32),
            "ci": jnp.asarray(f(plan.col_idx), jnp.int32),
            "rs": jnp.asarray(f(plan.row_sel), jnp.int32),
            "w4": jnp.asarray(f(plan.w4), self.dtype),
        }

    def _channels(self, q):
        """(5, P) -> channel stack ((NCH, P) for flux/rw; raw for wsum)."""
        if self.mode == "wsum":
            return q
        from ..ops import tops
        prim = tops.t_primitives(q)
        return jnp.stack([
            q[0], q[1], q[2], q[3], q[4],
            prim["pressure"],
            prim["speed"] + prim["sos"],
            1.0 / q[0],
        ])

    def __call__(self, q, arrays=None):
        plan = self.plan
        P = self.padded
        arrays = self.arrays if arrays is None else arrays
        assert q.shape[1] == self.padded_in, (q.shape, self.padded_in)
        nch, math = _MATH[self.mode]
        nw = self.plan.w4.shape[2]
        X = self._channels(q)                          # (nch, Pin)
        # node j -> (win j//1024, row j%8, lane (j//8)%128)
        Xw = X.reshape(nch, plan.src_windows, 128, 8).transpose(
            1, 0, 3, 2)

        grid = (plan.n_win,)
        S, l_max = plan.n_src, plan.l_max
        # Whole-X VMEM residency is fastest to compile and run, but
        # breaks down at multi-million-node meshes (the 8M-edge mesh's
        # 76 MB state crashed the Mosaic compile helper). Above a
        # comfortable threshold, switch to element-granular kw-wide
        # neighborhood blocks (pl.Element starts from the scalar-
        # prefetched base) — same kernel body, ~24x slower compiles,
        # so only when needed.
        whole_x = plan.src_windows * nch * 4096 <= WHOLE_X_LIMIT_BYTES
        kernel = functools.partial(_window_kernel, S, l_max, nch, math,
                                   nw, not whole_x)
        if whole_x:
            x_spec = pl.BlockSpec(Xw.shape, lambda w, *_: (0, 0, 0, 0))
        else:
            x_spec = pl.BlockSpec(
                (pl.Element(plan.kw), pl.Element(nch), pl.Element(8),
                 pl.Element(128)),
                lambda w, base, *_: (base[w], 0, 0, 0))
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=grid,
                in_specs=[
                    x_spec,
                    pl.BlockSpec((1, l_max, S), lambda w, *_: (w, 0, 0)),
                    pl.BlockSpec((1, l_max, 8, 128),
                                 lambda w, *_: (w, 0, 0, 0)),
                    pl.BlockSpec((1, l_max, 8, 128),
                                 lambda w, *_: (w, 0, 0, 0)),
                    pl.BlockSpec((1, l_max, 8, 128),
                                 lambda w, *_: (w, 0, 0, 0)),
                    pl.BlockSpec((1, l_max, nw, 8, 128),
                                 lambda w, *_: (w, 0, 0, 0, 0)),
                ],
                out_specs=pl.BlockSpec((1, 5, 8, 128),
                                       lambda w, *_: (w, 0, 0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((plan.n_win, 5, 8, 128),
                                           self.dtype),
            interpret=self.interpret,
        )(arrays["base"], arrays["nl"], arrays["own"], Xw,
          arrays["lwins"], arrays["wsel"], arrays["ci"], arrays["rs"],
          arrays["w4"])
        # back to (5, P)
        return out.transpose(1, 0, 3, 2).reshape(5, P)
