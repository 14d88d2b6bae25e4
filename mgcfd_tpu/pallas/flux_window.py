"""Windowed-gather Pallas flux kernel: arbitrary unstructured meshes.

Companion to prep/window.py (see its docstring for the plan geometry).
Per grid step = one owner window of 1024 nodes:

  for each layer l of the window:
    T = select(wsel, x[lws[0]] .. x[lws[S-1]])  per-POSITION window
                                                choice: S-1 elementwise
                                                selects, NO gathers
    t1[r', lane] = T[r', col_idx[r', lane]]     axis=1 gather
    qn = t1[row_sel[slot], lane]                axis=0 gather
    acc += edge_flux(q_own, qn, w_layer)        dense, owner-aligned

Selecting the composite table BEFORE the gathers costs 2 gathers +
(S-1) selects per channel per layer (the earlier cell-keyed scheme
gathered from every source: S+1 gathers). dynamic_gather issue
dominates this kernel while vector selects are near-free, and the
looser position-keyed packing constraint lets S=8, dropping layer
counts ~1.2x on tet meshes — measured ~1.3x together
(.golden/window_body_bench.py).

Both gathers are single-vreg `tpu.dynamic_gather`s — the only TPU
primitive that does per-lane dynamic addressing at vector speed (XLA's
gather engine is ~6 ns/row regardless of width; measured, BASELINE.md).
All accumulation is dense adds into the owner-aligned (8,128) tile: the
scatter side of the reference's loop (flux_loops.cpp:78-153) does not
exist on this path at all.

State channels: the 5 conserved variables (rho, mom, E) are gathered;
the primitive channels (pressure, speed+sos, 1/rho) are completed
IN-KERNEL per gathered side (_complete8). Gathering 8 precomputed
channels was measured SLOWER (.golden/chan_probe.py: 1.29-1.38 vs
1.23 ms/eval): the body is select+gather-issue-bound, so three fewer
select+gather chains beat the added recip/sqrt Newton chains, and the
operand X shrinks 8/5x.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.constants import GAMMA, SMOOTHING_COEFFICIENT
from ..prep.window import WIN, WindowPlan

NCH = 5  # gathered channels: rho, mx, my, mz, E (primitives in-kernel)

# Above this X-array footprint the kernel switches from whole-array VMEM
# residency to pl.Element kw-wide neighborhood blocks (see __call__);
# module-level so tests can force the blocked path on small meshes.
# 40 MB (was 24) since _compiler_params lifted the scoped-VMEM ceiling:
# the 8.23M-edge tet capacity mesh (33.3 MB of channel windows) now
# stays whole-X resident, which re-enables the fused RK stage there —
# measured 36.9 -> 35.8 ms/cycle same-session. The kernel itself times
# identically in both modes (the Element-block DMA is fully hidden
# behind the gather-issue-bound body; xprof 26.1 ms/cycle either way).
WHOLE_X_LIMIT_BYTES = 40 * 2 ** 20

# One extra pallas launch priced in window-layers for the depth-bucket
# DP (below). Measured on the axon v5e: back-to-back pallas launches
# inside one dispatch are ~free (a 32-launch chain times the same as 1;
# the once-feared "launch gap" was fixed PER-DISPATCH tunnel overhead),
# so this mostly guards against splitting off slivers whose extra
# compile time and plan-block DMA latency outweigh ~15 us of saved
# work (~0.15 us per window-layer, tet flagship).
LAUNCH_COST_WL = 100


def _compiler_params():
    """Raise Mosaic's scoped-VMEM ceiling above the conservative 16 MB
    default (the flux_shift._compiler_params twin): whole-X residency at
    capacity scale (e.g. the 8.23M-edge tet hierarchy's 33.3 MB channel
    windows) is a scoped allocation and OOMs at compile under the
    default ('Scoped allocation with size 34.87M and limit 16.00M'),
    well within the v5e's physical VMEM."""
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20)


def _depth_buckets(layer_count, max_buckets: int = 4):
    """Partition depth-sorted windows into <= max_buckets contiguous
    buckets minimizing sum_b(n_b * depth_max_b) + launches: the static
    layer unroll runs l_max for EVERY window of a dispatch, so a deep
    tail (e.g. 12 of 298 windows at 31-44 layers vs mean 25 on the tet
    flagship's composed prolong plan) taxes every window ~40% unless
    split off. Exact DP over the <= l_cap distinct depth values.

    Returns (order, buckets): order = window ids sorted by depth,
    buckets = [(start, count, l_max_b)] over the sorted sequence."""
    lc = np.asarray(layer_count, np.int64)
    n = lc.shape[0]
    order = np.argsort(lc, kind="stable").astype(np.int32)
    d = lc[order]
    cand = np.concatenate(
        [[0], np.flatnonzero(np.diff(d) != 0) + 1, [n]]).astype(int)
    m = cand.shape[0]
    INF = float("inf")
    # best[k][i]: min cost covering sorted[0:cand[i]] with k buckets
    best = [[INF] * m for _ in range(max_buckets + 1)]
    prev = [[0] * m for _ in range(max_buckets + 1)]
    best[0][0] = 0.0
    for k in range(1, max_buckets + 1):
        for i in range(1, m):
            for j in range(i):
                if best[k - 1][j] == INF:
                    continue
                c = best[k - 1][j] + (cand[i] - cand[j]) \
                    * int(d[cand[i] - 1]) + LAUNCH_COST_WL
                if c < best[k][i]:
                    best[k][i] = c
                    prev[k][i] = j
    k = min(range(1, max_buckets + 1), key=lambda k: best[k][m - 1])
    cuts = []
    i = m - 1
    while k > 0:
        j = prev[k][i]
        cuts.append((int(cand[j]), int(cand[i])))
        i, k = j, k - 1
    cuts.reverse()
    buckets = [(s, e - s, int(d[e - 1])) for s, e in cuts if e > s]
    return order, buckets


def shared_depth_buckets(layer_counts, max_buckets: int = 4):
    """One bucket structure valid for EVERY shard of a stacked (P,
    n_win) layer_count family (the sharded production path, VERDICT r03
    #4): each shard sorts its own windows by depth (its wmap travels as
    per-shard DATA through shard_map), while the (start, count,
    l_max_b) triples — the only part baked into the compiled SPMD
    program — come from the DP over the elementwise MAX of the shards'
    depth-sorted profiles, so every bucket's static unroll covers every
    shard's windows in that range. Dead layers are inert in-kernel
    (gated on nl_ref), exactly as in single-shard bucketed dispatch
    where most windows are shallower than their bucket's l_max_b.

    Returns (orders (P, n_win) int32, buckets)."""
    lc = np.asarray(layer_counts, np.int64)
    orders = np.argsort(lc, axis=1, kind="stable").astype(np.int32)
    dmax = np.take_along_axis(lc, orders.astype(np.int64), axis=1).max(
        axis=0)
    # dmax is nondecreasing (max of nondecreasing rows), so the generic
    # DP's own sort is the identity and its buckets apply verbatim
    _, buckets = _depth_buckets(dmax, max_buckets=max_buckets)
    return orders, buckets


def _complete8(q):
    """Conserved (rho, mx, my, mz, E) -> full 8-channel tuple with the
    primitives (p, speed+sos, 1/rho) recomputed in-kernel. Op order
    mirrors ops.tops.t_primitives exactly (bitwise parity with the old
    externally-built channel stack). Gathering 5 channels and
    recomputing beats gathering 8: measured 1.23 vs 1.29-1.38 ms/eval
    on the shape-faithful body bench (.golden/chan_probe.py) — the 3
    dropped select+gather chains outweigh the recip + 2 sqrt chains —
    and the channel-window X shrinks 8/5x (33.3 -> 20.8 MB at tet
    capacity scale), extending whole-X VMEM residency."""
    rho, mx, my, mz, E = q[:5]
    inv = 1.0 / rho
    vx, vy, vz = mx * inv, my * inv, mz * inv
    speed_sqd = vx * vx + vy * vy + vz * vz
    p = (GAMMA - 1.0) * (E - 0.5 * rho * speed_sqd)
    s = jnp.sqrt(speed_sqd) + jnp.sqrt(GAMMA * p * inv)
    return [rho, mx, my, mz, E, p, s, inv]


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


# flux gathers the 5 conserved channels and completes the primitive
# channels in-kernel (_complete8); rw mirrors its gather traffic (and
# the reference twin reads exactly the 5 flow vars —
# indirect_rw_kernel.elemfunc.c). The (nch, math, complete) triple:
# complete=True inserts _complete8 once per owner window and once per
# gathered layer.
_MATH = {"flux": (5, lambda qo, qn, w: _flux_math(qo, qn, w[0], w[1],
                                                  w[2], w[3]), True),
         "rw": (5, _rw_math, False),
         "wsum": (5, _wsum_math, False)}


def _window_kernel(S, l_max, nch, math, complete, nw, local_x, linear,
                   unroll, start, *refs):
    # refs (unbucketed, start=None):
    #   base_ref, nl_ref, own_ref,    scalar prefetch
    #   x_ref,                        (kw|n_win_src, nch, 8, 128)
    #                                  linear: (nch, ·, 8, 128)
    #   lwins_ref,                    (1, l_max, S) i32
    #   wsel_ref, ci_ref, rs_ref,     (1, l_max, 8, 128) i32
    #   w_ref,                        (1, l_max, K, 8, 128)
    #   o_ref                         (1, 5, 8, 128)
    #                                  linear: (5, 1, 8, 128)
    # Depth-bucketed dispatch (start=int): a wmap scalar ref follows
    # own_ref (window id = wmap[start + program_id]; plan/output blocks
    # are already remapped by the index_maps), and buckets after the
    # first carry the previous bucket's partial output as an extra
    # ignored ANY-space input aliased to o_ref (disjoint windows).
    if start is None:
        (base_ref, nl_ref, own_ref, x_ref, lwins_ref, wsel_ref, ci_ref,
         rs_ref, w_ref, o_ref) = refs
        w = pl.program_id(0)
    else:
        (base_ref, nl_ref, own_ref, wmap_ref, x_ref, lwins_ref,
         wsel_ref, ci_ref, rs_ref, w_ref) = refs[:10]
        o_ref = refs[-1]
        w = wmap_ref[start + pl.program_id(0)]
    # With local_x, x_ref is the kw-wide NEIGHBORHOOD block
    # (element-granular start base_ref[w] via pl.Element) and the
    # plan's local window offsets index it directly; otherwise x_ref is
    # the whole state and the base is added in-kernel. With linear
    # (plan.linear_layout), x/o are channel-major pure reshapes of the
    # (·, P) state — no relayout exists anywhere on the path.
    off = 0 if local_x else base_ref[w]
    # bf16 = storage format only: gathers and VPU math run on f32 VMEM
    # tiles (Mosaic's dynamic_gather has no bf16 path, and the flux
    # arithmetic needs f32 mantissas) — casts are per-(8,128) tile
    bf16 = x_ref.dtype == jnp.bfloat16

    def up(x):
        return x.astype(jnp.float32) if bf16 else x

    def xw(win, ch):
        return x_ref[ch, off + win] if linear else x_ref[off + win, ch]

    qo = [up(xw(own_ref[w], ch)) for ch in range(nch)]
    if complete:
        qo = _complete8(qo)

    rw_gate = math is _rw_math

    def body(l, acc):
        sel = wsel_ref[0, l]
        ci = ci_ref[0, l]
        rs = rs_ref[0, l]
        masks = [sel == s for s in range(1, S)]
        qn = []
        for ch in range(nch):
            t = up(xw(lwins_ref[0, l, 0], ch))
            for s in range(1, S):
                t = jnp.where(masks[s - 1],
                              up(xw(lwins_ref[0, l, s], ch)), t)
            t1 = _take_i32(t, ci, axis=1)
            qn.append(_take_i32(t1, rs, axis=0))
        if complete:
            qn = _complete8(qn)
        vals = math(qo, qn, [up(w_ref[0, l, k]) for k in range(nw)])
        if rw_gate:
            # flux/wsum values vanish exactly on dead layers (zero
            # weights kill every term); the rw twin's weightless sum
            # does not — gate it on layer liveness
            live = l < nl_ref[w]
            vals = tuple(jnp.where(live, v, 0.0) for v in vals)
        return tuple(a + v for a, v in zip(acc, vals))

    zero = jnp.zeros((8, 128),
                     jnp.float32 if bf16 else o_ref.dtype)
    # STATIC unroll over all l_max layers in compiled mode:
    # lax.fori_loop costs ~100 ns per iteration on this kernel (measured
    # 1.92 -> 1.29 ms/eval on the tet flagship even though the unroll
    # runs every allocated layer, mean-live 25.3 of 30 —
    # .golden/window_body_bench.py). Dead layers are inert: their
    # weights are zero and their gather indices point at finite physical
    # state. Interpret mode (the CPU CI) keeps the fori_loop — the
    # unrolled graph is ~l_max x slower to trace and execute there.
    if l_max == 0:
        # an all-empty depth bucket (dest windows with no halves — e.g.
        # a high-P sharded restrict where each shard covers ~1/P of the
        # coarse space): write zeros; never touch the 0-size layer
        # arrays (the interpret fori_loop would trace a 0-size read)
        acc = (zero,) * 5
    elif unroll:
        acc = (zero,) * 5
        for l in range(l_max):
            acc = body(l, acc)
    else:
        acc = jax.lax.fori_loop(0, nl_ref[w], body, (zero,) * 5)
    for v in range(5):
        if linear:
            o_ref[v, 0] = acc[v].astype(o_ref.dtype)
        else:
            o_ref[0, v] = acc[v].astype(o_ref.dtype)



def _take_i32(a, idx, axis):
    """jnp.take_along_axis with int32 indexing pinned: under
    jax_enable_x64 jnp unconditionally converts gather indices to the
    default int dtype (int64), which Mosaic cannot lower. The x64
    toggle only affects the index conversion — operand dtype is
    preserved (verified f64-in/f64-out)."""
    with jax.enable_x64(False):
        return jnp.take_along_axis(a, idx, axis=axis)


def _bw_flux_ch(qo, nc):
    """Dense aggregated boundary+wall flux from the owner window's
    channel stack (rho, mx, my, mz, E, p, s, inv_rho) and the node
    constants nc (rows 0:3 summed boundary normals, 3:6 summed wall
    normals, 6:11 far-field wall constant) — ops.tops.
    t_dense_boundary_wall_flux open-coded on (8, 128) tiles."""
    rho, mx, my, mz, E, p, _s, inv = qo
    del rho
    vx, vy, vz = mx * inv, my * inv, mz * inv
    bx, by, bz = nc[0], nc[1], nc[2]
    hx, hy, hz = 0.5 * nc[3], 0.5 * nc[4], 0.5 * nc[5]
    de_p = E + p
    return (
        hx * mx + hy * my + hz * mz + nc[6],
        bx * p + hx * (vx * mx + p) + hy * (vx * my) + hz * (vx * mz)
        + nc[7],
        by * p + hx * (vy * mx) + hy * (vy * my + p) + hz * (vy * mz)
        + nc[8],
        bz * p + hx * (vz * mx) + hy * (vz * my) + hz * (vz * mz + p)
        + nc[9],
        hx * (vx * de_p) + hy * (vy * de_p) + hz * (vz * de_p) + nc[10],
    )


def _window_fused_kernel(S, l_max, nch, nw, local_x, linear, unroll,
                         have_spill, start, refs):
    """One RK stage on one owner window: windowed flux + dense
    boundary/wall + time_step + invalid count in a single launch (the
    windowed twin of flux_shift._fused_kernel; reference stage sequence
    euler3d_cpu_double.cpp:383-512). start: depth-bucket window base
    (None = plain full grid) — see _window_kernel."""
    from jax.experimental import pallas as pl

    if start is None:
        (base_ref, nl_ref, own_ref, x_ref, lwins_ref, wsel_ref, ci_ref,
         rs_ref, w_ref, nc_ref, old_ref, fac_ref) = refs[:12]
        rest = refs[12:]
        w = pl.program_id(0)
    else:
        (base_ref, nl_ref, own_ref, wmap_ref, x_ref, lwins_ref,
         wsel_ref, ci_ref, rs_ref, w_ref, nc_ref, old_ref,
         fac_ref) = refs[:13]
        rest = refs[13:]
        w = wmap_ref[start + pl.program_id(0)]
    spill_ref = rest[0] if have_spill else None
    o_ref, inv_ref = rest[-2], rest[-1]
    off = 0 if local_x else base_ref[w]
    bf16 = x_ref.dtype == jnp.bfloat16

    def up(x):
        return x.astype(jnp.float32) if bf16 else x

    def xw(win, ch):
        return x_ref[ch, off + win] if linear else x_ref[off + win, ch]

    def tile(ref, k):
        return ref[k, 0] if linear else ref[0, k]

    qo = _complete8([up(xw(own_ref[w], ch)) for ch in range(nch)])

    def body(l, acc):
        sel = wsel_ref[0, l]
        ci = ci_ref[0, l]
        rs = rs_ref[0, l]
        masks = [sel == s for s in range(1, S)]
        qn = []
        for ch in range(nch):
            t = up(xw(lwins_ref[0, l, 0], ch))
            for s in range(1, S):
                t = jnp.where(masks[s - 1],
                              up(xw(lwins_ref[0, l, s], ch)), t)
            t1 = _take_i32(t, ci, axis=1)
            qn.append(_take_i32(t1, rs, axis=0))
        qn = _complete8(qn)
        ws = [up(w_ref[0, l, k]) for k in range(nw)]
        vals = _flux_math(qo, qn, ws[0], ws[1], ws[2], ws[3])
        return tuple(a + v for a, v in zip(acc, vals))

    zero = jnp.zeros((8, 128), jnp.float32 if bf16 else o_ref.dtype)
    # static unroll in compiled mode: see _window_kernel
    if l_max == 0:
        acc = (zero,) * 5
    elif unroll:
        acc = (zero,) * 5
        for l in range(l_max):
            acc = body(l, acc)
    else:
        acc = jax.lax.fori_loop(0, nl_ref[w], body, (zero,) * 5)
    bw = _bw_flux_ch(qo, [up(tile(nc_ref, k)) for k in range(11)])
    fac = up(tile(fac_ref, 0))
    bad = jnp.float32(0.0)
    for v in range(5):
        a = acc[v] + bw[v]
        if spill_ref is not None:
            a = a + up(tile(spill_ref, v))
        qnew = up(tile(old_ref, v)) + fac * a
        if linear:
            o_ref[v, 0] = qnew.astype(o_ref.dtype)
        else:
            o_ref[0, v] = qnew.astype(o_ref.dtype)
        # in-kernel invalid count (validation.cpp:107-138); f32 count —
        # under jax_enable_x64 integer reduces route through i64, which
        # Mosaic cannot lower
        badv = jnp.where(jnp.isfinite(qnew), 0.0, 1.0)
        if v in (0, 4):
            badv = badv + jnp.where(qnew < 0, 1.0, 0.0)
        bad = bad + jnp.sum(badv.astype(jnp.float32))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        inv_ref[0, 0] = 0

    inv_ref[0, 0] += bad.astype(jnp.int32)


class PallasWindowFusedStage:
    """Fused RK stage over the windowed flux plan: __call__(q, old, fac,
    spill=None, arrays=None) -> (q_next, invalid_count), all in the
    (5, padded) variable-major layout with fac = step_factor/(RK+1-j).
    nc (dense boundary/wall aggregates + far-field wall constant) is a
    kernel constant in the window tile layout. Owner and neighbor node
    spaces must coincide (padded == padded_in): the solver's lane
    padding guarantees it on single-chip levels."""

    def __init__(self, base: PallasWindowFlux, bd_normal, wall_normal,
                 wall_const, dtype=jnp.float32):
        self.base = base
        plan = base.plan
        assert base.padded == base.padded_in, (
            "fused window stage requires owner space == neighbor space")
        self.padded = base.padded
        self.interpret = base.interpret
        self._traced = None
        P = self.padded
        nc = np.zeros((11, P))
        n = min(P, np.asarray(bd_normal).shape[1])
        nc[0:3, :n] = np.asarray(bd_normal)[:, :n]
        nc[3:6, :n] = np.asarray(wall_normal)[:, :n]
        nc[6:11, :n] = np.asarray(wall_const)[:, :n]
        # window tile layout: interleave (node j -> win j//1024, row j%8,
        # lane (j//8)%128) or, on tile-interleaved meshes, the trivial
        # position-major reshape
        if plan.linear_layout:
            nct = nc.reshape(11, plan.n_win, 8, 128)
        else:
            nct = nc.reshape(11, plan.n_win, 128, 8).transpose(1, 0, 3, 2)
        # one device copy living in the SHARED plan-arrays dict: the
        # solver passes that dict as jit ARGUMENTS, so nc never becomes
        # a closure constant (a closure device array is fetched
        # host-side at every lowering — ~5 s per fetch through the
        # tunnel — and inflates the HLO towards the 413 limit)
        self.nc = base.arrays.setdefault(
            "nc_fused", jnp.asarray(np.ascontiguousarray(nct), dtype))

    def _tile(self, a, rows):
        plan = self.base.plan
        if plan.linear_layout:
            return a.reshape(rows, plan.n_win, 8, 128)
        return a.reshape(rows, plan.n_win, 128, 8).transpose(1, 0, 3, 2)

    @property
    def traced(self):
        """jit-wrapped __call__. A nested jit's body is traced ONCE per
        (function identity, avals) and its jaxpr reused at every call
        site of the outer trace; without it, each of the V-cycle's up
        to 12 call sites per kernel instance re-traces the Mosaic
        lowering (~0.5-1 s per instance at tet-flagship depth) — the
        dominant share of the 264 s flagship-tet trace+lower
        (.golden/compile_split.py, VERDICT r03 #3)."""
        if self._traced is None:
            self._traced = jax.jit(self.__call__)
        return self._traced

    def __call__(self, q, old, fac, spill=None, arrays=None):
        base = self.base
        plan = base.plan
        arrays = base.arrays if arrays is None else arrays
        assert q.shape[1] == self.padded
        nch = _MATH["flux"][0]
        nw = plan.w4.shape[2]
        linear = bool(plan.linear_layout)
        X = q
        if linear:
            Xw = X.reshape(nch, plan.src_windows, 8, 128)
        else:
            Xw = X.reshape(nch, plan.src_windows, 128, 8).transpose(
                1, 0, 3, 2)
        old_w = self._tile(old, 5)
        fac_w = self._tile(fac[None], 1)
        spill_w = self._tile(spill, 5) if spill is not None else None
        whole_x = plan.src_windows * nch * 4096 <= WHOLE_X_LIMIT_BYTES

        buckets = base.buckets
        if len(buckets) == 1:
            out, inv = self._stage_dispatch(
                Xw, arrays, old_w, fac_w, spill_w, q.dtype, nch, nw,
                whole_x, linear, None, plan.n_win, plan.l_max, None)
            invalid = inv[0, 0]
        else:
            # depth-bucketed like PallasWindowFlux._dispatch: each
            # bucket statically unrolls to ITS depth and aliases the
            # partial output; per-bucket invalid counts sum. bs: the
            # element x map must be a single scalar read (see
            # PallasWindowFlux.__call__).
            bs = (None if whole_x
                  else jnp.take(arrays["base"], base.wmap_dev))
            out = None
            invalid = jnp.int32(0)
            for bstart, bcount, blmax in buckets:
                out, inv = self._stage_dispatch(
                    Xw, arrays, old_w, fac_w, spill_w, q.dtype, nch, nw,
                    whole_x, linear, bstart, bcount, blmax, out, bs)
                invalid = invalid + inv[0, 0]
        if linear:
            qnew = out.reshape(5, self.padded)
        else:
            qnew = out.transpose(1, 0, 3, 2).reshape(5, self.padded)
        return qnew, invalid

    def _stage_dispatch(self, Xw, arrays, old_w, fac_w, spill_w, qdtype,
                        nch, nw, whole_x, linear, start, count, l_max_b,
                        prev, bs=None):
        """One fused-stage pallas_call over `count` windows unrolled to
        l_max_b layers (start=None: plain full grid; else the depth
        bucket wmap[start:start+count] with `prev` aliased and bs the
        depth-sorted base offsets — see PallasWindowFlux._dispatch)."""
        base = self.base
        plan = base.plan
        S = plan.n_src
        have_spill = spill_w is not None
        bucketed = start is not None
        use_bs = bucketed and not whole_x
        kern = functools.partial(_window_fused_kernel, S, l_max_b, nch,
                                 nw, not whole_x, linear,
                                 not self.interpret, have_spill, start)

        if use_bs:
            assert bs is not None

            def body(bs_ref, *refs):
                kern(refs)
        else:
            def body(*refs):
                kern(refs)

        if bucketed:
            def widx(w, *sc):
                return sc[-1][start + w]    # wmap is the last scalar
        else:
            def widx(w, *_):
                return w

        if whole_x:
            x_spec = pl.BlockSpec(Xw.shape, lambda w, *_: (0, 0, 0, 0))
        elif use_bs:
            # single scalar read in the pl.Element map (see
            # PallasWindowFlux.__call__)
            if linear:
                x_spec = pl.BlockSpec(
                    (pl.Element(nch), pl.Element(plan.kw), pl.Element(8),
                     pl.Element(128)),
                    lambda w, bs_r, *sc: (0, bs_r[start + w], 0, 0))
            else:
                x_spec = pl.BlockSpec(
                    (pl.Element(plan.kw), pl.Element(nch), pl.Element(8),
                     pl.Element(128)),
                    lambda w, bs_r, *sc: (bs_r[start + w], 0, 0, 0))
        elif linear:
            x_spec = pl.BlockSpec(
                (pl.Element(nch), pl.Element(plan.kw), pl.Element(8),
                 pl.Element(128)),
                lambda w, base_r, *sc: (0, base_r[w], 0, 0))
        else:
            x_spec = pl.BlockSpec(
                (pl.Element(plan.kw), pl.Element(nch), pl.Element(8),
                 pl.Element(128)),
                lambda w, base_r, *sc: (base_r[w], 0, 0, 0))

        def tspec(rows):
            if linear:
                return pl.BlockSpec(
                    (rows, 1, 8, 128),
                    lambda w, *sc: (0, widx(w, *sc), 0, 0))
            return pl.BlockSpec(
                (1, rows, 8, 128),
                lambda w, *sc: (widx(w, *sc), 0, 0, 0))

        lb = max(1, l_max_b)     # zero-depth buckets fetch one inert layer
        in_specs = [
            x_spec,
            # full-depth lwins block: S is the sublane dim (see
            # PallasWindowFlux._dispatch)
            pl.BlockSpec((1, max(1, plan.l_max), S),
                         lambda w, *sc: (widx(w, *sc), 0, 0)),
            pl.BlockSpec((1, lb, 8, 128),
                         lambda w, *sc: (widx(w, *sc), 0, 0, 0)),
            pl.BlockSpec((1, lb, 8, 128),
                         lambda w, *sc: (widx(w, *sc), 0, 0, 0)),
            pl.BlockSpec((1, lb, 8, 128),
                         lambda w, *sc: (widx(w, *sc), 0, 0, 0)),
            pl.BlockSpec((1, lb, nw, 8, 128),
                         lambda w, *sc: (widx(w, *sc), 0, 0, 0, 0)),
            tspec(11),
            tspec(5),
            tspec(1),
        ]
        args = [arrays["base"], arrays["nl"], arrays["own"]]
        nsp = 3
        if bucketed:
            args.append(base.wmap_dev)
            nsp = 4
        if use_bs:
            args.insert(0, bs)
            nsp = 5
        args += [Xw, arrays["lwins"], arrays["wsel"], arrays["ci"],
                 arrays["rs"], arrays["w4"],
                 arrays.get("nc_fused", self.nc), old_w, fac_w]
        if have_spill:
            in_specs.append(tspec(5))
            args.append(spill_w)
        aliases = {}
        if prev is not None:
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            args.append(prev)
            aliases = {len(args) - 1: 0}
        from jax.experimental.pallas import tpu as pltpu
        return pl.pallas_call(
            body,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=nsp,
                grid=(count,),
                in_specs=in_specs,
                out_specs=(
                    tspec(5),
                    pl.BlockSpec((1, 1), lambda w, *_: (0, 0),
                                 memory_space=pltpu.SMEM),
                ),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((5, plan.n_win, 8, 128) if linear
                                     else (plan.n_win, 5, 8, 128),
                                     qdtype),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ),
            input_output_aliases=aliases,
            interpret=self.interpret,
            compiler_params=None if self.interpret else _compiler_params(),
        )(*args)


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
                 mode: str | None = None, bucket: bool = True,
                 buckets=None):
        self.plan = plan
        self.num_nodes = num_nodes
        self.padded = plan.padded_nodes           # OWNER/output lanes
        self.padded_in = plan.src_windows * WIN   # neighbor/input lanes
        self.dtype = jnp.dtype(dtype)
        self.interpret = interpret
        self.mode = mode or ("rw" if rw else "flux")
        self._traced = None
        # depth buckets (see _depth_buckets): interpret mode keeps the
        # fori_loop single dispatch; callers that swap in plan arrays
        # for a DIFFERENT plan (the sharded per-shard template) must
        # pass bucket=False — the bucket structure is baked from THIS
        # plan's layer_count at trace time.
        if buckets is not None:
            # explicit shared bucket structure (shared_depth_buckets):
            # the depth-sorted wmap is PER-SHARD data and must arrive
            # via arrays["wmap"] at call time. Honored in interpret
            # mode too so the CPU CI runs the production dispatch.
            self.buckets = list(buckets)
            self.wmap_dev = None
        elif bucket and not interpret:
            order, self.buckets = _depth_buckets(plan.layer_count)
            # host constant on purpose: a device-resident closure array
            # is fetched back at every lowering (~5 s through the
            # tunnel); 4-9 KB of i32 embeds into the HLO for free
            self.wmap_dev = np.asarray(order, np.int32)
        else:
            self.buckets = [(0, plan.n_win, plan.l_max)]
            self.wmap_dev = None
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


    @property
    def traced(self):
        """jit-wrapped __call__. A nested jit's body is traced ONCE per
        (function identity, avals) and its jaxpr reused at every call
        site of the outer trace; without it, each of the V-cycle's up
        to 12 call sites per kernel instance re-traces the Mosaic
        lowering (~0.5-1 s per instance at tet-flagship depth) — the
        dominant share of the 264 s flagship-tet trace+lower
        (.golden/compile_split.py, VERDICT r03 #3)."""
        if self._traced is None:
            self._traced = jax.jit(self.__call__)
        return self._traced

    def __call__(self, q, arrays=None):
        plan = self.plan
        P = self.padded
        arrays = self.arrays if arrays is None else arrays
        assert q.shape[1] == self.padded_in, (q.shape, self.padded_in)
        nch, math, complete = _MATH[self.mode]
        nw = self.plan.w4.shape[2]
        linear = bool(plan.linear_layout)
        # all modes consume the raw (5, Pin) state — flux completes the
        # primitive channels in-kernel (_complete8)
        X = q
        if linear:
            # tile-interleaved mesh: the tile layout IS the memory
            # layout — operand and result are pure reshapes
            Xw = X.reshape(nch, plan.src_windows, 8, 128)
        else:
            # node j -> (win j//1024, row j%8, lane (j//8)%128)
            Xw = X.reshape(nch, plan.src_windows, 128, 8).transpose(
                1, 0, 3, 2)

        S = plan.n_src
        # Whole-X VMEM residency is fastest to compile and run, but
        # breaks down at multi-million-node meshes (the 8M-edge mesh's
        # 76 MB state crashed the Mosaic compile helper). Above a
        # comfortable threshold, switch to element-granular kw-wide
        # neighborhood blocks (pl.Element starts from the scalar-
        # prefetched base) — same kernel body, ~24x slower compiles,
        # so only when needed.
        whole_x = plan.src_windows * nch * 4096 <= WHOLE_X_LIMIT_BYTES
        if len(self.buckets) == 1:
            out = self._dispatch(Xw, arrays, nch, math, complete, nw,
                                 whole_x, linear, None, plan.n_win,
                                 plan.l_max, None)
        else:
            # depth-bucketed: one dispatch per bucket, each statically
            # unrolled only to ITS depth; later buckets alias the
            # partial output (disjoint window sets). Element-blocked X
            # needs the depth-SORTED base offsets (one tiny in-jit
            # gather): the pl.Element index map must be a SINGLE scalar
            # read — base[wmap[start+w]] deterministically aborts the
            # chip for high-offset window pairs (capacity-scale 8M-edge
            # mesh, .golden/bigwin_bisect3.py), bs[start+w] does not.
            wmap = arrays.get("wmap", self.wmap_dev)
            assert wmap is not None, \
                "explicit-bucket kernels need arrays['wmap']"
            bs = (None if whole_x
                  else jnp.take(arrays["base"], wmap))
            out = None
            for bstart, bcount, blmax in self.buckets:
                out = self._dispatch(Xw, arrays, nch, math, complete,
                                     nw, whole_x, linear, bstart,
                                     bcount, blmax, out, bs, wmap)
        if linear:
            return out.reshape(5, P)
        return out.transpose(1, 0, 3, 2).reshape(5, P)

    def _dispatch(self, Xw, arrays, nch, math, complete, nw, whole_x,
                  linear, start, count, l_max_b, prev, bs=None,
                  wmap=None):
        """One pallas_call over `count` windows unrolled to l_max_b
        layers. start=None: the plain full-grid dispatch. start=int:
        windows wmap[start:start+count] of the depth-sorted order, with
        `prev` (the previous bucket's partial output) aliased to the
        output so untouched windows keep their values; bs = the
        depth-sorted base offsets (base[wmap]) — required when
        element-blocked, see __call__."""
        plan = self.plan
        S = plan.n_src
        bucketed = start is not None
        use_bs = bucketed and not whole_x
        kernel = functools.partial(_window_kernel, S, l_max_b, nch,
                                   math, complete, nw, not whole_x,
                                   linear, not self.interpret, start)
        if use_bs:
            assert bs is not None
            body = lambda bs_ref, *refs: kernel(*refs)  # noqa: E731
        else:
            body = kernel

        if bucketed:
            def widx(w, *sc):
                return sc[-1][start + w]    # wmap is the last scalar
        else:
            def widx(w, *_):
                return w

        if whole_x:
            x_spec = pl.BlockSpec(Xw.shape, lambda w, *_: (0, 0, 0, 0))
        elif use_bs:
            # single scalar read in the pl.Element map (see __call__)
            if linear:
                x_spec = pl.BlockSpec(
                    (pl.Element(nch), pl.Element(plan.kw), pl.Element(8),
                     pl.Element(128)),
                    lambda w, bs_r, *sc: (0, bs_r[start + w], 0, 0))
            else:
                x_spec = pl.BlockSpec(
                    (pl.Element(plan.kw), pl.Element(nch), pl.Element(8),
                     pl.Element(128)),
                    lambda w, bs_r, *sc: (bs_r[start + w], 0, 0, 0))
        elif linear:
            x_spec = pl.BlockSpec(
                (pl.Element(nch), pl.Element(plan.kw), pl.Element(8),
                 pl.Element(128)),
                lambda w, base, *sc: (0, base[w], 0, 0))
        else:
            x_spec = pl.BlockSpec(
                (pl.Element(plan.kw), pl.Element(nch), pl.Element(8),
                 pl.Element(128)),
                lambda w, base, *sc: (base[w], 0, 0, 0))
        if linear:
            out_spec = pl.BlockSpec(
                (5, 1, 8, 128), lambda w, *sc: (0, widx(w, *sc), 0, 0))
            out_shape = jax.ShapeDtypeStruct((5, plan.n_win, 8, 128),
                                             self.dtype)
        else:
            out_spec = pl.BlockSpec(
                (1, 5, 8, 128), lambda w, *sc: (widx(w, *sc), 0, 0, 0))
            out_shape = jax.ShapeDtypeStruct((plan.n_win, 5, 8, 128),
                                             self.dtype)
        # a zero-depth bucket's kernel never reads the layer arrays
        # (the l_max == 0 guard in the kernels), but a 0-size block dim
        # is invalid — fetch one inert layer instead
        lb = max(1, l_max_b)
        in_specs = [
            x_spec,
            # full-depth block: S lands in the sublane dim, so a
            # truncated depth violates Mosaic's 8-divisibility rule —
            # and the whole slab is l_max x S i32, not worth slicing
            pl.BlockSpec((1, max(1, plan.l_max), S),
                         lambda w, *sc: (widx(w, *sc), 0, 0)),
            pl.BlockSpec((1, lb, 8, 128),
                         lambda w, *sc: (widx(w, *sc), 0, 0, 0)),
            pl.BlockSpec((1, lb, 8, 128),
                         lambda w, *sc: (widx(w, *sc), 0, 0, 0)),
            pl.BlockSpec((1, lb, 8, 128),
                         lambda w, *sc: (widx(w, *sc), 0, 0, 0)),
            pl.BlockSpec((1, lb, nw, 8, 128),
                         lambda w, *sc: (widx(w, *sc), 0, 0, 0, 0)),
        ]
        args = [arrays["base"], arrays["nl"], arrays["own"]]
        nsp = 3
        if bucketed:
            args.append(self.wmap_dev if wmap is None else wmap)
            nsp = 4
        if use_bs:
            args.insert(0, bs)
            nsp = 5
        args += [Xw, arrays["lwins"], arrays["wsel"], arrays["ci"],
                 arrays["rs"], arrays["w4"]]
        aliases = {}
        if prev is not None:
            # untouched HBM carry of the earlier buckets' windows
            in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
            args.append(prev)
            aliases = {len(args) - 1: 0}
        return pl.pallas_call(
            body,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=nsp,
                grid=(count,),
                in_specs=in_specs,
                out_specs=out_spec,
            ),
            out_shape=out_shape,
            input_output_aliases=aliases,
            interpret=self.interpret,
            compiler_params=None if self.interpret else _compiler_params(),
        )(*args)
