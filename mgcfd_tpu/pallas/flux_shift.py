"""Pallas TPU kernel: fused shift-decomposition internal-edge flux.

The XLA shift path (prep/shift.py) evaluates one span at a time, and each
span's pass streams the state and a flux array through HBM. This kernel
fuses ALL spans into one pass over node blocks:

  - layout: variable-major (5, N) — nodes in lanes (full 128-lane
    utilisation), conserved variables in sublanes;
  - grid over node blocks of BN lanes; per block the kernel sees a halo'd
    window of the state (previous/current/next block views, BN >= max
    span), so every span's q_a/q_b/weight access is a STATIC lane slice;
  - boundary halos use CLAMPED index maps (prev = max(i-1, 0),
    next = min(i+1, k-1)) instead of physical pad blocks: the duplicated
    edge blocks hold physical state, and every lane a clamped window can
    contribute through carries a zero weight (edges off the ends of the
    node range do not exist), so the contribution vanishes exactly. This
    removes the per-call cost of materialising a (k+2)-block padded copy
    of the state — measured at ~0.7 ms/call on the v5e, 30x the kernel
    itself — leaving only a small tail concat (N -> k*BN lanes);
  - per-span edge values are computed on lane-ALIGNED windows of length
    BN + ceil128(span) starting at the aligned lane BN - ceil128(span),
    with the b-side state produced by a lane rotate (pltpu.roll) instead
    of an offset slice; accumulation into the output block is again a
    pair of aligned slices (one of them of a rotated value array).

Per-block redundant compute is (1 + ceil128(span)/BN) <= 2x per span —
traded for never materialising per-span value arrays or re-reading the
flux array from HBM (the XLA path's 2 x D extra N-sized streams).

Mosaic constraint that shaped this design (measured on the v5e): vector
concatenates require uniform lane offsets across operands, and slices at
non-128-multiple lane starts carry their offset into downstream ops, so
an earlier version that stacked rows of odd-offset (1, BN+span) vectors
failed lowering ("result/input offset mismatch on non-concat
dimension"). Everything below keeps slice starts and lengths at lane
multiples and uses rolls for the +-span shifts, so every intermediate is
an offset-0, aligned vector.

The span list is static (mesh preprocessing), so everything in the kernel
body unrolls to static slices and rotates: no gathers, no scatters, no
dynamic indexing anywhere.

Reference analogue: the internal-edge flux loop, the benchmark's raison
d'etre (/root/reference/src/Kernels/flux_loops.cpp:78-153 and
flux_kernel.elemfunc.c:18-229).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import GAMMA, SMOOTHING_COEFFICIENT

VARS = 5  # density, momentum x/y/z, density-energy


def _stage_channels(win):
    """(5, L) masked state window -> (8, L) channel stack [rho, mom x/y/z,
    E, pressure, speed+sos, 1/rho], computed ONCE per block. The per-span
    flux math then runs on channel slices/rolls with no divisions or
    square roots of its own — prims used to be recomputed per span per
    side (xprof measured the fused kernel 6.5x off its HBM roofline,
    almost all of it Newton div/sqrt chains inside the span loop).
    An (8, L) array tiles vregs exactly as densely as (5, L) (both round
    up to 8 sublanes), so the wider roll/slice operands cost nothing."""
    rho = win[0:1]
    mom = win[1:4]
    pe = win[4:5]
    inv = 1.0 / rho
    vel = mom * inv
    ssq = jnp.sum(vel * vel, axis=0, keepdims=True)
    p = (GAMMA - 1.0) * (pe - 0.5 * rho * ssq)
    s = jnp.sqrt(ssq) + jnp.sqrt(GAMMA * p * inv)
    return jnp.concatenate([win, p, s, inv], axis=0)


def _edge_val_ch(qa, qb, ew):
    """Per-edge flux value from (8, L) channel windows; ew rows =
    [|normal|, wx, wy, wz] (|normal| built once at init). Same channel
    math as ops.tops.t_internal_edge_flux / flux_window._flux_math, but
    expressed on sublane GROUPS: the signed-normal block sits at sublane
    offset 1, exactly matching the momentum rows qa[1:4], so every
    binary op pairs operands of one sublane offset and the bulk of the
    arithmetic runs on (5,L)/(3,L) groups. The earlier per-row 1-D
    formulation paid full 8-sublane vregs per row op — measured ~0.3 ms
    per flux evaluation on the flagship, vs ~free for this form
    (.golden/shift_body_bench.py)."""
    wm = ew[1:4]                          # (3,L), offset 1
    moma, momb = qa[1:4], qb[1:4]         # (3,L), offset 1
    pa, pb = qa[5:6], qb[5:6]
    wmo = jnp.sum(wm * moma, 0, keepdims=True)
    wmn = jnp.sum(wm * momb, 0, keepdims=True)
    wvo = wmo * qa[7:8]
    wvn = wmn * qb[7:8]
    psum = pa + pb
    factor = ew[0:1] * (-0.5 * SMOOTHING_COEFFICIENT) * (qa[6:7] + qb[6:7])
    d5 = qa[:5] - qb[:5]
    cen123 = wvo * moma + wvn * momb + wm * psum
    cen0 = wmo + wmn
    cen4 = wvo * (qa[4:5] + pa) + wvn * (qb[4:5] + pb)
    central = jnp.concatenate([cen0, cen123, cen4], axis=0)
    return factor * d5 - 0.5 * central


def _edge_val_rw(qa, qb, ew):
    """Faithful indirect_rw twin value: identical operand windows and
    accumulate pattern to the flux value, near-zero arithmetic (the
    reference's data-movement-only roofline probe,
    indirect_rw_kernel.elemfunc.c:42-55). ew rows = [|w|, wx, wy, wz]."""
    e = ew[1:2] + ew[2:3] + ew[3:4]
    return qa[:5] + qb[:5] + e


def _lane_roll(x, shift, interpret):
    """Static lane rotate along the last axis. Compiled mode uses the
    native Mosaic rotate; interpret mode falls back to jnp.roll."""
    if interpret:
        return jnp.roll(x, shift, axis=-1)
    from jax.experimental.pallas import tpu as pltpu
    # jnp.int32, not a bare Python int: under jax_enable_x64 the shift
    # weak-types to i64, which tpu.dynamic_rotate rejects
    return pltpu.roll(x, jnp.int32(shift % x.shape[-1]),
                      axis=x.ndim - 1)


def _ceil128(d: int) -> int:
    return -(-d // 128) * 128


def _shifted_window(x, start, L, interpret):
    """x[:, start:start+L] for an arbitrary static start. Mosaic slices
    must start at lane multiples, so the misaligned remainder is applied
    with a lane rotate — but only over an aligned (L+128)-wide LOCAL
    window when it fits (the original formulation rotated the entire
    operand per span; on a (8, 3*bn) block window that moved ~3x the
    lanes actually consumed, and xprof showed the fused kernel still
    ~4x off its HBM roofline after the prims hoist)."""
    W = x.shape[-1]
    r = start % 128
    if r == 0:
        return x[:, start:start + L]
    a0 = start - r
    if a0 + L + 128 <= W:
        return _lane_roll(x[:, a0:a0 + L + 128], -r, interpret)[:, :L]
    # tail-clipped fallback: rotate the whole operand by the remainder
    return _lane_roll(x, -r, interpret)[:, a0:a0 + L]


def _kernel(deltas, bn, num_nodes, interpret, rw, q_prev, q_cur, q_next,
            w_prev, w_cur, out_ref):
    """Window lane c <-> node (i-1)*BN + c for grid step i (clamped at
    the boundary blocks, where off-range lanes are zero-weighted); the
    current output block is window lanes [bn, 2bn). All slice starts /
    lengths below are Python constants at lane multiples; span shifts
    are lane rotates."""
    from jax.experimental import pallas as pl

    h = bn
    win = jnp.concatenate([q_prev[:], q_cur[:], q_next[:]], axis=1)
    # bfloat16 policy: bf16 is a STORAGE format here — HBM traffic is
    # halved (the entire point on a memory-bound kernel) but all VPU
    # arithmetic runs in f32 (bf16's 8 mantissa bits are too coarse for
    # the dissipation factor, and Mosaic's dynamic_rotate has no bf16
    # lowering). Casts happen on VMEM-resident tiles, not in HBM.
    if win.dtype == jnp.bfloat16:
        win = win.astype(jnp.float32)
    # lanes outside the real node range [0, num_nodes) are substituted
    # with quiescent gas: their weights are zero, but the caller's tail
    # pad (and the clamped boundary windows) may hold arbitrary values,
    # and a NaN from sqrt(negative pressure) would poison factor * 0
    node = (jax.lax.broadcasted_iota(jnp.int32, win.shape, 1)
            + (pl.program_id(0) - 1) * bn)
    row = jax.lax.broadcasted_iota(jnp.int32, win.shape, 0)
    quies = jnp.where((row == 0) | (row == 4), 1.0, 0.0).astype(win.dtype)
    win = jnp.where((node >= 0) & (node < num_nodes), win, quies)
    wwin = jnp.concatenate([w_prev[:], w_cur[:]], axis=2)  # (D,4,2BN)
    if wwin.dtype == jnp.bfloat16:
        wwin = wwin.astype(jnp.float32)
    src = win if rw else _stage_channels(win)
    acc = jnp.zeros(out_ref.shape, win.dtype)
    for di, d in enumerate(deltas):
        # edges whose a-side sits at window lane p need q[p], q[p+d],
        # w[p]; evaluate for p in the aligned range [s, s+L) which covers
        # the needed [h-d, h+bn)
        pad = _ceil128(d)
        s = h - pad
        L = bn + pad
        qa = src[:, s: s + L]
        qb = _shifted_window(src, s + d, L, interpret)   # src[p + d]
        ew = wwin[di, :, s: s + L]
        val = (_edge_val_rw if rw else _edge_val_ch)(qa, qb, ew)
        # a-side: +val at out lane p-h -> val index (p-s) = pad + (p-h)
        # b-side: -val[p-d-s] at out lane p-h -> the shifted window
        #         starting at pad-d (in [0, 128), so the local rotate
        #         covers it; no wrap: indices stay >= pad - d >= 0)
        acc = (acc + val[:, pad: pad + bn]
               - _shifted_window(val, pad - d, bn, interpret))
    out_ref[...] = acc.astype(out_ref.dtype)


def pallas_shift_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        return True
    except ImportError:
        return False


def _compiler_params():
    """Raise Mosaic's scoped-VMEM ceiling above the conservative 16 MB
    default: capacity-scale meshes (dmax ~17K -> bn 17408) peak ~22 MB
    of kernel stack, well within the v5e's physical VMEM — without this
    the 7.26M-edge flagship OOMs at compile ('Scoped allocation with
    size 21.61M and limit 16.00M')."""
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 2 ** 20)


@functools.partial(jax.jit,
                   static_argnames=("deltas", "bn", "num_nodes",
                                    "interpret", "rw"))
def _call(q_pad, w_pad, deltas, bn, num_nodes, interpret, rw=False):
    from jax.experimental import pallas as pl

    rows, total = q_pad.shape
    k = total // bn  # q_pad carries no halo blocks; clamped maps instead
    d_count = w_pad.shape[0]

    out = pl.pallas_call(
        functools.partial(_kernel, deltas, bn, num_nodes, interpret, rw),
        grid=(k,),
        in_specs=[
            # clamped halo: boundary blocks re-read the edge block; all
            # lanes they could contribute through are zero-weighted
            pl.BlockSpec((rows, bn),
                         lambda i: (0, jnp.maximum(i - 1, 0))),
            pl.BlockSpec((rows, bn), lambda i: (0, i)),
            pl.BlockSpec((rows, bn),
                         lambda i: (0, jnp.minimum(i + 1, k - 1))),
            # weights DO carry one zero pad block on each side, built
            # once at init: w lane (i*bn + p) pairs with window lane p
            pl.BlockSpec((d_count, 4, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((d_count, 4, bn), lambda i: (0, 0, i + 1)),
        ],
        out_specs=pl.BlockSpec((rows, bn), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((rows, k * bn), q_pad.dtype),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(q_pad, q_pad, q_pad, w_pad, w_pad)
    return out


class PallasShiftFlux:
    """Prepared kernel for one mesh level.

    Usage: plan = build_shift_plan(lvl); pf = PallasShiftFlux(plan, N);
    flux_t = pf(q_t) with q_t (5, N) variable-major state. Spill edges
    (plan.spill_*) are NOT handled here — the caller adds them via the
    segment path, as the XLA shift mode does."""

    def __init__(self, deltas, weights, num_nodes, dtype=jnp.float32,
                 block_lanes: int | None = None, interpret: bool = False,
                 rw: bool = False):
        self.rw = rw  # indirect_rw twin: same traffic, near-zero math
        self.deltas = tuple(int(d) for d in deltas)
        self.num_nodes = num_nodes
        dmax = max(self.deltas) if self.deltas else 1
        # default block is a whole number of 1024-node vreg windows so
        # the lane-padded state width (k * bn) is shared with the
        # windowed-gather MG transfer kernels (prep/window.WIN) — they
        # operate on the same padded arrays with no relayout
        bn = block_lanes or max(1024, -(-dmax // 1024) * 1024)
        assert bn % 128 == 0 and bn >= dmax
        self.bn = bn
        k = -(-num_nodes // bn)
        self.padded = k * bn
        self.interpret = interpret
        # weights: (D, 4, padded + 2*bn) with one zero block each side
        # (w lane bn + node; the zero blocks are what make the clamped
        # state windows contribute nothing at the boundaries), row 0 =
        # |normal| precomputed once (removes a sqrt Newton chain per
        # span per block per call; FLUX_PRECOMPUTE_EDGE_WEIGHTS
        # semantics, euler3d:354-362), rows 1..3 = normal components —
        # at sublane offset 1 to match the momentum rows of the channel
        # stack (see _edge_val_ch)
        D = max(1, len(self.deltas))
        w = np.zeros((D, 4, self.padded + 2 * bn), dtype=dtype)
        for di, (d, wd) in enumerate(zip(self.deltas, weights)):
            wd = np.asarray(wd)
            w[di, 0, bn:bn + wd.shape[0]] = np.sqrt((wd * wd).sum(1))
            w[di, 1:4, bn:bn + wd.shape[0]] = wd.T
        self.w_pad = jnp.asarray(w)
        # tail pad lanes [N, padded) must hold a PHYSICAL state: their
        # weights are zero, but NaNs from sqrt(negative pressure) would
        # still poison factor * 0. Quiescent gas (rho=1, v=0, E=1).
        self._pad_state = jnp.array([1, 0, 0, 0, 1], dtype)[:, None]
        self._traced = None

    @property
    def traced(self):
        """jit-wrapped __call__: traced once per avals and reused at
        every call site of the outer trace (see
        flux_window.PallasWindowFlux.traced)."""
        if self._traced is None:
            import jax
            self._traced = jax.jit(self.__call__)
        return self._traced

    def __call__(self, q_t):
        """q_t: (5, padded) lane-padded state -> (5, padded) internal-edge
        flux (tail lanes exactly zero). Also accepts the unpadded (5, N)
        layout and returns (5, N) — but that path materialises a
        standalone pad + slice per call (~25x a fused copy on the v5e;
        concat/pad as an XLA fusion ROOT does not stream) and exists for
        standalone/benchmark use. The solver carries the state
        lane-padded so the kernel operand needs no per-call construction
        (solver/solver.py num_lanes)."""
        n_in = q_t.shape[1]
        if n_in == self.padded:
            return _call(q_t, self.w_pad, self.deltas, self.bn,
                         self.num_nodes, self.interpret, self.rw)
        tail = self.padded - self.num_nodes
        if tail:
            filler = jnp.broadcast_to(
                self._pad_state.astype(q_t.dtype), (VARS, tail))
            q_pad = jnp.concatenate([q_t, filler], axis=1)
        else:
            q_pad = q_t
        out = _call(q_pad, self.w_pad, self.deltas, self.bn,
                    self.num_nodes, self.interpret, self.rw)
        return out[:, :self.num_nodes]


def pallas_shift_flux(plan, num_nodes, dtype=jnp.float32,
                      interpret: bool = False) -> PallasShiftFlux:
    return PallasShiftFlux(plan.deltas, plan.weights, num_nodes,
                           dtype=dtype, interpret=interpret)


# ---------------------------------------------------------------------------
# fused RK stage: flux + dense boundary/wall + time_step + invalid count
# in ONE kernel pass (the reference's per-stage sequence,
# euler3d_cpu_double.cpp:383-512, collapses to a single device launch).
# The separate-kernel pipeline was measured launch-gap-bound on the v5e
# (~4.1 ms device-busy vs 12.0 ms wall per cycle, BASELINE.md): each RK
# stage ran flux kernel -> spill segment op -> dense bd/wall fusion ->
# time_step fusion -> invalid reduce, five dispatches streaming the state
# five times. Here one grid pass reads the halo'd state window once and
# writes the UPDATED state, with the invalid count accumulated into an
# SMEM scalar across grid steps (sequential TPU grid).
# ---------------------------------------------------------------------------


def _bw_flux(qc, nc):
    """Dense aggregated boundary+wall flux on the current block's
    (8, bn) channel window (ops.tops.t_dense_boundary_wall_flux
    semantics, open-coded): nc rows 0:3 = summed boundary normals,
    3:6 = summed wall normals, 6:11 = precomputed far-field wall
    constant. Pressure/velocity come from the per-block channel stack
    (no divisions here)."""
    mx, my, mz = qc[1], qc[2], qc[3]
    p, inv = qc[5], qc[7]
    vx, vy, vz = mx * inv, my * inv, mz * inv
    bx, by, bz = nc[0], nc[1], nc[2]
    hx, hy, hz = 0.5 * nc[3], 0.5 * nc[4], 0.5 * nc[5]
    de_p = qc[4] + p
    rows = (
        hx * mx + hy * my + hz * mz,
        bx * p + hx * (vx * mx + p) + hy * (vx * my) + hz * (vx * mz),
        by * p + hx * (vy * mx) + hy * (vy * my + p) + hz * (vy * mz),
        bz * p + hx * (vz * mx) + hy * (vz * my) + hz * (vz * mz + p),
        hx * (vx * de_p) + hy * (vy * de_p) + hz * (vz * de_p),
    )
    return jnp.stack([rows[v] + nc[6 + v] for v in range(5)], axis=0)


def _fused_kernel(deltas, bn, num_nodes, interpret, have_spill, refs):
    """One RK stage on one node block. refs (in order): q windows
    (prev/cur/next), span weights (prev/cur), nc (node constants), old
    state block, fac (= step_factor / (RK+1-j)) block, [spill block],
    out state block, out invalid count (SMEM)."""
    from jax.experimental import pallas as pl

    if have_spill:
        (q_prev, q_cur, q_next, w_prev, w_cur, nc_ref, old_ref, fac_ref,
         spill_ref, out_ref, inv_ref) = refs
    else:
        (q_prev, q_cur, q_next, w_prev, w_cur, nc_ref, old_ref, fac_ref,
         out_ref, inv_ref) = refs
        spill_ref = None

    h = bn
    win = jnp.concatenate([q_prev[:], q_cur[:], q_next[:]], axis=1)
    # bf16 = storage format only: compute in f32 on VMEM tiles (see
    # _kernel above)
    f32 = jnp.float32
    bf16 = win.dtype == jnp.bfloat16
    if bf16:
        win = win.astype(f32)
    node = (jax.lax.broadcasted_iota(jnp.int32, win.shape, 1)
            + (pl.program_id(0) - 1) * bn)
    row = jax.lax.broadcasted_iota(jnp.int32, win.shape, 0)
    quies = jnp.where((row == 0) | (row == 4), 1.0, 0.0).astype(win.dtype)
    win = jnp.where((node >= 0) & (node < num_nodes), win, quies)
    wwin = jnp.concatenate([w_prev[:], w_cur[:]], axis=2)
    if bf16:
        wwin = wwin.astype(f32)
    ch = _stage_channels(win)
    acc = jnp.zeros(out_ref.shape, win.dtype)
    for di, d in enumerate(deltas):
        pad = _ceil128(d)
        s = h - pad
        L = bn + pad
        qa = ch[:, s: s + L]
        qb = _shifted_window(ch, s + d, L, interpret)
        ew = wwin[di, :, s: s + L]
        val = _edge_val_ch(qa, qb, ew)
        acc = (acc + val[:, pad: pad + bn]
               - _shifted_window(val, pad - d, bn, interpret))
    # dense boundary/wall on the current block (nc is zero on pad lanes)
    nc = nc_ref[:].astype(f32) if bf16 else nc_ref[:]
    acc = acc + _bw_flux(ch[:, h:2 * h], nc)
    if spill_ref is not None:
        acc = acc + (spill_ref[:].astype(f32) if bf16 else spill_ref[:])
    old = old_ref[:].astype(f32) if bf16 else old_ref[:]
    fac = fac_ref[:].astype(f32) if bf16 else fac_ref[:]
    qnew = old + fac * acc
    out_ref[...] = qnew.astype(out_ref.dtype)
    # invalid-state count (validation.cpp:107-138): NaN/Inf anywhere,
    # negative density or energy; pad lanes hold finite far-field gas
    # count in f32, not ints: with jax_enable_x64 integer reductions
    # route through an i64 convert that Mosaic cannot lower; f32 counts
    # are exact far beyond any block size (< 2^24)
    one = jnp.float32(1.0)
    zero32 = jnp.float32(0.0)
    bad_f = (jnp.sum(jnp.where(jnp.isfinite(qnew), zero32, one))
             + jnp.sum(jnp.where(qnew[0] < 0, one, zero32))
             + jnp.sum(jnp.where(qnew[4] < 0, one, zero32)))
    bad = bad_f.astype(jnp.int32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        inv_ref[0, 0] = 0

    inv_ref[0, 0] += bad


@functools.partial(jax.jit,
                   static_argnames=("deltas", "bn", "num_nodes",
                                    "interpret"))
def _fused_call(q_pad, w_pad, nc, old, fac, spill, deltas, bn, num_nodes,
                interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, total = q_pad.shape
    k = total // bn
    d_count = w_pad.shape[0]
    have_spill = spill is not None

    kern = functools.partial(_fused_kernel, deltas, bn, num_nodes,
                             interpret, have_spill)

    def body(*refs):
        kern(refs)

    in_specs = [
        pl.BlockSpec((rows, bn), lambda i: (0, jnp.maximum(i - 1, 0))),
        pl.BlockSpec((rows, bn), lambda i: (0, i)),
        pl.BlockSpec((rows, bn), lambda i: (0, jnp.minimum(i + 1, k - 1))),
        pl.BlockSpec((d_count, 4, bn), lambda i: (0, 0, i)),
        pl.BlockSpec((d_count, 4, bn), lambda i: (0, 0, i + 1)),
        pl.BlockSpec((11, bn), lambda i: (0, i)),
        pl.BlockSpec((rows, bn), lambda i: (0, i)),
        pl.BlockSpec((1, bn), lambda i: (0, i)),
    ]
    args = [q_pad, q_pad, q_pad, w_pad, w_pad, nc, old, fac]
    if have_spill:
        in_specs.append(pl.BlockSpec((rows, bn), lambda i: (0, i)))
        args.append(spill)
    out, inv = pl.pallas_call(
        body,
        grid=(k,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((rows, bn), lambda i: (0, i)),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, k * bn), q_pad.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=None if interpret else _compiler_params(),
    )(*args)
    return out, inv[0, 0]


class PallasFusedStage:
    """One fused RK stage for one mesh level (shift-decomposition spans).

    __call__(q, old, fac, spill=None) with lane-padded variable-major
    arrays: q/old (5, padded), fac (padded,) = step_factor/(RK+1-j),
    spill (5, padded) precomputed spill-edge accumulation or None.
    Returns (q_next, invalid_count). The caller supplies the per-visit
    step factor (its global min needs a cross-block reduction) and the
    spill segment stream; everything else of the reference's stage
    sequence happens inside the kernel."""

    def __init__(self, base: PallasShiftFlux, bd_normal, wall_normal,
                 wall_const, dtype=jnp.float32):
        num_nodes = base.num_nodes
        self.deltas = base.deltas
        self.bn = base.bn
        self.padded = base.padded
        self.num_nodes = num_nodes
        self.interpret = base.interpret
        self.w_pad = base.w_pad   # shared device buffer with the base kernel
        nc = np.zeros((11, self.padded), dtype=dtype)
        nc[0:3, :num_nodes] = np.asarray(bd_normal)[:, :num_nodes]
        nc[3:6, :num_nodes] = np.asarray(wall_normal)[:, :num_nodes]
        nc[6:11, :num_nodes] = np.asarray(wall_const)[:, :num_nodes]
        self.nc = jnp.asarray(nc)
        self._traced = None

    @property
    def traced(self):
        """jit-wrapped __call__: traced once per avals and reused at
        every call site of the outer trace (see
        flux_window.PallasWindowFlux.traced)."""
        if self._traced is None:
            import jax
            self._traced = jax.jit(self.__call__)
        return self._traced

    def __call__(self, q, old, fac, spill=None):
        assert q.shape[1] == self.padded
        return _fused_call(q, self.w_pad, self.nc, old, fac[None],
                           spill, self.deltas, self.bn, self.num_nodes,
                           self.interpret)
