"""Pallas TPU kernel: fused shift-decomposition internal-edge flux.

The XLA shift path (prep/shift.py) evaluates one span at a time, and each
span's pass streams the state and a flux array through HBM. This kernel
fuses ALL spans into one pass over node blocks:

  - layout: variable-major (8, N) — 5 conserved variables padded to 8
    sublane rows, nodes in lanes (full 128-lane utilisation);
  - grid over node blocks of BN lanes; per block the kernel sees a halo'd
    window of the state (previous/current/next block views, BN >= max
    span), so every span's q_a/q_b/weight access is a STATIC lane slice;
  - per-span edge values are computed on (8, BN + span) windows and
    accumulated into a VMEM scratch accumulator (+val at the a-side lane,
    -val shifted by the span for the b-side); the flux block is written
    to HBM exactly once.

Per-block redundant compute is (1 + span/BN) <= 2x per span — traded for
never materialising per-span value arrays or re-reading the flux array
from HBM (the XLA path's 2 x D extra N-sized streams).

The span list is static (mesh preprocessing), so everything in the kernel
body unrolls to static slices: no gathers, no scatters, no dynamic
indexing anywhere.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import GAMMA, SMOOTHING_COEFFICIENT

ROWS = 8  # 5 conserved variables padded to a full sublane tile


def _edge_val(qa, qb, ew):
    """Per-edge flux value, variable-major on (ROWS, L) windows; rows
    0..4 = density, momentum x/y/z, density-energy (same math as
    ops.tops.t_internal_edge_flux, open-coded for the kernel)."""
    def prims(q):
        rho = q[0]
        mx, my, mz = q[1], q[2], q[3]
        pe = q[4]
        inv = 1.0 / rho
        vx, vy, vz = mx * inv, my * inv, mz * inv
        ssq = vx * vx + vy * vy + vz * vz
        p = (GAMMA - 1.0) * (pe - 0.5 * rho * ssq)
        sos = jnp.sqrt(GAMMA * p * inv)
        return (vx, vy, vz), jnp.sqrt(ssq), p, sos

    (vax, vay, vaz), sa, pa, ca = prims(qa)
    (vbx, vby, vbz), sb, pb, cb = prims(qb)
    ex, ey, ez = ew[0], ew[1], ew[2]
    ewt = jnp.sqrt(ex * ex + ey * ey + ez * ez)
    factor = (-ewt * (SMOOTHING_COEFFICIENT * 0.5)) * (sa + sb + ca + cb)
    fx, fy, fz = -0.5 * ex, -0.5 * ey, -0.5 * ez

    # directional flux tensor sums F_a + F_b, contracted with the normal.
    # F[d, 0] = mom_d ; F[d, 1+k] = vel_k*mom_d + p*delta ; F[d, 4] =
    # vel_d*(pe + p)
    def tensor_rows(q, vel, p):
        mx, my, mz = q[1], q[2], q[3]
        de_p = q[4] + p
        vx, vy, vz = vel
        return (
            # density row: momentum
            (mx, my, mz),
            # momentum-x row over directions d: vx*m_d + p on d==x
            (vx * mx + p, vx * my, vx * mz),
            (vy * mx, vy * my + p, vy * mz),
            (vz * mx, vz * my, vz * mz + p),
            (vx * de_p, vy * de_p, vz * de_p),
        )

    ta = tensor_rows(qa, (vax, vay, vaz), pa)
    tb = tensor_rows(qb, (vbx, vby, vbz), pb)

    rows = []
    for v in range(5):
        central = (fx * (ta[v][0] + tb[v][0])
                   + fy * (ta[v][1] + tb[v][1])
                   + fz * (ta[v][2] + tb[v][2]))
        rows.append(factor * (qa[v] - qb[v]) + central)
    rows.append(jnp.zeros_like(rows[0]))
    rows.append(jnp.zeros_like(rows[0]))
    rows.append(jnp.zeros_like(rows[0]))
    return jnp.stack(rows, axis=0)


def _kernel(deltas, bn, q_prev, q_cur, q_next, w_prev, w_cur, out_ref):
    """Window lane c <-> padded-node lane k*BN + c (k = grid index =
    previous padded block); the current output block is window lanes
    [bn, 2bn). All slice starts/lengths below are Python constants."""
    h = bn
    win = jnp.concatenate([q_prev[:], q_cur[:], q_next[:]], axis=1)
    wwin = jnp.concatenate([w_prev[:], w_cur[:]], axis=2)  # (D,4,2BN)
    acc = jnp.zeros_like(out_ref)
    for di, d in enumerate(deltas):
        # per-span edge values for a-side lanes [h-d, h+bn): length bn+d
        qa = win[:, h - d: h + bn]
        qb = win[:, h: h + bn + d]
        ew = wwin[di, :3, bn - d: 2 * bn]
        val = _edge_val(qa, qb, ew)
        # a-side: +val into lane p=a  -> val index p-h+d in [d, bn+d)
        # b-side: -val[p-d] for lane p -> val index p-h  in [0, bn)
        acc = acc + val[:, d: bn + d] - val[:, 0: bn]
    out_ref[...] = acc


def pallas_shift_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        return True
    except ImportError:
        return False


@functools.partial(jax.jit, static_argnames=("deltas", "bn", "interpret"))
def _call(q_pad, w_pad, deltas, bn, interpret):
    from jax.experimental import pallas as pl

    rows, total = q_pad.shape
    k = total // bn - 2  # number of real blocks (one pad block each side)
    d_count = w_pad.shape[0]

    out = pl.pallas_call(
        functools.partial(_kernel, deltas, bn),
        grid=(k,),
        in_specs=[
            pl.BlockSpec((rows, bn), lambda i: (0, i)),      # prev
            pl.BlockSpec((rows, bn), lambda i: (0, i + 1)),  # cur
            pl.BlockSpec((rows, bn), lambda i: (0, i + 2)),  # next
            pl.BlockSpec((d_count, 4, bn), lambda i: (0, 0, i)),
            pl.BlockSpec((d_count, 4, bn), lambda i: (0, 0, i + 1)),
        ],
        out_specs=pl.BlockSpec((rows, bn), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((rows, k * bn), q_pad.dtype),
        interpret=interpret,
    )(q_pad, q_pad, q_pad, w_pad, w_pad)
    return out


class PallasShiftFlux:
    """Prepared kernel for one mesh level.

    Usage: plan = build_shift_plan(lvl); pf = PallasShiftFlux(plan, N);
    flux_t = pf(q_t) with q_t (5, N) variable-major state. Spill edges
    (plan.spill_*) are NOT handled here — the caller adds them via the
    segment path, as the XLA shift mode does."""

    def __init__(self, deltas, weights, num_nodes, dtype=jnp.float32,
                 block_lanes: int | None = None, interpret: bool = False):
        self.deltas = tuple(int(d) for d in deltas)
        self.num_nodes = num_nodes
        dmax = max(self.deltas) if self.deltas else 1
        bn = block_lanes or max(512, -(-dmax // 128) * 128)
        assert bn % 128 == 0 and bn >= dmax
        self.bn = bn
        k = -(-num_nodes // bn)
        self.padded = k * bn
        self.interpret = interpret
        # weights: (D, 4, padded + 2*bn) with one pad block each side,
        # rows 0..2 = normal components, row 3 spare (sublane padding)
        D = max(1, len(self.deltas))
        w = np.zeros((D, 4, self.padded + 2 * bn), dtype=dtype)
        for di, (d, wd) in enumerate(zip(self.deltas, weights)):
            w[di, :3, bn:bn + wd.shape[0]] = np.asarray(wd).T
        self.w_pad = jnp.asarray(w)

    def __call__(self, q_t):
        """q_t: (5, N) -> (5, N) internal-edge flux accumulation."""
        rows = jnp.zeros((ROWS - q_t.shape[0], q_t.shape[1]), q_t.dtype)
        q = jnp.concatenate([q_t, rows], axis=0)
        # Node padding lanes must hold a PHYSICAL state: their weights are
        # zero, but NaNs from sqrt(negative pressure) would still poison
        # factor * 0. Quiescent gas (rho=1, v=0, E=1) is safe.
        pad_state = jnp.array([1, 0, 0, 0, 1, 0, 0, 0],
                              q_t.dtype)[:, None]
        pad_total = self.padded + 2 * self.bn - self.num_nodes
        left = jnp.broadcast_to(pad_state, (ROWS, self.bn))
        right = jnp.broadcast_to(pad_state,
                                 (ROWS, pad_total - self.bn))
        q_pad = jnp.concatenate([left, q, right], axis=1)
        out = _call(q_pad, self.w_pad, self.deltas, self.bn,
                    self.interpret)
        return out[:q_t.shape[0], :self.num_nodes]


def pallas_shift_flux(plan, num_nodes, dtype=jnp.float32,
                      interpret: bool = False) -> PallasShiftFlux:
    return PallasShiftFlux(plan.deltas, plan.weights, num_nodes,
                           dtype=dtype, interpret=interpret)
