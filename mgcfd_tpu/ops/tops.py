"""Transposed (variable-major) kernels: state as (NVAR, N).

TPU physical layout tiles the two minor dimensions to (8, 128); a
node-major (N, 5) float32 array is padded to 128 lanes — up to 25x wasted
HBM footprint and bandwidth on every materialised state array. The
variable-major layout (5, N) puts nodes in lanes (5 sublanes pad to 8:
1.6x) and turns the shift-decomposition flux into pure full-bandwidth
lane-dimension slices.

Same math as ops/physics.py + ops/flux.py, axes swapped. Used by the
solver when SolverConfig.transposed is on (requires accumulate='shift';
the indexed paths keep node-major gathers).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.constants import GAMMA, RK, SMOOTHING_COEFFICIENT


def t_primitives(q):
    """q: (5, ...) -> dict of (...) primitives.

    One reciprocal of rho feeds vel (3 components) and sos: TPUs have no
    hardware divide (each fp division is a Newton-Raphson chain on the
    VPU), so sharing 1/rho cuts four division chains to one per call in
    the hottest code path. Differs from a literal mom/rho by <=1 ulp."""
    rho = q[0]
    mom = q[1:4]
    energy = q[4]
    inv_rho = 1.0 / rho
    vel = mom * inv_rho[None]
    speed_sqd = jnp.sum(vel * vel, axis=0)
    pressure = (GAMMA - 1.0) * (energy - 0.5 * rho * speed_sqd)
    sos = jnp.sqrt(GAMMA * pressure * inv_rho)
    return {"rho": rho, "mom": mom, "vel": vel, "energy": energy,
            "speed_sqd": speed_sqd, "speed": jnp.sqrt(speed_sqd),
            "pressure": pressure, "sos": sos}


def t_flux_tensor(q, prim=None):
    """q: (5, N) -> F: (3, 5, N); F[d, v] = flux of v in direction d,
    momentum block oriented vel[k]*mom[d] (matches ops.physics)."""
    if prim is None:
        prim = t_primitives(q)
    mom, vel, p = prim["mom"], prim["vel"], prim["pressure"]
    de_p = prim["energy"] + p
    mom_block = vel[None, :, :] * mom[:, None, :]       # (d, k, N)
    eye = jnp.eye(3, dtype=q.dtype)[:, :, None]
    mom_block = mom_block + p[None, None, :] * eye
    density_row = mom[:, None, :]                       # (3, 1, N)
    energy_row = (vel * de_p[None])[:, None, :]         # (3, 1, N)
    return jnp.concatenate([density_row, mom_block, energy_row], axis=1)


def t_internal_edge_flux(q_a, q_b, ew, ewt=None):
    """q_a, q_b: (5, E); ew: (3, E) -> (5, E) value into a (negate for b).
    ewt: optional precomputed |ew| (a mesh constant — passing it removes
    a sqrt chain per edge per evaluation; FLUX_PRECOMPUTE_EDGE_WEIGHTS
    semantics, euler3d:354-362)."""
    if ewt is None:
        ewt = jnp.sqrt(jnp.sum(ew * ew, axis=0))
    pa, pb = t_primitives(q_a), t_primitives(q_b)
    fa = t_flux_tensor(q_a, pa)
    fb = t_flux_tensor(q_b, pb)
    factor = (-ewt * (SMOOTHING_COEFFICIENT * 0.5)
              * (pa["speed"] + pb["speed"] + pa["sos"] + pb["sos"]))
    # keep the einsum: measured 816 GB/s as a dot_general; unrolling it
    # into muls/adds bloats the surrounding fusion and costs ~17% flux
    # throughput (447 -> 377M edges/s on the flagship)
    central = jnp.einsum("de,dve->ve", ew, fa + fb)
    return factor[None] * (q_a - q_b) - 0.5 * central


def t_boundary_edge_flux(q_b, ew):
    p = t_primitives(q_b)["pressure"]
    zeros = jnp.zeros_like(p)[None]
    return jnp.concatenate([zeros, ew * p[None], zeros], axis=0)


def t_wall_edge_flux(q_b, ew, ff_flux_t):
    """ff_flux_t: (3, 5) far-field flux tensor."""
    fb = t_flux_tensor(q_b)
    return 0.5 * jnp.einsum("de,dve->ve", ew, fb + ff_flux_t[:, :, None])


def t_shift_flux(deltas, weights, variables, num_nodes):
    """Dense shift-decomposition internal flux, transposed layout.
    weights[i]: (3, N - d) device arrays."""
    flux = jnp.zeros_like(variables)
    for d, wd in zip(deltas, weights):
        q_a = variables[:, :num_nodes - d]
        q_b = variables[:, d:]
        val = t_internal_edge_flux(q_a, q_b, wd)
        flux = flux.at[:, :num_nodes - d].add(val)
        flux = flux.at[:, d:].add(-val)
    return flux


def t_shift_flux_rolled(deltas, wpad, variables):
    """Batched-roll variant of t_shift_flux: ONE flux-math evaluation over
    all spans at once (lane-rolled q_b views, padded weights), then a
    rolled subtraction for the b-sides. ~1.4x the per-span slice version
    on TPU (single fused pass instead of D).

    Correctness of the wrap-around lanes: padded weight rows are zero and
    every state in a live solve is physical, so wrapped edge values are
    exactly zero (same argument as the Pallas kernel's pad lanes).

    wpad: preferred form (3|4, D*N) span-major — rows 0:3 the
    zero-padded weights, row 3 the precomputed |w| (zero on padding, so
    the wrap-zero argument holds). A legacy (D, 3|4, N) form is
    reformatted in-kernel.

    Note: computing the a-side primitives/flux tensor once on N lanes
    and broadcasting across spans was tried and is ~20% SLOWER on TPU —
    the mixed (N)/(D*N) shapes break XLA's single uniform fused pass
    (measured 344 vs 424M edges/s on the flagship level 0). Keep every
    operand at (…, D*N). The operands are built by lane-concatenation
    (not stack+transpose+reshape, which materialises a (D,5,N)->(5,D,N)
    relayout — profiled as a top broadcast cost)."""
    return _rolled_pass(
        deltas, wpad, variables,
        lambda qa, qb, ew, ewt: t_internal_edge_flux(qa, qb, ew, ewt))


def _rolled_pass(deltas, wpad, variables, edge_val):
    """Shared batched-roll scaffolding: lane-concatenated (…, D*N)
    operands, one edge_val evaluation, roll-subtract for the b-sides."""
    D = len(deltas)
    V, n = variables.shape
    if wpad.ndim == 3:
        wpad = wpad.transpose(1, 0, 2).reshape(wpad.shape[1], D * n)
    ew = wpad[:3]
    ewt = wpad[3] if wpad.shape[0] == 4 else None
    qa = jnp.concatenate([variables] * D, axis=1)
    qb = jnp.concatenate([jnp.roll(variables, -d, axis=1)
                          for d in deltas], axis=1)
    val = edge_val(qa, qb, ew, ewt).reshape(V, D, n)
    flux = jnp.sum(val, axis=1)
    for i, d in enumerate(deltas):
        flux = flux - jnp.roll(val[:, i, :], d, axis=1)
    return flux


def t_shift_rw_rolled(deltas, wpad, variables):
    """Faithful indirect_rw twin of t_shift_flux_rolled: identical
    slicing/roll/accumulate traffic, near-zero arithmetic (the reference
    twin does a handful of adds per edge, indirect_rw_kernel.elemfunc.c:
    42-55, and exists purely as a memory-bound roofline probe,
    indirect_rw_loop.cpp:8-10). Shares the operand construction and
    roll-accumulate scaffolding with t_shift_flux_rolled so the two can
    never drift apart in traffic."""
    return _rolled_pass(
        deltas, wpad, variables,
        lambda qa, qb, ew, ewt: qa + qb + (ew[0] + ew[1] + ew[2])[None])


def t_dense_boundary_wall_flux(q, bd_normal, wall_normal, wall_const):
    """Dense boundary+wall flux, variable-major.

    Both edge classes read ONLY their destination node's state and are
    linear in the face normal, so all of a node's faces collapse into
    per-node aggregated normals (mesh constants):

      boundary (flux_boundary_kernel.elemfunc.c:41-45):
          momentum += (sum of the node's boundary normals) * p(q_n)
      wall (flux_wall_kernel.elemfunc.c:51-69):
          flux += 0.5 * W_n . F(q_n)  +  [0.5 * W_n . F_farfield]
                  (the bracket is a precomputed per-node constant)

    No gathers, no scatters — replaces the per-face segment-sums that
    dominated the profiled cycle. FP differs from face-by-face
    accumulation only by reassociation.

    The W.F contraction is open-coded (same form as the fused kernels'
    _bw_flux) instead of an einsum over the materialised (3, 5, N) flux
    tensor: xprof showed the dot_general + tensor build at ~0.4 ms per
    tet-flagship cycle, all of it HBM traffic for a tensor that never
    needed to exist.

    bd_normal, wall_normal: (3, N); wall_const: (5, N).
    """
    prim = t_primitives(q)
    p = prim["pressure"]
    mx, my, mz = q[1], q[2], q[3]
    vx, vy, vz = prim["vel"]
    de_p = q[4] + p
    hx, hy, hz = (0.5 * wall_normal[d] for d in range(3))
    bx, by, bz = bd_normal[0], bd_normal[1], bd_normal[2]
    rows = (
        hx * mx + hy * my + hz * mz,
        bx * p + hx * (vx * mx + p) + hy * (vx * my) + hz * (vx * mz),
        by * p + hx * (vy * mx) + hy * (vy * my + p) + hz * (vy * mz),
        bz * p + hx * (vz * mx) + hy * (vz * my) + hz * (vz * mz + p),
        hx * (vx * de_p) + hy * (vy * de_p) + hz * (vz * de_p),
    )
    return jnp.stack(rows, axis=0) + wall_const


def build_dense_boundary_wall(num_nodes, bedge_b, bedge_w, wedge_b,
                              wedge_w, ff_flux):
    """Host-side per-node aggregate normals + the far-field wall constant.
    ff_flux: (3, 5). Returns (bd_normal (3,N), wall_normal (3,N),
    wall_const (5,N)) numpy arrays."""
    import numpy as np

    bd = np.zeros((num_nodes, 3))
    np.add.at(bd, bedge_b, bedge_w)
    wl = np.zeros((num_nodes, 3))
    np.add.at(wl, wedge_b, wedge_w)
    wall_const = 0.5 * np.einsum("nd,dv->vn", wl, np.asarray(ff_flux))
    return bd.T.copy(), wl.T.copy(), wall_const


def t_time_step(j, step_factors, fluxes, old_variables):
    factor = step_factors / float(RK + 1 - j)
    return old_variables + factor[None] * fluxes


def t_segment_accumulate(val, dest, num_nodes):
    """(5, E) values into (5, N): five 1D segment sums (keeps everything
    in lane-major layouts; E here is small — boundary/wall/spill)."""
    return jnp.stack([
        jax.ops.segment_sum(val[v], dest, num_segments=num_nodes)
        for v in range(val.shape[0])], axis=0)
