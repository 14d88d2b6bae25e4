"""SPMD multigrid solver over a jax.sharding.Mesh.

One shard_map'd, jit-compiled function runs the full V-cycle:

  - finest level: node blocks sharded over axis 'x'; per flux evaluation
    ONE all_gather moves separator values in, ONE psum_scatter moves
    foreign flux contributions back (static shapes, ICI collectives);
  - global min-dt: lax.pmin (replaces the serial reduction at
    cfd_loops.cpp:137-150);
  - coarse levels: replicated; every shard smooths them identically (they
    are ~8x smaller per level, so redundant compute beats communication);
    restriction partial sums are psum'd; prolongation back to the sharded
    fine level uses precomputed static geometry (partition.py) plus the
    same separator return path.

RMS and the invalid-state count are psum'd so every shard (and the host)
sees the global values.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core.config import SolverConfig
from ..core.constants import RK, NVAR, far_field_state
from ..core.types import MultigridMesh
from ..mesh.build import apply_ewt_conditioning
from ..ops import (
    internal_edge_flux, boundary_edge_flux, wall_edge_flux, residual,
    invalid_variables_count, mg_restrict, prolong_residuals_interpolate,
)
from ..solver.solver import prepare_device_mesh, _visit
from .partition import partition_mesh, ShardedMeshData

AXIS = "x"


def _sharded_step_factor(const, q, legacy):
    """Step factor on one (5, B) shard block; the corrected variant's
    global min is a lax.pmin (cfd_loops.cpp:137-150 analogue)."""
    from ..ops import tops

    volumes = const["volumes"]
    prim = tops.t_primitives(q)
    if legacy:
        return 0.5 / (jnp.sqrt(volumes) * (prim["speed"] + prim["sos"]))
    dt = 0.5 * jnp.cbrt(volumes) / (prim["speed"] + prim["sos"])
    dt = jnp.where(const["node_mask"] > 0, dt, jnp.inf)
    min_dt = jax.lax.pmin(jnp.min(dt), AXIS)
    return min_dt / volumes


def _window_exchange(sd, const, qv, padded_in):
    """Gather-only halo: [local block | all-gathered separator pool],
    lane-padded to whole windows with a physical state (the kernel's
    in-kernel primitive completion computes 1/rho on owner rows —
    padding must stay finite; no live slot references the pad lanes). Pool SECTIONS are reordered per shard
    (win_sec_order) so the sections this shard references sit right
    after the block, inside the plan's kw neighborhood."""
    pool_sz = sd.P * sd.smax
    sep_vals = qv[:, const["sep_idx"]]          # (5, Smax)
    pool = jax.lax.all_gather(sep_vals, AXIS)   # (P, 5, Smax)
    pool = pool[const["win_sec_order"]]         # per-shard section order
    comb = jnp.concatenate(
        [qv, pool.transpose(1, 0, 2).reshape(NVAR, pool_sz)], axis=1)
    pad = padded_in - comb.shape[1]
    if pad:
        comb = jnp.concatenate(
            [comb, jnp.broadcast_to(comb[:, :1], (NVAR, pad))], axis=1)
    return comb


def _window_flux_total(sd, const, q, wkernels):
    """Full flux evaluation, windowed production path: per-shard window
    kernel + indexed spill half-edges + dense boundary/wall. q: (5, B)
    -> (5, B). Gather-only halo: no return scatter collective."""
    from ..ops import tops

    wflux, _ = wkernels
    warrs = {k: const["win_" + k] for k in
             ("base", "nl", "own", "lwins", "wsel", "ci", "rs", "w4",
              "wmap")}
    wsd = const["wsp_dest"]
    B = q.shape[1]
    comb = _window_exchange(sd, const, q, wflux.padded_in)
    flux = wflux(comb, arrays=warrs)            # (5, B)
    val = tops.t_internal_edge_flux(
        q[:, wsd], comb[:, const["wsp_src"]], const["wsp_w"].T)
    flux = flux + tops.t_segment_accumulate(val, wsd, B)
    flux = flux + tops.t_dense_boundary_wall_flux(
        q, const["dense_bd"], const["dense_wl"],
        const["dense_wlc"])
    return flux


def _window_rw_token(sd, const, q, wkernels):
    """Faithful indirect_rw twin of _window_flux_total: same halo gather
    + windowed rw kernel + spill stream, reduced to one scalar token
    (zero_fluxes semantics, euler3d:491-505)."""
    from ..ops import tops

    _, wrw = wkernels
    warrs = {k: const["win_" + k] for k in
             ("base", "nl", "own", "lwins", "wsel", "ci", "rs", "w4",
              "wmap")}
    wsd = const["wsp_dest"]
    comb2 = _window_exchange(sd, const, q, wrw.padded_in)
    tok = jnp.sum(wrw(comb2, arrays=warrs))
    valr = (q[:, wsd] + comb2[:, const["wsp_src"]]
            + jnp.sum(const["wsp_w"].T, axis=0)[None])
    return tok + jnp.sum(tops.t_segment_accumulate(valr, wsd, q.shape[1]))


def _stream_exchange(sd, const, v):
    """Halo in (node-major): gather own separator values, all_gather the
    pool, append to the block."""
    pool_sz = sd.P * sd.smax
    sep_vals = v[const["sep_idx"]]                  # (Smax, NVAR)
    pool = jax.lax.all_gather(sep_vals, AXIS)       # (P, Smax, NVAR)
    return jnp.concatenate([v, pool.reshape(pool_sz, NVAR)], axis=0)


def _stream_flux_total(sd, const, q, ff_flux, use_shift):
    """Full flux evaluation, indexed-stream path (segment/shift modes):
    segment-sum over [block | pool], optional batched-roll dense
    diagonals, boundary/wall, then the psum_scatter halo return.
    q: (5, B) -> (B, NVAR) node-major."""
    from ..ops import tops

    B = q.shape[1]
    pool_sz = sd.P * sd.smax
    v_nm = q.T
    combined = _stream_exchange(sd, const, v_nm)
    q_a = combined[const["edge_a"]]
    q_b = combined[const["edge_b"]]
    val = internal_edge_flux(q_a, q_b, const["edge_w"])
    dest = jnp.concatenate([const["edge_a"], const["edge_b"]])
    vals = jnp.concatenate([val, -val])
    seg = jax.ops.segment_sum(vals, dest, num_segments=B + pool_sz)
    flux = seg[:B]
    if use_shift:
        # batched-roll single-pass dense diagonals over the block
        # (tops.t_shift_flux_rolled; wrap lanes carry zero weights —
        # the partitioner only covers edges with local_a + d < B)
        flux = flux + tops.t_shift_flux_rolled(
            sd.shift_deltas, const["shift_wpad"], q).T
    if "dense_bd" in const:
        # dense aggregated boundary/wall (ops.tops semantics)
        bw = tops.t_dense_boundary_wall_flux(
            q, const["dense_bd"], const["dense_wl"],
            const["dense_wlc"])
        flux = flux + bw.T
    else:
        val_bd = boundary_edge_flux(v_nm[const["bedge_b"]],
                                    const["bedge_w"])
        val_w = wall_edge_flux(v_nm[const["wedge_b"]],
                               const["wedge_w"], ff_flux)
        flux = flux + jax.ops.segment_sum(val_bd, const["bedge_b"],
                                          num_segments=B)
        flux = flux + jax.ops.segment_sum(val_w, const["wedge_b"],
                                          num_segments=B)
    # halo out: foreign contributions return to their owners
    recv = jax.lax.psum_scatter(
        seg[B:].reshape(sd.P, sd.smax, NVAR), AXIS,
        scatter_dimension=0)                        # (Smax, NVAR)
    return flux.at[const["sep_idx"]].add(
        recv * const["sep_mask"][:, None])


def _stream_rw_token(sd, const, q, use_shift):
    """Data-movement twin of _stream_flux_total (same halo traffic),
    token-consumed."""
    from ..ops import indirect_rw_edge_values, tops

    B = q.shape[1]
    pool_sz = sd.P * sd.smax
    comb2 = _stream_exchange(sd, const, q.T)
    va, vb = indirect_rw_edge_values(comb2[const["edge_a"]],
                                     comb2[const["edge_b"]],
                                     const["edge_w"])
    dest = jnp.concatenate([const["edge_a"], const["edge_b"]])
    seg = jax.ops.segment_sum(jnp.concatenate([va, vb]), dest,
                              num_segments=B + pool_sz)
    recv = jax.lax.psum_scatter(
        seg[B:].reshape(sd.P, sd.smax, NVAR), AXIS,
        scatter_dimension=0)
    tok = jnp.sum(seg[:B]) + jnp.sum(recv * const["sep_mask"][:, None])
    if use_shift:
        # rolled-form twin over the dense diagonals (same traffic,
        # near-zero flops; tops.t_shift_rw_rolled)
        tok = tok + jnp.sum(tops.t_shift_rw_rolled(
            sd.shift_deltas, const["shift_wpad"], q)) * jnp.zeros(
            (), q.dtype)
    return tok


def _use_stream_shift(sd, const, config) -> bool:
    return (config.accumulate == "shift"
            and const.get("shift_wpad") is not None
            and len(sd.shift_deltas) > 0)


def _sharded_visit(sd, const, variables, ff_flux, legacy, dtype,
                   config, wkernels=None, tag=None):
    """One smoothing pass on the sharded finest level.
    variables: (B, NVAR) block at rest; the RK loop runs VARIABLE-MAJOR
    internally (ops/tops). With wkernels (accumulate=window/pallas) the
    flux is the per-shard windowed production kernel with a gather-only
    halo; otherwise the indexed segment stream (+ optional shift
    diagonals) with the psum_scatter return leg.
    Returns (variables, old, res, invalid, rw_token)."""
    from ..ops import tops

    from ..solver.solver import _kscope

    node_mask = const["node_mask"]
    old = variables
    q = variables.T                                     # (5, B)
    with _kscope("compute_step", tag):
        sf = _sharded_step_factor(const, q, legacy)

    invalid = jnp.int32(0)
    rw_token = jnp.zeros((), variables.dtype)
    old_t = q
    use_shift = _use_stream_shift(sd, const, config)

    for j in range(RK):
        if config.flux_cripple:
            # crippled twin first, writes discarded (euler3d:399-418)
            from ..ops import internal_edge_flux_crippled
            comb = _stream_exchange(sd, const, q.T)
            crippled = internal_edge_flux_crippled(
                comb[const["edge_a"]], comb[const["edge_b"]],
                const["edge_w"])
            rw_token = rw_token + jnp.sum(crippled) * jnp.zeros(
                (), variables.dtype)
        with _kscope("flux", tag):
            if wkernels is not None:
                flux_t = _window_flux_total(sd, const, q, wkernels)
            else:
                flux_t = _stream_flux_total(sd, const, q, ff_flux,
                                            use_shift).T
        with _kscope("time_step", tag):
            q = tops.t_time_step(j, sf, flux_t, old_t)
        invalid = invalid + invalid_variables_count(
            q.T * node_mask[:, None])
        if config.include_indirect_rw:
            # the data-movement twin, with the same halo traffic; its
            # accumulation is reduced to a token (writes discarded, as
            # in the reference's zero_fluxes after indirect_rw)
            with _kscope("indirect_rw", tag):
                if wkernels is not None:
                    rw_token = rw_token + _window_rw_token(
                        sd, const, q, wkernels)
                else:
                    rw_token = rw_token + _stream_rw_token(
                        sd, const, q, use_shift)

    variables = q.T
    res = residual(old, variables)
    return variables, old, res, jax.lax.psum(invalid, AXIS), rw_token


def _sharded_restrict(sd, const, variables_block, coarse_vars,
                      rkernel=None, coarse_transposed=False):
    """Fine (sharded) -> coarse (replicated). Production path (rkernel,
    accumulate=window/pallas): per-shard windowed cross-space partial
    means (weights 1/count_global folded), ONE psum — no scatter op in
    the program. Fallback: local partial segment-sum + psum. Both end
    with the reference's average/keep-old semantics. coarse_vars is
    (5, num_lanes) when the coarse chain runs the production
    variable-major layout (coarse_transposed), else (Nc, NVAR)."""
    if rkernel is not None and "rwin_base" in const:
        from ..ops import tops

        q = variables_block.T                       # (5, Bs)
        warrs = {k: const["rwin_" + k] for k in
                 ("base", "nl", "own", "lwins", "wsel", "ci", "rs",
                  "w4", "wmap")}
        part = rkernel(q, arrays=warrs)             # (5, ncp)
        vals = const["rwsp_w"][None] * q[:, const["rwsp_src"]]
        part = part + tops.t_segment_accumulate(
            vals, const["rwsp_dest"], part.shape[1])
        mean = jax.lax.psum(part, AXIS)             # (5, ncp)
        mp = const["mg_mapped"]
        if coarse_transposed:
            W = coarse_vars.shape[1]                # == ncp (num_lanes)
            mask = jnp.pad(mp, (0, W - mp.shape[0]))
            return jnp.where(mask[None], mean[:, :W], coarse_vars)
        nc = coarse_vars.shape[0]
        return jnp.where(mp[:, None], mean[:, :nc].T, coarse_vars)
    if coarse_transposed:
        # stream fallback under a transposed coarse chain (shift mode):
        # compute node-major, write back under an add root (pad fuses)
        nc = int(const["mg_mapped"].shape[0])
        cv_nm = coarse_vars[:, :nc].T
        new = _sharded_restrict(sd, const, variables_block, cv_nm)
        d = coarse_vars.shape[1] - nc
        return coarse_vars + jax.lax.pad(
            (new - cv_nm).T, jnp.zeros((), coarse_vars.dtype),
            ((0, 0, 0), (0, d, 0)))
    nc = coarse_vars.shape[0]
    partial = jax.ops.segment_sum(variables_block, const["mg_mapping"],
                                  num_segments=nc + 1)[:nc]
    sums = jax.lax.psum(partial, AXIS)
    counts = const["mg_counts"]
    mapped = const["mg_mapped"]
    safe = jnp.where(mapped, counts, jnp.ones_like(counts))
    return jnp.where(mapped[:, None], sums / safe[:, None], coarse_vars)


def _sharded_prolong(sd, const, res_coarse, res_fine, vars_fine,
                     pkernel=None, coarse_transposed=False):
    """Coarse (replicated/gathered-raw) residuals -> sharded fine
    correction. Production path (pkernel, accumulate=window/pallas):
    the per-shard COMPOSED windowed wsum kernel computes wavg for the
    local block directly from the raw coarse residuals — destination-
    grouped, so there is NO collective on this path (the coarse side is
    already shard-local). Fallback (segment/shift modes): the static
    per-edge geometry streams with the psum_scatter return leg."""
    if pkernel is not None and "pwin_base" in const:
        from ..ops import tops

        # (5, Nc[p]): already variable-major when the coarse chain runs
        # the production layout — no transpose at all on that path
        rc_t = res_coarse if coarse_transposed else res_coarse.T
        pad = pkernel.padded_in - rc_t.shape[1]
        if pad:
            rc_t = jnp.concatenate(
                [rc_t, jnp.zeros((NVAR, pad), rc_t.dtype)], axis=1)
        warrs = {k: const["pwin_" + k] for k in
                 ("base", "nl", "own", "lwins", "wsel", "ci", "rs",
                  "w4", "wmap")}
        wavg_t = pkernel(rc_t, arrays=warrs)       # (5, Bs)
        # spill halves (cross out-of-kw): tiny indexed stream
        vals = const["pwsp_w"][None] * rc_t[:, const["pwsp_src"]]
        wavg_t = wavg_t + tops.t_segment_accumulate(
            vals, const["pwsp_dest"], wavg_t.shape[1])
        return vars_fine + (res_fine - wavg_t.T) \
            * const["node_mask"][:, None]
    B = vars_fine.shape[0]
    pool_sz = sd.P * sd.smax
    if coarse_transposed:
        res_coarse = res_coarse.T                  # (Np, NVAR) view
    r_a1 = res_coarse[const["pro_a1"]]
    r_b1 = res_coarse[const["pro_b1"]]

    la = const["pro_live_a"][:, None]
    lb = const["pro_live_b"][:, None]
    val_a = la * (const["pro_id_a1a2"][:, None] * r_a1
                  + const["pro_id_b1a2"][:, None] * r_b1)
    w_a = const["pro_live_a"] * (const["pro_id_a1a2"]
                                 + const["pro_id_b1a2"])
    # reference quirk: a1->b2 uses b1's residual (mg_loops.cpp:804-810)
    val_b = lb * ((const["pro_id_b1b2"]
                   + const["pro_id_a1b2"])[:, None] * r_b1)
    w_b = const["pro_live_b"] * (const["pro_id_b1b2"]
                                 + const["pro_id_a1b2"])

    dest = jnp.concatenate([const["pro_dest_a"], const["pro_dest_b"]])
    acc = jax.ops.segment_sum(jnp.concatenate([val_a, val_b]), dest,
                              num_segments=B + pool_sz)
    ws = jax.ops.segment_sum(jnp.concatenate([w_a, w_b]), dest,
                             num_segments=B + pool_sz)
    recv_acc = jax.lax.psum_scatter(
        acc[B:].reshape(sd.P, sd.smax, NVAR), AXIS, scatter_dimension=0)
    recv_ws = jax.lax.psum_scatter(
        ws[B:].reshape(sd.P, sd.smax), AXIS, scatter_dimension=0)
    acc_local = acc[:B].at[const["sep_idx"]].add(
        recv_acc * const["sep_mask"][:, None])
    ws_local = ws[:B].at[const["sep_idx"]].add(
        recv_ws * const["sep_mask"])

    coincident = const["coincident"]
    safe_w = jnp.where(ws_local > 0, ws_local, jnp.ones_like(ws_local))
    wavg = jnp.where(coincident[:, None], res_coarse[const["parent"]],
                     acc_local / safe_w[:, None])
    return vars_fine + (res_fine - wavg)  # noqa: E501  (node-major path)


def _sharded_restrict_to_sharded(sd_f, const_f, vars_f_block,
                                 vars_c_block, rkernel=None):
    """Fine (sharded) -> coarse (ALSO sharded, SCALING.md crossover):
    partial sums target the coarse level's PADDED block space and ONE
    psum_scatter lands each shard its own coarse block — the coarse
    level is never replicated. Production path (rkernel): windowed
    partial means instead of the segment-sum scatter."""
    P = sd_f.P
    if rkernel is not None and "rwin_base" in const_f:
        from ..ops import tops

        Bc = vars_c_block.shape[0]
        q = vars_f_block.T                          # (5, Bs)
        warrs = {k: const_f["rwin_" + k] for k in
                 ("base", "nl", "own", "lwins", "wsel", "ci", "rs",
                  "w4", "wmap")}
        part = rkernel(q, arrays=warrs)             # (5, P*Bc)
        vals = const_f["rwsp_w"][None] * q[:, const_f["rwsp_src"]]
        part = part + tops.t_segment_accumulate(
            vals, const_f["rwsp_dest"], part.shape[1])
        mean = jax.lax.psum_scatter(
            part.reshape(NVAR, P, Bc), AXIS,
            scatter_dimension=1).reshape(NVAR, Bc).T
        return jnp.where(const_f["mgc_mapped"][:, None], mean,
                         vars_c_block)
    Bc = vars_c_block.shape[0]
    partial = jax.ops.segment_sum(vars_f_block, const_f["mgp_pad"],
                                  num_segments=P * Bc + 1)[:P * Bc]
    sums = jax.lax.psum_scatter(
        partial.reshape(P, Bc, NVAR), AXIS,
        scatter_dimension=0)                       # (Bc, NVAR) own block
    counts = const_f["mgc_counts"]
    mapped = const_f["mgc_mapped"]
    safe = jnp.where(mapped, counts, jnp.ones_like(counts))
    return jnp.where(mapped[:, None], sums / safe[:, None], vars_c_block)


def _gather_coarse_raw(sd_c, const_f, res_c_block):
    """All_gather the (small) sharded coarse residual blocks and convert
    padded-global -> raw node order once, so raw-indexed prolongation
    geometry (_sharded_prolong) applies unchanged. Cost: one gather of
    Nc*NVAR — the coarse level is ~8x smaller than its fine level."""
    allb = jax.lax.all_gather(res_c_block, AXIS)   # (P, Bc, NVAR)
    return allb.reshape(sd_c.P * sd_c.block, NVAR)[const_f["c_raw2pad"]]


def build_sharded_consts(sd, config: SolverConfig, dtype, mesh: Mesh):
    """Device constants for the sharded fine level, shared by the fused
    cycle and the instrumented sharded solver: (sharded_const stacked
    over shards, replicated_const, wkernels-or-None)."""

    def to_dev(x, dt=dtype):
        return jnp.asarray(x, dt)

    # stacked per-shard constants (sharded over axis 0) ...
    sharded_const = {
        "volumes": to_dev(sd.volumes),
        "node_mask": to_dev(sd.node_mask),
        "sep_idx": to_dev(sd.sep_idx, jnp.int32),
        "sep_mask": to_dev(sd.sep_mask),
        "edge_a": to_dev(sd.edge_a, jnp.int32),
        "edge_b": to_dev(sd.edge_b, jnp.int32),
        "edge_w": to_dev(sd.edge_w),
        "bedge_b": to_dev(sd.bedge_b, jnp.int32),
        "bedge_w": to_dev(sd.bedge_w),
        "wedge_b": to_dev(sd.wedge_b, jnp.int32),
        "wedge_w": to_dev(sd.wedge_w),
    }
    if sd.shift_deltas:
        sharded_const["shift_wpad"] = to_dev(sd.shift_wpad)
    if sd.dense_bd is not None:
        # stored pre-TRANSPOSED, (P, 3|5, B): the runtime `.T` of the
        # shard slice materialised as a pathological-tiling transpose +
        # broadcast on-chip (~2.1 ms/cycle at flagship P=1, sp1_diag)
        sharded_const["dense_bd"] = to_dev(
            sd.dense_bd.transpose(0, 2, 1))
        sharded_const["dense_wl"] = to_dev(
            sd.dense_wl.transpose(0, 2, 1))
        fff = np.asarray(far_field_state(np.float64)[1])
        # per-shard wall far-field constant: 0.5 * W . F_ff
        sharded_const["dense_wlc"] = to_dev(0.5 * np.einsum(
            "pbd,dv->pbv", sd.dense_wl, fff).transpose(0, 2, 1))
    wkernels = None
    if (config.accumulate in ("window", "pallas")
            and sd.win_arrays is not None):
        # per-shard windowed-gather production kernels (the multi-chip
        # fast path; the box-specialised shift megakernel stays a
        # single-chip formulation — the window kernel is the general
        # production kernel and serves both config names here)
        from ..pallas.flux_window import PallasWindowFlux
        interp = mesh.devices.flat[0].platform == "cpu"
        # Shared depth-bucketed dispatch (VERDICT r03 #4): the bucket
        # STRUCTURE (start/count/l_max_b) comes from the cross-shard
        # max depth profile, so one SPMD program serves every shard;
        # each shard's depth-sorted wmap travels as DATA (win_wmap).
        wflux = PallasWindowFlux(sd.win_template, sd.block, dtype=dtype,
                                 interpret=interp, arrays={},
                                 buckets=sd.win_buckets)
        wrw = PallasWindowFlux(sd.win_template, sd.block, dtype=dtype,
                               interpret=interp, rw=True, arrays={},
                               buckets=sd.win_buckets)
        wkernels = (wflux, wrw)
        wa = sd.win_arrays
        sharded_const.update({
            "win_base": to_dev(wa["base"], jnp.int32),
            "win_nl": to_dev(wa["nl"], jnp.int32),
            "win_own": to_dev(wa["own"], jnp.int32),
            "win_lwins": to_dev(wa["lwins"], jnp.int32),
            "win_wsel": to_dev(wa["wsel"], jnp.int32),
            "win_ci": to_dev(wa["ci"], jnp.int32),
            "win_rs": to_dev(wa["rs"], jnp.int32),
            "win_w4": to_dev(wa["w4"]),
            "wsp_dest": to_dev(sd.win_spill_dest, jnp.int32),
            "wsp_src": to_dev(sd.win_spill_src, jnp.int32),
            "wsp_w": to_dev(sd.win_spill_w),
            "win_sec_order": to_dev(sd.win_sec_order, jnp.int32),
            "win_wmap": to_dev(sd.win_wmap, jnp.int32),
        })
    if sd.mg_mapping is not None:
        sharded_const.update({
            "mg_mapping": to_dev(sd.mg_mapping, jnp.int32),
            "coincident": jnp.asarray(sd.coincident),
            "parent": to_dev(sd.parent, jnp.int32),
            "pro_a1": to_dev(sd.pro_a1, jnp.int32),
            "pro_b1": to_dev(sd.pro_b1, jnp.int32),
            "pro_id_a1a2": to_dev(sd.pro_id_a1a2),
            "pro_id_b1a2": to_dev(sd.pro_id_b1a2),
            "pro_id_b1b2": to_dev(sd.pro_id_b1b2),
            "pro_id_a1b2": to_dev(sd.pro_id_a1b2),
            "pro_live_a": to_dev(sd.pro_live_a),
            "pro_live_b": to_dev(sd.pro_live_b),
            "pro_dest_a": to_dev(sd.pro_dest_a, jnp.int32),
            "pro_dest_b": to_dev(sd.pro_dest_b, jnp.int32),
        })
    if sd.mgp_pad is not None:
        # next level is ALSO sharded: padded-space restriction targets
        # + per-coarse-block counts (see partition._attach_mg_padded)
        sharded_const.update({
            "mgp_pad": to_dev(sd.mgp_pad, jnp.int32),
            "mgc_counts": to_dev(sd.mgc_counts),
            "mgc_mapped": jnp.asarray(sd.mgc_mapped),
        })
    pkernel = None
    if (config.accumulate in ("window", "pallas")
            and sd.pwin_arrays is not None):
        # composed windowed prolongation, per shard: ONE cross-space
        # wsum kernel computes wavg for the local fine block directly
        # from the raw coarse residuals (no collective; see
        # partition._attach_prolong_window). Shared bucket structure;
        # per-shard depth order travels as data (pwin_wmap).
        from ..pallas.flux_window import PallasWindowFlux
        interp = mesh.devices.flat[0].platform == "cpu"
        pkernel = PallasWindowFlux(sd.pwin_template, sd.block,
                                   dtype=dtype, interpret=interp,
                                   arrays={}, mode="wsum",
                                   buckets=sd.pwin_buckets)
        pa = sd.pwin_arrays
        sharded_const.update({
            "pwin_base": to_dev(pa["base"], jnp.int32),
            "pwin_nl": to_dev(pa["nl"], jnp.int32),
            "pwin_own": to_dev(pa["own"], jnp.int32),
            "pwin_lwins": to_dev(pa["lwins"], jnp.int32),
            "pwin_wsel": to_dev(pa["wsel"], jnp.int32),
            "pwin_ci": to_dev(pa["ci"], jnp.int32),
            "pwin_rs": to_dev(pa["rs"], jnp.int32),
            "pwin_w4": to_dev(pa["w4"]),
            "pwin_wmap": to_dev(sd.pwin_wmap, jnp.int32),
            "pwsp_dest": to_dev(sd.pwin_spill_dest, jnp.int32),
            "pwsp_src": to_dev(sd.pwin_spill_src, jnp.int32),
            "pwsp_w": to_dev(sd.pwin_spill_w),
        })
    rkernel = None
    if (config.accumulate in ("window", "pallas")
            and sd.rwin_arrays is not None):
        # windowed restriction, per shard: coarse owners gather local
        # fine children at 1/count_global; the psum/psum_scatter of the
        # partials is the segment mean directly (see
        # partition._attach_restrict_window)
        from ..pallas.flux_window import PallasWindowFlux
        interp = mesh.devices.flat[0].platform == "cpu"
        rkernel = PallasWindowFlux(sd.rwin_template, sd.rwin_dest,
                                   dtype=dtype, interpret=interp,
                                   arrays={}, mode="wsum",
                                   buckets=sd.rwin_buckets)
        ra = sd.rwin_arrays
        sharded_const.update({
            "rwin_base": to_dev(ra["base"], jnp.int32),
            "rwin_nl": to_dev(ra["nl"], jnp.int32),
            "rwin_own": to_dev(ra["own"], jnp.int32),
            "rwin_lwins": to_dev(ra["lwins"], jnp.int32),
            "rwin_wsel": to_dev(ra["wsel"], jnp.int32),
            "rwin_ci": to_dev(ra["ci"], jnp.int32),
            "rwin_rs": to_dev(ra["rs"], jnp.int32),
            "rwin_w4": to_dev(ra["w4"]),
            "rwin_wmap": to_dev(sd.rwin_wmap, jnp.int32),
            "rwsp_dest": to_dev(sd.rwin_spill_dest, jnp.int32),
            "rwsp_src": to_dev(sd.rwin_spill_src, jnp.int32),
            "rwsp_w": to_dev(sd.rwin_spill_w),
        })
    # ... and replicated constants
    replicated_const = {}
    if sd.mg_counts is not None:
        replicated_const["mg_counts"] = to_dev(sd.mg_counts)
        replicated_const["mg_mapped"] = jnp.asarray(sd.mg_mapped)
    if sd.c_raw2pad is not None:
        replicated_const["c_raw2pad"] = to_dev(sd.c_raw2pad, jnp.int32)
    return sharded_const, replicated_const, wkernels, pkernel, rkernel


def make_sharded_cycle_fn(smesh: ShardedMeshData, dmesh_coarse,
                          config: SolverConfig, mesh: Mesh,
                          legacy: bool):
    """Build the jitted sharded V-cycle over S sharded levels
    (smesh.levels) + the replicated coarse chain (dmesh_coarse,
    index 0 = global level S). The S=1 shape is the round-3 design;
    S>=2 shards the first coarse level(s) too (SCALING.md crossover:
    level 1 carries ~20% of the cycle and replicating it Amdahl-caps
    the sharded speedup ~3x at P=8)."""
    dtype = jnp.dtype(config.dtype)
    ff_flux = jnp.asarray(np.asarray(far_field_state(np.float64)[1]), dtype)
    S = len(smesh.levels)
    sh_all, rep_all = {}, {}
    wk_list = []
    pk_list = []
    rk_list = []
    for i, sdl in enumerate(smesh.levels):
        cs, cr, wk, pk, rk = build_sharded_consts(sdl, config, dtype,
                                                  mesh)
        sh_all.update({f"L{i}_{k}": v for k, v in cs.items()})
        rep_all.update({f"L{i}_{k}": v for k, v in cr.items()})
        wk_list.append(wk)
        pk_list.append(pk)
        rk_list.append(rk)

    L = S + len(dmesh_coarse)
    # coarse-chain state layout (must match ShardedSolver._tc)
    tc = bool(dmesh_coarse) and (
        (config.transposed or config.accumulate in ("pallas", "window"))
        and all(l.shift is not None for l in dmesh_coarse))

    from ..solver.solver import _kscope as _ksc

    def cycle(const_sh, const_rep, state):
        # sharded constants arrive with a leading shard axis of size 1
        const_l = []
        for i in range(S):
            pre = f"L{i}_"
            c = {k[len(pre):]: v[0] for k, v in const_sh.items()
                 if k.startswith(pre)}
            c.update({k[len(pre):]: v for k, v in const_rep.items()
                      if k.startswith(pre)})
            const_l.append(c)
        vars_s = [state["variables0"]] + list(state["variables_sx"])
        res_s = [state["residuals0"]] + list(state["residuals_sx"])
        vars_c = list(state["variables_c"])
        res_c = list(state["residuals_c"])

        invalid_total = jnp.int32(0)

        def visit_sharded(i, v):
            nonlocal invalid_total
            v, old, r, inv, _tok = _sharded_visit(
                smesh.levels[i], const_l[i], v, ff_flux, legacy, dtype,
                config, wkernels=wk_list[i], tag=i)
            invalid_total = invalid_total + inv
            return v, r

        def visit_coarse(i, v):
            nonlocal invalid_total
            v, old, r, sf, inv, tok = _visit(
                dmesh_coarse[i], v, ff_flux, config, legacy,
                io_transposed=tc, tag=S + i)
            # replicated computation: inv is identical on every shard
            invalid_total = invalid_total + inv
            return v, r

        # --- up sweep over sharded levels ---
        rms = None
        for i in range(S):
            vars_s[i], res_s[i] = visit_sharded(i, vars_s[i])
            if i == 0:
                sq = jnp.sum(res_s[0] * res_s[0]
                             * const_l[0]["node_mask"][:, None])
                rms = jnp.sqrt(jax.lax.psum(sq, AXIS)
                               / smesh.levels[0].num_nodes)
            if i + 1 < S:
                with _ksc("restrict", i):
                    vars_s[i + 1] = _sharded_restrict_to_sharded(
                        smesh.levels[i], const_l[i], vars_s[i],
                        vars_s[i + 1], rkernel=rk_list[i])
            elif L > S:
                with _ksc("restrict", i):
                    vars_c[0] = _sharded_restrict(
                        smesh.levels[i], const_l[i], vars_s[i],
                        vars_c[0], rkernel=rk_list[i],
                        coarse_transposed=tc)

        C = L - S                       # replicated level count
        if C > 0:
            # --- replicated chain up --- (transfers use the SAME
            # precomputed-table dispatch as the single-chip solver:
            # structured parity / gather tables; the raw ops recompute
            # the prolong geometry from coords EVERY cycle and measured
            # ~2.1 ms/cycle on-chip at flagship P=1, sp1_diag)
            from ..solver.solver import (apply_prolong_padded,
                                         apply_restrict_padded)
            for i in range(C - 1):
                vars_c[i], res_c[i] = visit_coarse(i, vars_c[i])
                vars_c[i + 1] = apply_restrict_padded(
                    dmesh_coarse[i], dmesh_coarse[i + 1], vars_c[i],
                    vars_c[i + 1], tc)
            # top level
            vars_c[C - 1], res_c[C - 1] = visit_coarse(C - 1,
                                                       vars_c[C - 1])
            # --- down sweep over replicated levels ---
            for i in range(C - 2, -1, -1):
                vars_c[i] = apply_prolong_padded(
                    dmesh_coarse[i], dmesh_coarse[i + 1],
                    res_c[i + 1], res_c[i], vars_c[i], tc)
                vars_c[i], res_c[i] = visit_coarse(i, vars_c[i])

        # --- down sweep over sharded levels (prolong/visit pairs;
        # level 0 is prolonged into but next visited at cycle start,
        # the reference walk) ---
        if L > 1:
            for i in range(S - 1, -1, -1):
                if i + 1 < S:
                    res_above = _gather_coarse_raw(
                        smesh.levels[i + 1], const_l[i], res_s[i + 1])
                else:
                    res_above = res_c[0]
                with _ksc("prolong", i):
                    vars_s[i] = _sharded_prolong(
                        smesh.levels[i], const_l[i], res_above,
                        res_s[i], vars_s[i], pkernel=pk_list[i],
                        coarse_transposed=(i + 1 == S and tc))
                if i > 0:
                    vars_s[i], res_s[i] = visit_sharded(i, vars_s[i])

        new_state = {"variables0": vars_s[0], "residuals0": res_s[0],
                     "variables_sx": vars_s[1:],
                     "residuals_sx": res_s[1:],
                     "variables_c": vars_c, "residuals_c": res_c}
        return new_state, rms, invalid_total

    state_spec = {
        "variables0": P(AXIS), "residuals0": P(AXIS),
        "variables_sx": [P(AXIS)] * (S - 1),
        "residuals_sx": [P(AXIS)] * (S - 1),
        "variables_c": [P()] * (L - S), "residuals_c": [P()] * (L - S),
    }
    shmapped = jax.shard_map(
        cycle, mesh=mesh,
        in_specs=(P(AXIS), P(), state_spec),
        out_specs=(state_spec, P(), P()),
        check_vma=False,
    )

    # Mesh/plan constants MUST travel as jit ARGUMENTS, not closure
    # constants (the single-chip _parametrised rule): closure-embedded
    # arrays bloat the serialized HLO — the tet-flagship sharded
    # program's plan arrays blew this environment's remote compiler
    # limit outright (HTTP 413) — and device-resident closure constants
    # are fetched back through the tunnel at every lowering.
    @jax.jit
    def step_jit(state, sh, rep):
        return shmapped(sh, rep, state)

    def step(state):
        return step_jit(state, sh_all, rep_all)

    step.lower = lambda state: step_jit.lower(state, sh_all, rep_all)
    step.raw = lambda state, sh, rep: shmapped(sh, rep, state)
    step.consts = (sh_all, rep_all)
    return step, wk_list[0]


class ShardedSolver:
    """Multi-chip driver: partitions the mesh, builds the device mesh over
    the first `num_partitions` devices, runs sharded V-cycles."""

    def __init__(self, mgmesh: MultigridMesh, config: SolverConfig,
                 devices=None):
        self.config = config
        from ..solver.solver import resolve_accumulate
        resolve_accumulate(mgmesh, config)
        config.validate()
        self.mesh = mgmesh
        P_ = config.num_partitions
        devices = devices if devices is not None else jax.devices()[:P_]
        assert len(devices) == P_, (
            f"need {P_} devices, have {len(devices)}")
        self.jmesh = Mesh(np.array(devices), (AXIS,))

        # condition edge weights once (same path as single-chip)
        import dataclasses as _dc
        levels = [_dc.replace(l) for l in mgmesh.levels]
        for l in levels:
            l.edge_w = l.edge_w.copy()
            l.bedge_w = l.bedge_w.copy()
            l.wedge_w = l.wedge_w.copy()
        apply_ewt_conditioning(levels, mgmesh.variant)
        conditioned = MultigridMesh(levels=levels, variant=mgmesh.variant,
                                    problem_size=mgmesh.problem_size,
                                    name=mgmesh.name)

        # optional 2-D tile decomposition, realised as a node reordering
        # (partition = ordering + contiguous blocks); external node-major
        # I/O is translated back through part_orders, so checkpoints stay
        # portable across decompositions
        self.part_orders = None       # order[new_id] = old_id, per level
        self.part_invs = None
        if config.partition_2d:
            from .partition import partition2d_hierarchy
            shape = None
            if config.partition_2d != "auto":
                px, py = (int(x) for x in
                          config.partition_2d.lower().split("x"))
                shape = (px, py)
            conditioned, self.part_orders = partition2d_hierarchy(
                conditioned, P_, shape)
            self.part_invs = [np.argsort(o) for o in self.part_orders]

        self._conditioned = conditioned
        self.smesh = partition_mesh(
            conditioned, P_, use_shift=config.accumulate == "shift",
            use_window=config.accumulate in ("window", "pallas"),
            plan_cache_dir=config.plan_cache_dir,
            shard_levels=config.shard_levels)
        S = len(self.smesh.levels)
        # replicated coarse hierarchy as single-chip DeviceMesh levels;
        # edge weights are already conditioned, so present them under a
        # variant with no damping to avoid double application:
        dmesh_coarse = []
        if conditioned.num_levels > S:
            from ..core.constants import MeshVariant
            no_recondition = MultigridMesh(
                levels=conditioned.levels[S:], variant=MeshVariant.FVCORR)
            # replicated coarse levels run the SAME production
            # configuration as the single-chip solver — windowed/pallas
            # kernels, precomputed windowed MG transfers, lane-padded
            # variable-major state. (Until round 5 they were swapped to
            # the shift/stream path with unpadded node-major state; on
            # the unstructured tet flagship that formulation measured
            # ~150 ms/cycle of coarse-chain stalls on-chip at P=1 vs
            # the single-chip coarse chain's 1.6 ms — sp1 diags.)
            # window_tile_order=False: the boundary ops (rwin/pwin
            # plans, mg masks) address the coarse levels in the
            # conditioned order — an internal interleave would permute
            # the state under them. Costs only the coarse kernels'
            # operand relayout (~8x smaller than the fine level).
            import dataclasses as _dc2
            dm = prepare_device_mesh(
                no_recondition,
                _dc2.replace(config, window_tile_order=False))
            dmesh_coarse = dm.levels
            assert dm.node_orders is None
        self.dmesh_coarse = dmesh_coarse
        # coarse-chain state layout: variable-major lane-padded exactly
        # when the single-chip solver would be (state_is_transposed)
        self._tc = bool(dmesh_coarse) and (
            (config.transposed
             or config.accumulate in ("pallas", "window"))
            and all(l.shift is not None for l in dmesh_coarse))

        dtype = jnp.dtype(config.dtype)
        ff_q = jnp.asarray(np.asarray(far_field_state(np.float64)[0]), dtype)
        sd = self.smesh.level0
        with self.jmesh:
            def sblock(sl):
                return jnp.tile(ff_q[None, None, :],
                                (P_, sl.block, 1)).reshape(
                    P_ * sl.block, NVAR)

            def cinit(l):
                n = (l.num_lanes or l.num_nodes) if self._tc \
                    else l.num_nodes
                v = jnp.tile(ff_q[None, :], (n, 1))
                return v.T if self._tc else v

            def czero(l):
                n = (l.num_lanes or l.num_nodes) if self._tc \
                    else l.num_nodes
                shape = (NVAR, n) if self._tc else (n, NVAR)
                return jnp.zeros(shape, dtype)

            self.state = {
                "variables0": sblock(sd),
                "residuals0": jnp.zeros((P_ * sd.block, NVAR), dtype),
                "variables_sx": [sblock(sl)
                                 for sl in self.smesh.levels[1:]],
                "residuals_sx": [jnp.zeros((P_ * sl.block, NVAR), dtype)
                                 for sl in self.smesh.levels[1:]],
                "variables_c": [cinit(l) for l in dmesh_coarse],
                "residuals_c": [czero(l) for l in dmesh_coarse],
            }
        legacy = mgmesh.variant.uses_legacy_step_factor
        self._cycle, self.wkernels = make_sharded_cycle_fn(
            self.smesh, dmesh_coarse, config, self.jmesh, legacy)
        self.rms_history: list[float] = []
        self.completed_cycles = 0
        if config.resume and config.checkpoint_dir:
            from ..utils.checkpoint import latest_checkpoint, \
                load_checkpoint
            path = latest_checkpoint(config.checkpoint_dir)
            if path is not None:
                # checkpoints are node-major real-width — the SAME format
                # the single-chip solver writes, so runs can move between
                # partition counts (and to/from single chip) freely
                st, self.completed_cycles, self.rms_history = \
                    load_checkpoint(path, mgmesh, dtype)
                self._install_node_major(st)

    def _reassemble(self, arr, level: int = 0) -> np.ndarray:
        """(P*Bs, NVAR) stacked blocks -> (num_nodes, NVAR) node-major
        (drops each block's window-rounding tail)."""
        sd = self.smesh.levels[level]
        v = np.asarray(arr).reshape(sd.P, sd.block, NVAR)
        parts = [v[p, :max(0, min((p + 1) * sd.part_width, sd.num_nodes)
                           - p * sd.part_width)] for p in range(sd.P)]
        out = np.concatenate(parts, axis=0)
        if self.part_invs is not None:
            out = out[self.part_invs[level]]
        return out

    def _sharded_state(self, kind: str) -> list:
        head = [self.state[kind + "0"]]
        return head + list(self.state[kind + "_sx"])

    def _state_node_major(self) -> dict:
        """Checkpoint view: per-level node-major arrays, level 0 first
        (sharded levels reassembled, replicated levels as-is)."""
        S = len(self.smesh.levels)

        def coarse_ext(a, i):
            v = np.asarray(a)
            if self._tc:
                v = v[:, :self.dmesh_coarse[i].num_nodes].T
            if self.part_invs is not None:
                v = v[self.part_invs[S + i]]
            return v

        return {
            "variables": [self._reassemble(a, i) for i, a in
                          enumerate(self._sharded_state("variables"))]
            + [coarse_ext(v, i)
               for i, v in enumerate(self.state["variables_c"])],
            "residuals": [self._reassemble(a, i) for i, a in
                          enumerate(self._sharded_state("residuals"))]
            + [coarse_ext(r, i)
               for i, r in enumerate(self.state["residuals_c"])],
        }

    def _install_node_major(self, st: dict) -> None:
        """Inverse of _state_node_major: split each sharded level into
        per-shard storage blocks (tails keep their init fill) and
        install."""
        dtype = jnp.dtype(self.config.dtype)
        S = len(self.smesh.levels)

        def split(sd, current, src):
            full = np.array(current).reshape(sd.P, sd.block, NVAR)
            for p in range(sd.P):
                lo = p * sd.part_width
                hi = min(lo + sd.part_width, sd.num_nodes)
                full[p, :hi - lo] = src[lo:hi]
            with self.jmesh:
                return jnp.asarray(full.reshape(sd.P * sd.block, NVAR),
                                   dtype)

        def internal(a, level):
            a = np.asarray(a)
            if self.part_orders is not None:
                a = a[self.part_orders[level]]
            return a

        def coarse_in(a, i, current):
            a = internal(a, S + i)
            if not self._tc:
                return jnp.asarray(a, dtype)
            cur = np.array(current)                 # (5, num_lanes)
            cur[:, :a.shape[0]] = np.asarray(a).T
            return jnp.asarray(cur, dtype)

        for key, target in (("variables", "variables"),
                            ("residuals", "residuals")):
            blocks = [split(self.smesh.levels[i],
                            self._sharded_state(target)[i],
                            internal(st[key][i], i)) for i in range(S)]
            self.state[target + "0"] = blocks[0]
            self.state[target + "_sx"] = blocks[1:]
            self.state[target + "_c"] = [
                coarse_in(a, i, self.state[target + "_c"][i])
                for i, a in enumerate(st[key][S:])]

    def run(self, cycles: int, verbose: bool = False):
        ck_every = self.config.checkpoint_every
        for i in range(cycles):
            self.state, rms, invalid = self._cycle(self.state)
            inv = int(invalid)
            if inv > 0:
                raise FloatingPointError(
                    f"invalid state in sharded cycle {i + 1}: {inv}")
            self.rms_history.append(float(rms))
            if verbose:
                print(f"MG cycle {i + 1} / {cycles} "
                      f"(RMS = {float(rms):.3e})")
            self.completed_cycles += 1
            if (ck_every and self.config.checkpoint_dir
                    and self.completed_cycles % ck_every == 0):
                from ..utils.checkpoint import save_checkpoint
                save_checkpoint(self.config.checkpoint_dir, self.mesh,
                                self._state_node_major(),
                                self.completed_cycles, self.rms_history)
        return self.state

    def step_factors(self, level: int = 0) -> np.ndarray:
        """Step factors recomputed from the current state (the dump
        contract, io_enhanced.cpp:652-670); volumes are unconditioned
        mesh data, identical on every path."""
        from ..ops import compute_step_factor, compute_step_factor_legacy
        v = jnp.asarray(self.variables(level),
                        jnp.dtype(self.config.dtype))
        vol = jnp.asarray(self.mesh.levels[level].volumes, v.dtype)
        if self.mesh.variant.uses_legacy_step_factor:
            return np.asarray(compute_step_factor_legacy(v, vol))
        return np.asarray(compute_step_factor(v, vol))

    def dump_hlo(self, out_dir: str) -> list:
        """Optimized HLO of the whole compiled sharded V-cycle (the
        multi-chip twin of MGCFDSolver.dump_hlo)."""
        import os
        os.makedirs(out_dir, exist_ok=True)
        p = os.path.join(out_dir, "sharded_vcycle.hlo.txt")
        with open(p, "w") as f:
            f.write(self._cycle.lower(self.state).compile().as_text())
        return [p]

    def run_batched(self, cycles: int, cycles_per_dispatch: int = 10,
                    verbose: bool = False):
        """K sharded V-cycles per device dispatch (lax.scan around the
        shard_map'd cycle inside one jit) — the multi-chip twin of
        MGCFDSolver.run_batched: amortises per-execution overhead and
        keeps the whole batch on-device between host syncs."""
        k = max(1, min(cycles_per_dispatch, cycles))
        if getattr(self, "_multi_k", None) != k:
            raw = self._cycle.raw
            consts = self._cycle.consts

            # consts as jit arguments (see make_sharded_cycle_fn: the
            # closure-embedded form blew the remote compiler's size
            # limit on the tet-flagship sharded program)
            @jax.jit
            def multi_jit(state, sh, rep):
                def body(s, _):
                    s2, rms, inv = raw(s, sh, rep)
                    return s2, (rms, inv)
                return jax.lax.scan(body, state, None, length=k)

            def multi(state, _c=consts):
                return multi_jit(state, *_c)

            self._multi = multi
            self._multi_k = k
        done = 0
        while done < cycles:
            if cycles - done < k:
                self.run(cycles - done, verbose=verbose)
                return self.state
            self.state, (rms, invalid) = self._multi(self.state)
            done += k
            self.completed_cycles += k
            inv = int(invalid.sum())
            if inv > 0:
                raise FloatingPointError(
                    f"invalid state within sharded cycles "
                    f"{done - k + 1}..{done}: {inv}")
            self.rms_history.extend(float(x) for x in np.asarray(rms))
            if verbose:
                print(f"MG cycle {done} / {cycles} "
                      f"(RMS = {self.rms_history[-1]:.3e})")
        return self.state

    def variables(self, level: int = 0) -> np.ndarray:
        S = len(self.smesh.levels)
        if level < S:
            # per-shard storage blocks may carry window-rounding padding
            # at their tails: reassemble by partition width
            return self._reassemble(
                self._sharded_state("variables")[level], level)
        v = np.asarray(self.state["variables_c"][level - S])
        if self._tc:
            v = v[:, :self.dmesh_coarse[level - S].num_nodes].T
        if self.part_invs is not None:
            v = v[self.part_invs[level]]
        return v


def dryrun(n_devices: int) -> None:
    """Driver hook: full sharded training step on an n-device mesh with
    tiny shapes; compiles and executes one cycle."""
    from ..bench.flagship import FlagshipSpec, flagship_mesh

    devices = jax.devices()
    if len(devices) < n_devices:
        # this machine's site hook pins the default platform to the (single)
        # TPU; the virtual multi-device mesh lives on the cpu backend
        devices = jax.devices("cpu")
    assert len(devices) >= n_devices, (
        f"need {n_devices} devices, have {len(devices)}")
    spec = FlagshipSpec(nx=8, ny=8, nz=8, num_levels=3)
    mgmesh = flagship_mesh(spec)
    cfg = SolverConfig(dtype="float32", num_partitions=n_devices,
                       include_indirect_rw=False)
    # Commit every array this block creates to the CPU backend even when the
    # process default platform is a real accelerator (axon site hook).
    with jax.default_device(devices[0]):
        solver = ShardedSolver(mgmesh, cfg, devices=devices[:n_devices])
        solver.run(cycles=1)
        # production windowed-gather kernel sharded: a mesh wide enough
        # that several shards carry real windows and cross-shard halves
        spec_w = FlagshipSpec(nx=16, ny=12, nz=12, num_levels=3)
        cfg_w = SolverConfig(dtype="float32", num_partitions=n_devices,
                             accumulate="window",
                             include_indirect_rw=True,
                             shard_levels=2)
        solver_w = ShardedSolver(flagship_mesh(spec_w), cfg_w,
                                 devices=devices[:n_devices])
        solver_w.run(cycles=1)
        assert len(solver_w.smesh.levels) == 2
    assert np.isfinite(solver.rms_history[-1])
    assert np.isfinite(solver_w.rms_history[-1])
    assert solver_w.smesh.level0.win_arrays is not None
    print(f"dryrun_multichip({n_devices}): ok, "
          f"rms={solver.rms_history[-1]:.3e}, "
          f"window rms={solver_w.rms_history[-1]:.3e}")
