"""Single-chip multigrid Euler solver.

Control flow mirrors the reference driver's main loop
(euler3d_cpu_double.cpp:371-694) — copy old state, step factor, 3-stage RK
smoothing with internal/boundary/wall fluxes, residual + RMS, and the
restrict-up / prolong-down V-cycle walk — but the whole V-cycle is ONE
traced, jit-compiled function over a pytree of per-level arrays: XLA fuses
the node-wise kernels into the gather/scatter stream, and there is no
host round-trip inside a cycle.

Visit order per cycle (L levels): 0,1,...,L-1 on the way up (restricting
after each), then prolong/visit pairs down to level 0, which is only
visited at the start of the next cycle — exactly the reference's walk
(one visit per loop iteration, transition after; euler3d:514-693).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import SolverConfig
from ..core.constants import RK, NVAR, far_field_state, MeshVariant
from ..core.types import MultigridMesh
from ..mesh.build import apply_ewt_conditioning
from ..ops import (
    internal_edge_flux, boundary_edge_flux, wall_edge_flux,
    internal_edge_flux_crippled, indirect_rw_edge_values, accumulate_flux,
    compute_step_factor, compute_step_factor_legacy, time_step,
    mg_restrict, prolong_residuals_interpolate,
    residual, calc_rms, invalid_variables_count,
)


@dataclasses.dataclass
class DeviceLevel:
    volumes: Any
    coords: Optional[Any]
    edge_a: Any
    edge_b: Any
    edge_w: Any
    edge_ewt: Optional[Any]      # precomputed |edge_w| or None
    bedge_b: Any
    bedge_w: Any
    wedge_b: Any
    wedge_w: Any
    mg_mapping: Optional[Any]
    num_nodes: int
    num_lanes: int = 0            # lane-padded state width (>= num_nodes)
    # when the pallas megakernel runs this level: its operand must be
    # block-divisible and XLA materialises a standalone pad at ~1/25th
    # of copy speed, so the transposed state itself carries the padding
    # (tail lanes hold far-field gas and never change). 0 = num_nodes.
    ell: Optional[Any] = None     # IncidenceTables with device arrays
    restrict_tables: Optional[Any] = None  # (children, mask, mapped)
    restrict_structured: Optional[Any] = None  # (fdims, cdims, counts,
    # mapped) when this level's coarsening is a parity grid map
    prolong_tables: Optional[Any] = None   # dict, see build_prolong_tables
    prolong_shift_tables: Optional[Any] = None  # dict, span-dense prolong
    shift: Optional[Any] = None   # (deltas, [weights], (sa, sb, sw))
    shift_wpad_t: Optional[Any] = None  # (4, D*N) padded weights + |w|
    dense_bw_t: Optional[Any] = None  # (bd_normal, wall_normal, wall_const)
    pallas_flux: Optional[Any] = None  # PallasShiftFlux kernel
    pallas_fused: Optional[Any] = None  # fused RK-stage kernel
    pallas_rw: Optional[Any] = None   # indirect_rw twin kernel
    window_flux: Optional[Any] = None  # PallasWindowFlux (unstructured)
    window_fused: Optional[Any] = None  # fused RK-stage window kernel
    window_rw: Optional[Any] = None    # its indirect_rw twin
    window_arrays: Optional[Any] = None  # plan arrays (travel as jit args)
    prolong_window: Optional[Any] = None  # dict, see build_prolong_window
    restrict_window: Optional[Any] = None  # dict, see build_restrict_window


@dataclasses.dataclass
class DeviceMesh:
    levels: list
    variant: MeshVariant
    ff_flux: Any                  # (3,5) far-field flux tensor
    ff_q: Any                     # (5,) far-field state
    node_orders: Any = None       # per-level order[new]=old when the
    # solver runs on a tile-interleaved internal node order (window
    # mode; prep/renumber.tile_interleave_levels) — state I/O translates
    # through it so the external contract keeps the caller's order


def resolve_accumulate(mesh: MultigridMesh, config: SolverConfig) -> None:
    """accumulate='auto' (the default) -> the fast path for this
    backend/mesh/dtype, so an unadorned run gets TPU-native performance:

      - CPU backend, float64, or flux_fission: 'segment' (the robust
        fission-structured stream — the validation-path configuration,
        and the only auto target that honors flux_fission);
      - TPU with near-total shift-span coverage on every level (box-class
        meshes): 'pallas' (the fused-span megakernel);
      - otherwise: 'window' (the any-mesh windowed-gather kernels).

    Explicit --accumulate choices are never overridden. Mutates config
    in place (idempotent once resolved)."""
    if config.accumulate != "auto":
        return
    if (config.flux_fission or config.dtype == "float64"
            or jax.default_backend() == "cpu"):
        config.accumulate = "segment"
        return
    from ..prep.shift import build_shift_plan
    cov = min(build_shift_plan(l).coverage for l in mesh.levels)
    config.accumulate = "pallas" if cov >= 0.995 else "window"


def prepare_device_mesh(mesh: MultigridMesh, config: SolverConfig,
                        device=None) -> DeviceMesh:
    """Condition edge weights per mesh variant (euler3d:333-352), optionally
    precompute |e| (FLUX_PRECOMPUTE_EDGE_WEIGHTS, euler3d:354-362), cast to
    the configured dtype and upload."""
    from ..utils.logging import log
    resolve_accumulate(mesh, config)
    dtype = jnp.dtype(config.dtype)
    log("prepare_device_mesh: %d levels, dtype=%s, accumulate=%s",
        len(mesh.levels), config.dtype, config.accumulate)
    # conditioning mutates edge weights: work on copies
    levels = [dataclasses.replace(l) for l in mesh.levels]
    for l in levels:
        l.edge_w = l.edge_w.copy()
        l.bedge_w = l.bedge_w.copy()
        l.wedge_w = l.wedge_w.copy()
    node_orders = None
    win_node_map = "interleave"
    if config.accumulate == "window" and config.window_tile_order:
        # INTERNAL tile-interleaved node order: the window kernels'
        # (8, 128) tile layout becomes the memory layout, so every
        # kernel operand/result is a pure reshape of the (5, P) state —
        # measured ~1.9 ms/cycle of XLA concat/reshape/transpose on the
        # tet flagship otherwise. State I/O (variables(), checkpoints,
        # dumps) translates back to the caller's order via node_orders.
        from ..prep.renumber import tile_interleave_levels
        levels, node_orders = tile_interleave_levels(levels)
        win_node_map = "linear"
    elif config.accumulate == "pallas":
        # the shift megakernel needs the banded node order (spans), so
        # the mesh is NOT tile-interleaved — but the MG-transfer wsum
        # plans can still use the position-major map: it is a pure
        # reshape of ANY (5, P) array, so their kernel operands/results
        # need no (128,8)->(8,128) relayout (xprof: ~0.3 ms/cycle of
        # reshape+transpose on the fused box flagship). The coloring is
        # a little deeper (box restrict 12.8 -> 18.8 layers) but the
        # MG kernels are a small fraction of the cycle.
        win_node_map = "linear"
    apply_ewt_conditioning(levels, mesh.variant)

    def put(x, dt=dtype):
        arr = jnp.asarray(np.asarray(x), dtype=dt)
        return jax.device_put(arr, device) if device is not None else arr

    dlevels = []
    for l in levels:
        ewt = None
        if config.flux_precompute_edge_weights:
            ewt = put(np.sqrt((l.edge_w ** 2).sum(axis=1)))
        ell = None
        if config.accumulate == "ell":
            from ..prep.incidence import build_incidence
            import dataclasses as _dc
            t = build_incidence(l)
            ell = _dc.replace(t, slots=put(t.slots, jnp.int32),
                              signs=put(t.signs, jnp.int8))
        shift = None
        shift_wpad_t = None
        pallas_rw = None
        dense_bw_t = None
        pallas_flux = None
        pallas_fused = None
        window_flux = None
        window_fused = None
        window_rw = None
        window_arrays = None
        if config.accumulate == "window":
            # windowed-gather path (prep/window.py): arbitrary meshes,
            # incl. genuinely unstructured ones where the shift plan
            # collapses. Spill edges ride the generic spill segment-sum.
            from ..prep.window import build_window_plan, cached_plan
            from ..pallas.flux_window import PallasWindowFlux
            wplan = cached_plan(
                config.plan_cache_dir, "flux",
                (l.edge_a, l.edge_b, l.edge_w,
                 np.asarray([l.num_nodes]),
                 np.frombuffer(win_node_map.encode(), np.uint8)),
                lambda l=l: build_window_plan(l, node_map=win_node_map))
            interp = jax.default_backend() == "cpu"
            window_flux = PallasWindowFlux(wplan, l.num_nodes,
                                           dtype=dtype, interpret=interp)
            window_arrays = window_flux.arrays
            if config.include_indirect_rw:
                window_rw = PallasWindowFlux(
                    wplan, l.num_nodes, dtype=dtype, interpret=interp,
                    rw=True, arrays=window_arrays)
            shift = ([], [], (put(wplan.spill_a, jnp.int32),
                              put(wplan.spill_b, jnp.int32),
                              put(wplan.spill_w)))
            from ..ops.tops import build_dense_boundary_wall
            bdn, wln, wlc = build_dense_boundary_wall(
                l.num_nodes, l.bedge_b, l.bedge_w, l.wedge_b, l.wedge_w,
                far_field_state(np.float64)[1])
            dense_bw_t = (put(bdn), put(wln), put(wlc))
            fuse_win = config.fuse_window_stage
            if fuse_win is None:
                # auto: fuse while the fused kernel keeps whole-X VMEM
                # residency (measured faster there once depth-bucketed:
                # 9.33 vs 9.64 ms/cycle tet flagship, BASELINE.md);
                # above the cliff the extra operands risk the Mosaic
                # compile ceiling
                from ..pallas.flux_window import WHOLE_X_LIMIT_BYTES, NCH
                fuse_win = (wplan.src_windows * NCH * 4096
                            <= WHOLE_X_LIMIT_BYTES)
            if fuse_win and window_flux.padded == window_flux.padded_in:
                from ..pallas.flux_window import PallasWindowFusedStage
                window_fused = PallasWindowFusedStage(
                    window_flux, bdn, wln, wlc, dtype=dtype)
        if config.accumulate in ("shift", "pallas"):
            from ..prep.shift import build_shift_plan
            plan = build_shift_plan(l)
            shift = (plan.deltas, [put(w) for w in plan.weights],
                     (put(plan.spill_a, jnp.int32),
                      put(plan.spill_b, jnp.int32),
                      put(plan.spill_w)))
            if plan.deltas:
                # rows 0:3 zero-padded weights, row 3 precomputed |w|
                # (host fp64, one sqrt chain per edge saved on device);
                # stored span-major (4, D*N) — the rolled kernel's
                # native operand layout
                wpad = np.zeros((len(plan.deltas), 4, l.num_nodes))
                for i, w in enumerate(plan.weights):
                    wpad[i, :3, :w.shape[0]] = w.T
                    wpad[i, 3, :w.shape[0]] = np.sqrt((w ** 2).sum(axis=1))
                shift_wpad_t = put(wpad.transpose(1, 0, 2).reshape(
                    4, len(plan.deltas) * l.num_nodes))
            from ..ops.tops import build_dense_boundary_wall
            bdn, wln, wlc = build_dense_boundary_wall(
                l.num_nodes, l.bedge_b, l.bedge_w, l.wedge_b, l.wedge_w,
                far_field_state(np.float64)[1])
            if config.accumulate == "pallas":
                from ..pallas.flux_shift import PallasShiftFlux, \
                    PallasFusedStage, pallas_shift_flux
                interp = jax.default_backend() == "cpu"
                pallas_flux = pallas_shift_flux(plan, l.num_nodes,
                                                dtype=dtype,
                                                interpret=interp)
                if config.fuse_stage:
                    pallas_fused = PallasFusedStage(
                        pallas_flux, bdn, wln, wlc, dtype=dtype)
                if config.include_indirect_rw:
                    pallas_rw = PallasShiftFlux(
                        plan.deltas, plan.weights, l.num_nodes,
                        dtype=dtype, interpret=interp, rw=True)
            dense_bw_t = (put(bdn), put(wln), put(wlc))
        num_lanes = l.num_nodes
        vol_host = l.volumes
        pad_kernel = pallas_flux if pallas_flux is not None else window_flux
        if pad_kernel is not None and pad_kernel.padded != l.num_nodes:
            # lane-padded state (see DeviceLevel.num_lanes): tail volumes
            # are huge so the tail's local dt never wins the global min
            # (cfd_loops.cpp:137-150 analogue); tail aggregate normals
            # are zero so the dense boundary/wall flux vanishes there
            num_lanes = pad_kernel.padded
            tail = num_lanes - l.num_nodes
            vol_host = np.concatenate([l.volumes, np.full(tail, 1e30)])
            bdn, wln, wlc = (np.concatenate(
                [a, np.zeros((a.shape[0], tail))], axis=1)
                for a in (bdn, wln, wlc))
            dense_bw_t = (put(bdn), put(wln), put(wlc))
        dlevels.append(DeviceLevel(
            ell=ell, shift=shift, shift_wpad_t=shift_wpad_t,
            dense_bw_t=dense_bw_t, pallas_flux=pallas_flux,
            pallas_fused=pallas_fused,
            pallas_rw=pallas_rw, window_flux=window_flux,
            window_fused=window_fused,
            window_rw=window_rw, window_arrays=window_arrays,
            num_lanes=num_lanes,
            volumes=put(vol_host),
            coords=None if l.coords is None else put(l.coords),
            edge_a=put(l.edge_a, jnp.int32),
            edge_b=put(l.edge_b, jnp.int32),
            edge_w=put(l.edge_w),
            edge_ewt=ewt,
            bedge_b=put(l.bedge_b, jnp.int32),
            bedge_w=put(l.bedge_w),
            wedge_b=put(l.wedge_b, jnp.int32),
            wedge_w=put(l.wedge_w),
            mg_mapping=None if l.mg_mapping is None
            else put(l.mg_mapping, jnp.int32),
            num_nodes=l.num_nodes,
        ))
    # gather-transpose multigrid tables (scatter-free restrict/prolong)
    if config.mg_gather:
        from ..ops.mg import build_restrict_children, build_prolong_tables
        for i in range(len(levels) - 1):
            fine, coarse = levels[i], levels[i + 1]
            if fine.mg_mapping is None:
                continue
            ch, mask, mapped = build_restrict_children(
                fine.mg_mapping, coarse.num_nodes)
            dlevels[i].restrict_tables = (
                put(ch, jnp.int32), put(mask), jnp.asarray(mapped))
            # structured parity coarsening: strided slices replace the
            # children gather entirely
            from ..ops.mg import is_parity_coarsening
            if (fine.structured_dims and coarse.structured_dims
                    and is_parity_coarsening(fine.mg_mapping,
                                             fine.structured_dims,
                                             coarse.structured_dims)):
                counts = np.bincount(fine.mg_mapping,
                                     minlength=coarse.num_nodes)
                dlevels[i].restrict_structured = (
                    tuple(fine.structured_dims),
                    tuple(coarse.structured_dims),
                    put(counts.astype(np.float64)), jnp.asarray(mapped))
            if (fine.coords is not None and coarse.coords is not None
                    and fine.mg_mapping.shape[0] == fine.num_nodes):
                from ..ops.mg import build_prolong_shift

                def conv(v):
                    if isinstance(v, np.ndarray):
                        if v.dtype.kind == "i":
                            return put(v, jnp.int32)
                        if v.dtype == np.bool_:
                            return jnp.asarray(v)
                        return put(v)
                    return v

                g = build_prolong_tables(
                    fine.coords, coarse.coords, fine.mg_mapping,
                    fine.edge_a, fine.edge_b)
                dlevels[i].prolong_tables = {k: conv(v)
                                             for k, v in g.items()}
                ps = build_prolong_shift(
                    fine.coords, coarse.coords, fine.mg_mapping,
                    fine.edge_a, fine.edge_b)
                pst = {
                    "per_delta": [tuple([d] + [conv(x) for x in rest])
                                  for d, *rest in ps["per_delta"]],
                    "spill": None if ps["spill"] is None
                    else {k: conv(v) for k, v in ps["spill"].items()},
                    "cdiag": conv(ps["cdiag"]),
                    "b1_deltas": [(d, conv(B1))
                                  for d, B1 in ps["b1_deltas"]],
                    "winv": conv(ps["winv"]),
                    "coincident": conv(ps["coincident"]),
                    "parent": conv(ps["parent"]),
                }
                from ..ops.mg import is_parity_coarsening as _ipc
                if (fine.structured_dims and coarse.structured_dims
                        and _ipc(fine.mg_mapping, fine.structured_dims,
                                 coarse.structured_dims)):
                    pst["structured"] = (tuple(fine.structured_dims),
                                         tuple(coarse.structured_dims))
                dlevels[i].prolong_shift_tables = pst
            # windowed MG transfers serve BOTH padded-kernel modes: the
            # plans are built directly in the lane-padded node spaces
            # (num_lanes — 1024-aligned for window AND pallas since the
            # shift megakernel's block is a whole number of vreg
            # windows), so kernels read/write the padded state with no
            # per-call relayout. For pallas/box this replaces the parity
            # slice restrict (27 GB/s) + upsample broadcast (32 GB/s)
            # measured at ~1.3 ms/cycle on the fused flagship (xprof).
            fine_pad = dlevels[i].num_lanes or fine.num_nodes
            coarse_pad = dlevels[i + 1].num_lanes or coarse.num_nodes
            use_win_mg = (config.accumulate in ("window", "pallas")
                          and fine_pad % 1024 == 0
                          and coarse_pad % 1024 == 0)
            if (use_win_mg
                    and fine.mg_mapping.shape[0] == fine.num_nodes):
                # windowed restriction: coarse owners gather their fine
                # children at weight 1/count (cross-space plan) — the
                # last XLA row-gather in the tet cycle's up-sweep
                from ..prep.window import build_restrict_window, \
                    cached_plan as _cp
                from ..pallas.flux_window import PallasWindowFlux as _PW
                rwb = _cp(config.plan_cache_dir, "restrict",
                          (fine.mg_mapping,
                           np.asarray([fine.num_nodes, coarse.num_nodes,
                                       fine_pad, coarse_pad]),
                           np.frombuffer(win_node_map.encode(),
                                         np.uint8)),
                          lambda fine=fine, coarse=coarse:
                          build_restrict_window(fine.mg_mapping,
                                                fine.num_nodes,
                                                coarse.num_nodes,
                                                num_fine_pad=fine_pad,
                                                num_coarse_pad=coarse_pad,
                                                node_map=win_node_map))
                rk = _PW(rwb["plan"], coarse.num_nodes, dtype=dtype,
                         interpret=jax.default_backend() == "cpu",
                         mode="wsum")
                Pc = rk.padded
                mapped_pad = np.zeros(Pc, bool)
                mapped_pad[:rwb["mapped"].shape[0]] = rwb["mapped"]
                dlevels[i].restrict_window = {
                    "kernel": rk, "arrays": rk.arrays,
                    "mapped": jnp.asarray(mapped_pad),
                    "spill_fine": put(rwb["spill_fine"], jnp.int32),
                    "spill_coarse": put(rwb["spill_coarse"], jnp.int32),
                    "spill_w": put(rwb["spill_w"]),
                }
            if (use_win_mg
                    and fine.coords is not None
                    and coarse.coords is not None
                    and fine.mg_mapping.shape[0] == fine.num_nodes):
                # windowed prolongation: the only neighbor-coupled term
                # rides the wsum kernel; the rest is dense. Replaces the
                # per-edge ELL spill gather that dominated the tet
                # V-cycle at 6 GB/s (xprof, BASELINE.md).
                from ..prep.window import build_prolong_window, \
                    cached_plan
                from ..pallas.flux_window import PallasWindowFlux
                pwb = cached_plan(
                    config.plan_cache_dir, "prolong",
                    (fine.edge_a, fine.edge_b, fine.coords,
                     coarse.coords, fine.mg_mapping,
                     # trailing entry = ALGORITHM version: bump when
                     # build_prolong_window changes what it packs
                     # (v2 = duplicate (fine, parent) pairs collapsed)
                     np.asarray([fine_pad, coarse_pad, 2]),
                     np.frombuffer(win_node_map.encode(), np.uint8)),
                    lambda fine=fine, coarse=coarse:
                    build_prolong_window(fine, coarse,
                                         num_fine_pad=fine_pad,
                                         node_map=win_node_map,
                                         num_coarse_pad=coarse_pad))
                interp = jax.default_backend() == "cpu"
                if "cplan" in pwb:
                    # composed operator: wavg = CPLAN(rc) in one
                    # cross-space kernel (prep/window.py docstring) —
                    # replaces the parent-gather + B1 two-kernel chain
                    # and the materialized G intermediate
                    ck = PallasWindowFlux(pwb["cplan"], fine.num_nodes,
                                          dtype=dtype, interpret=interp,
                                          mode="wsum")
                    Ppad = ck.padded
                    nfi = fine.num_nodes
                    dlevels[i].prolong_window = {
                        "composed_kernel": ck,
                        "composed_arrays": ck.arrays,
                        "live": put(np.concatenate(
                            [np.ones(nfi), np.zeros(Ppad - nfi)])),
                        "cspill_fine": put(pwb["cspill_fine"],
                                           jnp.int32),
                        "cspill_coarse": put(pwb["cspill_coarse"],
                                             jnp.int32),
                        "cspill_w": put(pwb["cspill_w"]),
                    }
                    continue
                wk = PallasWindowFlux(pwb["plan"], fine.num_nodes,
                                      dtype=dtype, interpret=interp,
                                      mode="wsum")
                Ppad = wk.padded
                nfi = fine.num_nodes

                def padded(x, fill, dt=None):
                    out = np.full(Ppad, fill, dtype=x.dtype)
                    out[:nfi] = x
                    return out if dt is None else out.astype(dt)

                wsafe = np.where(pwb["wsum"] > 0, pwb["wsum"], 1.0)
                dlevels[i].prolong_window = {
                    "kernel": wk, "arrays": wk.arrays,
                    "dense_local": put(padded(pwb["dense_local"], 0.0)),
                    "inv_wsum": put(1.0 / padded(wsafe, 1.0)),
                    "coincident": jnp.asarray(
                        padded(pwb["coincident"], True)),
                    "parent": put(padded(pwb["parent"], 0), jnp.int32),
                    "live": put(np.concatenate(
                        [np.ones(nfi), np.zeros(Ppad - nfi)])),
                    "spill_a2": put(pwb["spill_a2"], jnp.int32),
                    "spill_b2": put(pwb["spill_b2"], jnp.int32),
                    "spill_B1": put(pwb["spill_B1"]),
                }

    ff_q, ff_flux = far_field_state(np.float64)
    return DeviceMesh(levels=dlevels, variant=mesh.variant,
                      ff_flux=put(ff_flux), ff_q=put(ff_q),
                      node_orders=node_orders)


# ---------------------------------------------------------------------------
# kernels over one level
# ---------------------------------------------------------------------------

def _compute_fluxes(lvl: DeviceLevel, variables, ff_flux, config):
    """One flux evaluation: internal + boundary + wall, accumulated."""
    if config.accumulate == "shift" and lvl.shift is not None:
        from ..prep.shift import shift_flux
        deltas, weights, spill = lvl.shift
        flux = shift_flux(deltas, weights, spill, variables,
                          internal_edge_flux, lvl.num_nodes)
        val_bd = boundary_edge_flux(variables[lvl.bedge_b], lvl.bedge_w)
        val_w = wall_edge_flux(variables[lvl.wedge_b], lvl.wedge_w,
                               ff_flux)
        flux = flux + jax.ops.segment_sum(
            jnp.concatenate([val_bd, val_w]),
            jnp.concatenate([lvl.bedge_b, lvl.wedge_b]),
            num_segments=lvl.num_nodes)
        return flux
    q_a = variables[lvl.edge_a]
    q_b = variables[lvl.edge_b]
    val_i = internal_edge_flux(q_a, q_b, lvl.edge_w, lvl.edge_ewt)
    val_bd = boundary_edge_flux(variables[lvl.bedge_b], lvl.bedge_w)
    val_w = wall_edge_flux(variables[lvl.wedge_b], lvl.wedge_w, ff_flux)
    if config.accumulate == "ell" and lvl.ell is not None:
        from ..prep.incidence import ell_accumulate
        return ell_accumulate(lvl.ell, val_i, val_bd, val_w)
    return accumulate_flux(
        lvl.num_nodes, lvl.edge_a, lvl.edge_b, val_i,
        lvl.bedge_b, val_bd, lvl.wedge_b, val_w,
        mode=config.accumulate if config.accumulate in ("segment", "scatter")
        else "segment")


def _indirect_rw_token(lvl: DeviceLevel, variables, config):
    """The data-movement-only twin (indirect_rw_loop.cpp): runs with the
    same gather/scatter pattern; its node accumulation is reduced to one
    scalar token so jit cannot dead-code it, and the solver discards the
    values exactly like the reference's zero_fluxes (euler3d:491-505)."""
    q_a = variables[lvl.edge_a]
    q_b = variables[lvl.edge_b]
    val_a, val_b = indirect_rw_edge_values(q_a, q_b, lvl.edge_w)
    acc = accumulate_flux(lvl.num_nodes, lvl.edge_a, lvl.edge_b, val_a,
                          mode="segment", val_internal_b=val_b)
    return jnp.sum(acc)


def _kscope(kernel: str, tag):
    """Named scope `k_<kernel>_l<tag>` stamped into every op's HLO
    metadata op_name — the hook `--measure-ops` uses to attribute
    per-op device time inside the PRODUCTION one-jit cycle back to
    (kernel, level) (monitor/opstats.production_kernel_times; the
    reference wraps PAPI around the loops it actually runs,
    papi_funcs.cpp:256-323). Zero runtime cost (trace-time only)."""
    if tag is None:
        import contextlib
        return contextlib.nullcontext()
    return jax.named_scope(f"k_{kernel}_l{tag}")


def _visit(lvl: DeviceLevel, variables, ff_flux, config,
           legacy_step: bool, io_transposed: bool = False, tag=None):
    """One smoothing pass on one level: returns (variables, old, residuals,
    step_factors, invalid_count, rw_token). Reference inner loop:
    euler3d_cpu_double.cpp:383-512."""
    if lvl.shift is not None and (config.transposed
                                  or config.accumulate in ("pallas",
                                                           "window")):
        return _visit_transposed(lvl, variables, ff_flux, config,
                                 legacy_step, io_transposed, tag)
    assert not io_transposed
    old = variables
    with _kscope("compute_step", tag):
        if legacy_step:
            sf = compute_step_factor_legacy(variables, lvl.volumes)
        else:
            sf = compute_step_factor(variables, lvl.volumes)

    invalid = jnp.int32(0)
    rw_token = jnp.zeros((), variables.dtype)
    for j in range(RK):
        if config.flux_cripple:
            # crippled twin runs first; its writes are discarded
            # (euler3d:399-418) — reduce to a token to keep it alive.
            q_a = variables[lvl.edge_a]
            q_b = variables[lvl.edge_b]
            crippled = internal_edge_flux_crippled(q_a, q_b, lvl.edge_w)
            rw_token = rw_token + jnp.sum(crippled) * jnp.zeros(
                (), variables.dtype)
        with _kscope("flux", tag):
            fluxes = _compute_fluxes(lvl, variables, ff_flux, config)
        with _kscope("time_step", tag):
            variables = time_step(j, sf, fluxes, old)
        invalid = invalid + invalid_variables_count(variables)
        if config.include_indirect_rw:
            with _kscope("indirect_rw", tag):
                rw_token = rw_token + _indirect_rw_token(lvl, variables,
                                                         config)

    res = residual(old, variables)
    return variables, old, res, sf, invalid, rw_token


def t_step_factor(lvl: DeviceLevel, q, legacy_step: bool):
    """Step factor, variable-major state (cfd_loops.cpp:76-157 semantics;
    lane-padded tails carry 1e30 volumes so they never win the min)."""
    from ..ops import tops

    prim = tops.t_primitives(q)
    if legacy_step:
        return 0.5 / (jnp.sqrt(lvl.volumes) * (prim["speed"] + prim["sos"]))
    dt = 0.5 * jnp.cbrt(lvl.volumes) / (prim["speed"] + prim["sos"])
    return jnp.broadcast_to(jnp.min(dt), dt.shape) / lvl.volumes


def t_compute_fluxes(lvl: DeviceLevel, q, ff_flux, config):
    """One full flux evaluation (internal + boundary + wall), variable-major.
    Dispatches the production fast path: pallas megakernel > batched-roll
    shift > per-span shift, plus the spill segment-sum and the dense
    aggregated boundary/wall fluxes. Shared by the fused V-cycle and the
    instrumented (per-kernel-timed) solver so Times.csv attributes the
    configuration users actually run."""
    from ..ops import tops

    deltas, weights, (sa, sb, sw) = lvl.shift
    nl = q.shape[1]
    if config.accumulate == "window" and lvl.window_flux is not None:
        flux = lvl.window_flux.traced(q, arrays=lvl.window_arrays)
    elif config.accumulate == "pallas" and lvl.pallas_flux is not None:
        flux = lvl.pallas_flux.traced(q)
    elif lvl.shift_wpad_t is not None:
        flux = tops.t_shift_flux_rolled(deltas, lvl.shift_wpad_t, q)
    else:
        flux = tops.t_shift_flux(deltas, [w.T for w in weights], q,
                                 lvl.num_nodes)
    if sa.shape[0]:
        val = tops.t_internal_edge_flux(q[:, sa], q[:, sb], sw.T)
        flux = flux + tops.t_segment_accumulate(
            jnp.concatenate([val, -val], axis=1),
            jnp.concatenate([sa, sb]), nl)
    if lvl.dense_bw_t is not None:
        bdn, wln, wlc = lvl.dense_bw_t
        if bdn.shape[1] != nl:  # unpadded input against padded constants
            bdn, wln, wlc = bdn[:, :nl], wln[:, :nl], wlc[:, :nl]
        flux = flux + tops.t_dense_boundary_wall_flux(q, bdn, wln, wlc)
    else:
        val_bd = tops.t_boundary_edge_flux(q[:, lvl.bedge_b],
                                           lvl.bedge_w.T)
        # ff_flux is already (3, 5) = [direction, variable]
        val_w = tops.t_wall_edge_flux(q[:, lvl.wedge_b],
                                      lvl.wedge_w.T, ff_flux)
        flux = flux + tops.t_segment_accumulate(
            jnp.concatenate([val_bd, val_w], axis=1),
            jnp.concatenate([lvl.bedge_b, lvl.wedge_b]), nl)
    return flux


def t_indirect_rw(lvl: DeviceLevel, q, config):
    """FAITHFUL indirect_rw twin, variable-major: identical slicing /
    roll / accumulate traffic with near-zero arithmetic
    (indirect_rw_loop.cpp:8-10 — the memory-bound roofline probe).
    Returns the accumulated array; the caller token-consumes it."""
    from ..ops import tops

    deltas, weights, (sa, sb, sw) = lvl.shift
    if config.accumulate == "window" and lvl.window_rw is not None:
        rw = lvl.window_rw.traced(q, arrays=lvl.window_arrays)
    elif config.accumulate == "pallas" and lvl.pallas_rw is not None:
        rw = lvl.pallas_rw.traced(q)
    elif lvl.shift_wpad_t is not None:
        rw = tops.t_shift_rw_rolled(deltas, lvl.shift_wpad_t, q)
    else:
        rw = tops.t_shift_flux(deltas, [w.T for w in weights], q,
                               lvl.num_nodes)
    if sa.shape[0]:
        valr = q[:, sa] + q[:, sb] + jnp.sum(sw.T, axis=0)[None]
        rw = rw + tops.t_segment_accumulate(
            jnp.concatenate([valr, -valr], axis=1),
            jnp.concatenate([sa, sb]), rw.shape[1])
    return rw


def t_invalid_count(q):
    """NaN/Inf/negative-density-or-energy count, variable-major (the
    lane-padded tail holds finite far-field gas, so it never trips)."""
    bad = ~jnp.isfinite(q)
    return (jnp.sum(bad) + jnp.sum(q[0] < 0)
            + jnp.sum(q[4] < 0)).astype(jnp.int32)


def _visit_transposed(lvl: DeviceLevel, variables, ff_flux, config,
                      legacy_step: bool, io_transposed: bool = False,
                      tag=None):
    """Variable-major RK inner loop (see ops/tops.py): the state lives as
    (NVAR, N) for the whole smoothing pass — full-lane layouts for the
    shift-decomposition flux. With io_transposed the caller already holds
    (and receives back) variable-major arrays; otherwise transposes happen
    at the visit boundary."""
    q = variables if io_transposed else variables.T
    old = q
    with _kscope("compute_step", tag):
        sf = t_step_factor(lvl, q, legacy_step)

    invalid = jnp.int32(0)
    rw_token = jnp.zeros((), variables.dtype)
    fused = None
    if config.accumulate == "pallas" and lvl.pallas_fused is not None:
        fused = lvl.pallas_fused.traced
    elif config.accumulate == "window" and lvl.window_fused is not None:
        def fused(qq, oo, ff, sp, lvl=lvl):
            return lvl.window_fused.traced(qq, oo, ff, sp,
                                           arrays=lvl.window_arrays)
    if fused is not None:
        # fused RK stage: ONE kernel launch per stage covers the whole
        # reference sequence flux -> boundary/wall -> time_step ->
        # invalid check (euler3d:383-512). Spill edges (outside the span
        # plan) are pre-accumulated and enter as a kernel input; the
        # step factor stays outside (its global min is a cross-block
        # reduction). The crippled diagnostic twin runs ALONGSIDE the
        # fused dispatch (token-consumed, writes discarded) so the flag
        # stays side-effect-free on the production pipeline — forcing
        # the unfused pipeline instead perturbs the solution at the
        # 1-ulp level (the in-kernel primitive completion compiles into
        # differently-rewritten XLA graphs fused vs unfused).
        from ..ops import tops
        _, _, (sa, sb, sw) = lvl.shift
        for j in range(RK):
            if config.flux_cripple:
                v_nm = q.T
                crippled = internal_edge_flux_crippled(
                    v_nm[lvl.edge_a], v_nm[lvl.edge_b], lvl.edge_w)
                rw_token = rw_token + jnp.sum(crippled) * jnp.zeros(
                    (), variables.dtype)
            # measure-ops attribution: the fused launch is ONE kernel
            # covering flux + dense boundary/wall + time_step + the
            # invalid count — its whole device time lands on the flux
            # row (the launch cannot be split; time_step rows stay 0
            # in fused mode and the flux row is the RK-stage time)
            with _kscope("flux", tag):
                spill = None
                if sa.shape[0]:
                    val = tops.t_internal_edge_flux(q[:, sa], q[:, sb],
                                                    sw.T)
                    spill = tops.t_segment_accumulate(
                        jnp.concatenate([val, -val], axis=1),
                        jnp.concatenate([sa, sb]), q.shape[1])
                fac = sf / float(RK + 1 - j)
                q, inv = fused(q, old, fac, spill)
            invalid = invalid + inv
            if config.include_indirect_rw:
                with _kscope("indirect_rw", tag):
                    rw = t_indirect_rw(lvl, q, config)
                rw_token = rw_token + jnp.sum(rw) * jnp.zeros(
                    (), variables.dtype)
        if io_transposed:
            return q, old, q - old, sf, invalid, rw_token
        return q.T, old.T, (q - old).T, sf, invalid, rw_token
    for j in range(RK):
        if config.flux_cripple:
            # crippled twin runs first with discarded writes
            # (euler3d:399-418), same as the node-major visit; its
            # gathers go over the full edge stream (a diagnostic — cost
            # only paid when the flag is on)
            v_nm = q.T
            crippled = internal_edge_flux_crippled(
                v_nm[lvl.edge_a], v_nm[lvl.edge_b], lvl.edge_w)
            rw_token = rw_token + jnp.sum(crippled) * jnp.zeros(
                (), variables.dtype)
        with _kscope("flux", tag):
            flux = t_compute_fluxes(lvl, q, ff_flux, config)
        from ..ops import tops
        with _kscope("time_step", tag):
            q = tops.t_time_step(j, sf, flux, old)
        invalid = invalid + t_invalid_count(q)
        if config.include_indirect_rw:
            # twin runs inside the RK loop like the reference
            # (euler3d:491-505); token-consumed so XLA cannot dead-code
            # it (the reference discards the writes via zero_fluxes)
            with _kscope("indirect_rw", tag):
                rw = t_indirect_rw(lvl, q, config)
            rw_token = rw_token + jnp.sum(rw) * jnp.zeros(
                (), variables.dtype)

    if io_transposed:
        return q, old, q - old, sf, invalid, rw_token
    return q.T, old.T, (q - old).T, sf, invalid, rw_token


# ---------------------------------------------------------------------------
# MG transfer dispatch (shared by the fused and instrumented solvers)
# ---------------------------------------------------------------------------

def apply_restrict(fine: DeviceLevel, coarse: DeviceLevel,
                   fine_r, coarse_r, tstate: bool):
    """Restrict fine variables onto the coarse level (euler3d:547-552),
    dispatching the fastest available formulation: structured parity
    slices > children gather > segment-mean scatter. Inputs/outputs are
    real-width arrays in the state layout (tstate => (NVAR, N))."""
    def nm(x):
        return x.T if tstate else x

    st = nm  # the layouts are each other's transpose
    rs, rt = fine.restrict_structured, fine.restrict_tables
    if rs is not None:
        fdims, cdims, counts, mapped = rs
        if tstate:
            # variable-major parity slices; the node-major twin under a
            # transposed cycle lowers to slow gathers
            from ..ops.mg import t_mg_restrict_structured
            return t_mg_restrict_structured(fine_r, coarse_r, fdims,
                                            cdims, counts, mapped)
        from ..ops.mg import mg_restrict_structured
        return mg_restrict_structured(fine_r, coarse_r, fdims, cdims,
                                      counts, mapped)
    if rt is not None:
        from ..ops.mg import mg_restrict_gather
        return st(mg_restrict_gather(nm(fine_r), nm(coarse_r), *rt))
    return st(mg_restrict(nm(fine_r), nm(coarse_r), fine.mg_mapping,
                          coarse.num_nodes))


def apply_prolong(fine: DeviceLevel, coarse: DeviceLevel,
                  res_c, res_f, vars_f, tstate: bool):
    """Prolong coarse residuals into the fine variables
    (mg_loops.cpp:678-864 live operator incl. the a1->b2 quirk),
    dispatching span-dense > gather > scatter formulations. res_c /
    res_f / vars_f are real-width arrays in the state layout."""
    def nm(x):
        return x.T if tstate else x

    st = nm
    if fine.prolong_shift_tables is not None:
        from ..ops.mg import prolong_shift
        return prolong_shift(nm(res_c), res_f, vars_f,
                             fine.prolong_shift_tables, transposed=tstate)
    if fine.prolong_tables is not None:
        from ..ops.mg import prolong_gather
        return st(prolong_gather(nm(res_c), nm(res_f), nm(vars_f),
                                 fine.prolong_tables))
    return st(prolong_residuals_interpolate(
        nm(res_c), nm(res_f), nm(vars_f), fine.mg_mapping, coarse.coords,
        fine.coords, fine.edge_a, fine.edge_b))


def apply_restrict_padded(fine: DeviceLevel, coarse: DeviceLevel,
                          vars_f, vars_c, tstate: bool):
    """Restriction on FULL (possibly lane-padded) state arrays. Prefers
    the cross-space windowed formulation (coarse owners gathering fine
    children at 1/count — the segment mean directly); unmapped coarse
    nodes and padding tails keep their old value. Falls back to
    apply_restrict on real-width views + lane_writeback."""
    rw_ = fine.restrict_window
    if tstate and rw_ is not None:
        from ..ops import tops
        mean = rw_["kernel"].traced(vars_f,
                                    arrays=rw_["arrays"])  # (5, Pc)
        sf = rw_["spill_fine"]
        if sf.shape[0]:
            vals = rw_["spill_w"][None] * vars_f[:, sf]
            mean = mean + tops.t_segment_accumulate(
                vals, rw_["spill_coarse"], mean.shape[1])
        return jnp.where(rw_["mapped"][None], mean, vars_c)
    fine_r = real_view(vars_f, fine, tstate)
    coarse_r = real_view(vars_c, coarse, tstate)
    new_c = apply_restrict(fine, coarse, fine_r, coarse_r, tstate)
    return lane_writeback(vars_c, new_c, coarse_r, tstate)


def apply_prolong_padded(fine: DeviceLevel, coarse: DeviceLevel,
                         res_c, res_f, vars_f, tstate: bool):
    """Prolong on FULL (possibly lane-padded) state arrays. Prefers the
    COMPOSED windowed formulation (prep/window.build_prolong_window
    with num_coarse_pad): one cross-space wsum kernel computes wavg
    directly from the coarse residuals. Older dicts without a composed
    plan use the parent lane-gather + dense node-local terms + the
    fine-space wsum kernel. Tail lanes are masked by `live` so the
    padding is untouched. Falls back to apply_prolong on real-width
    views + lane_writeback."""
    pw = fine.prolong_window
    structured = (fine.prolong_shift_tables is not None
                  and "structured" in fine.prolong_shift_tables)
    if tstate and pw is not None and not structured:
        ck = pw.get("composed_kernel")
        if ck is not None:
            # ONE cross-space kernel: wavg directly from the coarse
            # residuals (inv_wsum + coincident folded into the weights —
            # prep/window.build_prolong_window docstring)
            wavg = ck.traced(res_c, arrays=pw["composed_arrays"])
            if pw["cspill_fine"].shape[0]:
                from ..ops import tops
                vals = pw["cspill_w"][None] * res_c[:, pw["cspill_coarse"]]
                wavg = wavg + tops.t_segment_accumulate(
                    vals, pw["cspill_fine"], wavg.shape[1])
            return vars_f + pw["live"][None] * (res_f - wavg)
        G = res_c[:, pw["parent"]]                   # (5, P) lane gather
        acc = pw["dense_local"][None] * G \
            + pw["kernel"].traced(G, arrays=pw["arrays"])
        sa2 = pw["spill_a2"]
        if sa2.shape[0]:
            from ..ops import tops
            vals = pw["spill_B1"][None] * G[:, pw["spill_b2"]]
            acc = acc + tops.t_segment_accumulate(vals, sa2, G.shape[1])
        wavg = jnp.where(pw["coincident"][None], G,
                         acc * pw["inv_wsum"][None])
        return vars_f + pw["live"][None] * (res_f - wavg)
    rc = real_view(res_c, coarse, tstate)
    rf = real_view(res_f, fine, tstate)
    vf = real_view(vars_f, fine, tstate)
    new = apply_prolong(fine, coarse, rc, rf, vf, tstate)
    return lane_writeback(vars_f, new, vf, tstate)


# ---------------------------------------------------------------------------
# the V-cycle
# ---------------------------------------------------------------------------

def real_view(x, lvl: DeviceLevel, tstate: bool):
    """Slice a (possibly lane-padded) state array to the real node
    count. Fuses into the consumer's reads — no copy."""
    n = lvl.num_nodes
    if tstate:
        return x if x.shape[1] == n else x[:, :n]
    return x


def lane_writeback(full, new_real, old_real, tstate: bool):
    """Install an update computed on the real-width view into the
    (possibly lane-padded) state array. The pad sits under an add
    root, so it fuses (a pad/concat as fusion ROOT materialises at
    ~1/25th of copy speed on the v5e); the tail gets += 0 and keeps
    its far-field gas."""
    if not tstate or full.shape[1] == new_real.shape[1]:
        return new_real
    d = full.shape[1] - new_real.shape[1]
    zero = jnp.zeros((), full.dtype)
    return full + jax.lax.pad(new_real - old_real, zero,
                              ((0, 0, 0), (0, d, 0)))


def state_is_transposed(dmesh: DeviceMesh, config: SolverConfig) -> bool:
    """Whole-cycle variable-major state: every level must have a shift
    plan (the transposed visit requires one; window mode sets an empty
    one whose spill list carries its overflow edges)."""
    return ((config.transposed
             or config.accumulate in ("pallas", "window"))
            and all(l.shift is not None for l in dmesh.levels))


def _raw_cycle_fn(dmesh: DeviceMesh, config: SolverConfig):
    """Build the (untraced) full-V-cycle step closure.

    state: dict of per-level lists: variables, residuals — node-major
    (N,5), or variable-major (5,N) when state_is_transposed (saves the
    per-visit boundary transposes; MG transfers convert at the level
    boundary where needed).
    Returns (state, rms_level0, invalid_total, rw_token)."""
    L = len(dmesh.levels)
    legacy = dmesh.variant.uses_legacy_step_factor
    ff_flux = dmesh.ff_flux
    tstate = state_is_transposed(dmesh, config)

    def real(x, lvl):
        return real_view(x, lvl, tstate)

    def writeback(full, new_real, old_real):
        return lane_writeback(full, new_real, old_real, tstate)

    def cycle(state):
        variables = list(state["variables"])
        residuals = list(state["residuals"])
        invalid_total = jnp.int32(0)
        rw_token = jnp.zeros((), variables[0].dtype)

        def do_visit(l):
            nonlocal invalid_total, rw_token
            v, old, res, sf, inv, tok = _visit(
                dmesh.levels[l], variables[l], ff_flux, config, legacy,
                io_transposed=tstate, tag=l)
            variables[l] = v
            residuals[l] = res
            invalid_total = invalid_total + inv
            rw_token = rw_token + tok
            return res

        # --- up sweep ---
        rms = None
        for l in range(L - 1):
            res = do_visit(l)
            if l == 0:
                # layout-agnostic (sum of squares); explicit node count
                # because the state may be lane-padded (tail res == 0)
                rms = calc_rms(res, dmesh.levels[0].num_nodes)
            # restrict variables l -> l+1 (euler3d:547-552); measure-ops
            # attribution to the FINE level l, matching the instrumented
            # solver's k_restrict_l<l> modules
            with _kscope("restrict", l):
                variables[l + 1] = apply_restrict_padded(
                    dmesh.levels[l], dmesh.levels[l + 1], variables[l],
                    variables[l + 1], tstate)

        # --- top level ---
        res = do_visit(L - 1)
        if L == 1:
            rms = calc_rms(res, dmesh.levels[0].num_nodes)

        # --- down sweep ---
        for l in range(L - 2, -1, -1):
            fine = dmesh.levels[l]
            coarse = dmesh.levels[l + 1]
            with _kscope("prolong", l):
                variables[l] = apply_prolong_padded(
                    fine, coarse, residuals[l + 1], residuals[l],
                    variables[l], tstate)
            if l > 0:
                do_visit(l)

        new_state = {"variables": variables, "residuals": residuals}
        return new_state, rms, invalid_total, rw_token

    return cycle


class _Slot:
    def __init__(self, idx):
        self.idx = idx


def _split_arrays(obj, out):
    """Replace every array leaf in a (dict/list/tuple/dataclass) structure
    with a slot marker, collecting the arrays. Mesh constants must travel
    as jit ARGUMENTS, not closure constants: embedded constants bloat the
    serialized HLO (this environment's remote compiler rejects large
    bodies outright with HTTP 413) and slow every compile."""
    if isinstance(obj, (jax.Array, np.ndarray)):
        out.append(obj)
        return _Slot(len(out) - 1)
    if isinstance(obj, dict):
        return {k: _split_arrays(v, out) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_split_arrays(v, out) for v in obj]
    if isinstance(obj, tuple):
        return tuple(_split_arrays(v, out) for v in obj)
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type) \
            and not callable(obj):
        kw = {f.name: _split_arrays(getattr(obj, f.name), out)
              for f in dataclasses.fields(obj)}
        return (type(obj), kw)
    return obj


def _merge_arrays(tpl, arrays):
    if isinstance(tpl, _Slot):
        return arrays[tpl.idx]
    if isinstance(tpl, dict):
        return {k: _merge_arrays(v, arrays) for k, v in tpl.items()}
    if isinstance(tpl, list):
        return [_merge_arrays(v, arrays) for v in tpl]
    if isinstance(tpl, tuple):
        if len(tpl) == 2 and isinstance(tpl[0], type) \
                and dataclasses.is_dataclass(tpl[0]):
            cls, kw = tpl
            return cls(**{k: _merge_arrays(v, arrays)
                          for k, v in kw.items()})
        return tuple(_merge_arrays(v, arrays) for v in tpl)
    return tpl


def _parametrised(dmesh: DeviceMesh, config: SolverConfig, build):
    """Wrap `build(dmesh) -> fn(state)` so that every mesh array reaches
    the jit as an argument. Returns fn(state) with arrays bound."""
    arrays: list = []
    tpl = _split_arrays(
        {"levels": list(dmesh.levels), "ff_flux": dmesh.ff_flux,
         "ff_q": dmesh.ff_q}, arrays)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(state, arrs):
        parts = _merge_arrays(tpl, arrs)
        dm = DeviceMesh(levels=parts["levels"], variant=dmesh.variant,
                        ff_flux=parts["ff_flux"], ff_q=parts["ff_q"])
        return build(dm)(state)

    def bound(state):
        return run(state, arrays)

    bound.lower = lambda state: run.lower(state, arrays)
    bound.arrays = arrays        # for AOT probes: compiled(state, arrays)
    return bound


def make_cycle_fn(dmesh: DeviceMesh, config: SolverConfig):
    return _parametrised(dmesh, config,
                         lambda dm: _raw_cycle_fn(dm, config))


def make_multi_cycle_fn(dmesh: DeviceMesh, config: SolverConfig,
                        cycles_per_dispatch: int):
    """K V-cycles per device dispatch via lax.scan: amortises the fixed
    per-execution overhead (substantial through a remote TPU tunnel) and
    compiles the cycle body once. Returns (state, rms[K], invalid[K])."""
    def build(dm):
        raw = _raw_cycle_fn(dm, config)

        def multi(state):
            def body(s, _):
                s2, rms, invalid, _tok = raw(s)
                return s2, (rms, invalid)
            return jax.lax.scan(body, state, None,
                                length=cycles_per_dispatch)

        def flat(state):
            state, (rms, invalid) = multi(state)
            return state, rms, invalid
        return flat

    return _parametrised(dmesh, config, build)


class MGCFDSolver:
    """Host-side driver: owns device mesh + state, runs cycles, performs
    the fail-fast NaN check between cycles (check_for_invalid_variables
    semantics, validation.cpp:107-138)."""

    def __init__(self, mesh: MultigridMesh, config: SolverConfig | None = None,
                 device=None):
        self.config = config or SolverConfig()
        self.config.validate()
        self.mesh = mesh
        self.dmesh = prepare_device_mesh(mesh, self.config, device)
        self.dtype = jnp.dtype(self.config.dtype)
        ff_q = jnp.asarray(np.asarray(far_field_state(np.float64)[0]),
                           dtype=self.dtype)
        self._tstate = state_is_transposed(self.dmesh, self.config)

        def init_vars(l):
            # lane-padded levels initialise the tail with the same
            # far-field gas: physical (finite primitives), zero-weighted
            # in every kernel, so it never changes
            n = (l.num_lanes or l.num_nodes) if self._tstate \
                else l.num_nodes
            v = jnp.tile(ff_q[None, :], (n, 1))
            return v.T if self._tstate else v

        def init_res(l):
            n = (l.num_lanes or l.num_nodes) if self._tstate \
                else l.num_nodes
            shape = (NVAR, n) if self._tstate else (n, NVAR)
            return jnp.zeros(shape, self.dtype)

        self.state = {
            "variables": [init_vars(l) for l in self.dmesh.levels],
            "residuals": [init_res(l) for l in self.dmesh.levels],
        }
        self._cycle = make_cycle_fn(self.dmesh, self.config)
        self.rms_history: list[float] = []
        self.completed_cycles = 0
        if self.config.resume and self.config.checkpoint_dir:
            from ..utils.checkpoint import latest_checkpoint, \
                load_checkpoint
            path = latest_checkpoint(self.config.checkpoint_dir)
            if path is not None:
                st, self.completed_cycles, self.rms_history = \
                    load_checkpoint(path, mesh, self.dtype)
                # checkpoints are stored node-major regardless of the
                # in-memory layout
                if self._tstate:
                    st = self._pad_state_layout(st)
                self.state = st

    def _state_node_major(self):
        """Node-major (N, 5) view in the CALLER's node order with lane
        padding stripped (checkpoints and dumps are always real-width
        node-major external-order)."""
        orders = self.dmesh.node_orders
        ns = [l.num_nodes for l in self.dmesh.levels]
        if not self._tstate:
            if orders is None:
                return self.state
            return {k: [np.asarray(a)[np.argsort(o)]
                        for a, o in zip(v, orders)]
                    for k, v in self.state.items()}
        out = {}
        for k, v in self.state.items():
            res = []
            for i, (a, n) in enumerate(zip(v, ns)):
                t = np.asarray(a[:, :n].T)
                if orders is not None:
                    # internal new_id i holds external orders[i]: invert
                    inv = np.argsort(orders[i])
                    t = t[inv]
                res.append(t)
            out[k] = res
        return out

    def _pad_state_layout(self, st):
        """Inverse of _state_node_major: permute to the internal node
        order (if tile-interleaved), transpose to (5, N) and restore the
        lane padding (far-field tail for variables, zero residuals)."""
        ff = np.asarray(far_field_state(np.float64)[0])
        orders = self.dmesh.node_orders
        out = {}
        for k, arrs in st.items():
            res = []
            for i, (a, l) in enumerate(zip(arrs, self.dmesh.levels)):
                a = np.asarray(a)
                if orders is not None:
                    a = a[orders[i]]
                t = a.T
                n_lanes = l.num_lanes or l.num_nodes
                if n_lanes != t.shape[1]:
                    tail = n_lanes - t.shape[1]
                    if k == "variables":
                        filler = np.tile(ff[:, None], (1, tail))
                    else:
                        filler = np.zeros((t.shape[0], tail))
                    t = np.concatenate([t, filler], axis=1)
                res.append(jnp.asarray(t, self.dtype))
            out[k] = res
        return out

    def run(self, cycles: int | None = None, verbose: bool = False):
        """Run `cycles` more V-cycles (checkpoint cadence per config)."""
        cycles = cycles if cycles is not None else self.config.num_cycles
        check_every = max(1, self.config.check_invalid_every)
        ck_every = self.config.checkpoint_every
        for i in range(cycles):
            self.state, rms, invalid, _tok = self._cycle(self.state)
            if (i + 1) % check_every == 0 or i == cycles - 1:
                inv = int(invalid)
                if inv > 0:
                    raise FloatingPointError(
                        f"invalid state detected during cycle {i + 1}: "
                        f"{inv} bad entries (NaN/Inf/negative density or "
                        f"energy)")
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

    def run_batched(self, cycles: int, cycles_per_dispatch: int = 10,
                    verbose: bool = False):
        """Run cycles in K-per-dispatch batches (lax.scan inside one jit):
        amortises per-execution overhead. The fail-fast NaN check runs
        after each batch (per-cycle RMS/invalid are still computed on
        device every cycle and returned stacked)."""
        k = max(1, min(cycles_per_dispatch, cycles))
        if getattr(self, "_multi_k", None) != k:
            self._multi = make_multi_cycle_fn(self.dmesh, self.config, k)
            self._multi_k = k
        done = 0
        while done < cycles:
            if cycles - done < k:
                # tail smaller than the batch: fall back to single steps
                self.run(cycles - done, verbose=verbose)
                return self.state
            self.state, rms, invalid = self._multi(self.state)
            done += k
            self.completed_cycles += k
            inv = int(invalid.sum())
            if inv > 0:
                raise FloatingPointError(
                    f"invalid state detected within cycles "
                    f"{done - k + 1}..{done}: {inv} bad entries")
            self.rms_history.extend(float(x) for x in np.asarray(rms))
            if verbose:
                print(f"MG cycle {done} / {cycles} "
                      f"(RMS = {self.rms_history[-1]:.3e})")
        return self.state

    def dump_hlo(self, out_dir: str) -> list:
        """Optimized HLO text of the whole compiled V-cycle — the fused
        solver's compiled-artifact capture (objdump analogue,
        run-templates/run-mgcfd.sh:97-119)."""
        import os
        os.makedirs(out_dir, exist_ok=True)
        p = os.path.join(out_dir, "vcycle.hlo.txt")
        with open(p, "w") as f:
            f.write(self._cycle.lower(self.state).compile().as_text())
        return [p]

    def _to_external(self, per_node: np.ndarray, level: int) -> np.ndarray:
        """Translate a per-node array from the internal node order back
        to the caller's (identity unless tile-interleaved)."""
        orders = self.dmesh.node_orders
        if orders is None:
            return per_node
        inv = np.argsort(orders[level])
        return per_node[inv]

    def variables(self, level: int = 0) -> np.ndarray:
        v = self.state["variables"][level]
        n = self.dmesh.levels[level].num_nodes
        v = np.asarray(v[:, :n].T if self._tstate else v)
        return self._to_external(v, level)

    def step_factors(self, level: int = 0) -> np.ndarray:
        lvl = self.dmesh.levels[level]
        v = self.state["variables"][level]
        n = lvl.num_nodes
        if self._tstate:
            v = v[:, :n].T
        vol = lvl.volumes[:n]
        if self.dmesh.variant.uses_legacy_step_factor:
            sf = np.asarray(compute_step_factor_legacy(v, vol))
        else:
            sf = np.asarray(compute_step_factor(v, vol))
        return self._to_external(sf, level)
