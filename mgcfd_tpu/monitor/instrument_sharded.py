"""Per-kernel instrumented MULTI-CHIP solver.

The sharded fused cycle (parallel/sharded.py) compiles the whole V-cycle
into one shard_map'd XLA program — fastest, but unattributable. This
variant mirrors InstrumentedSolver for `--partitions P` runs: every
reference kernel becomes its own jitted (and, on the sharded fine level,
shard_map'd) call, timed with block_until_ready and accumulated per
(kernel, level) — emitting Times.csv / LoopNumIters.csv / XLACosts.csv
in the reference schema (timer.cpp:106-195, loop_stats.cpp:83-171) with
`Num threads` = partition count.

The dispatches timed here are the SAME production formulations the
fused sharded cycle runs: the per-shard windowed-gather kernel with its
gather-only halo for accumulate=window/pallas, the indexed segment
stream + psum_scatter return for segment/shift, lax.pmin for the global
min-dt, the psum partial-sum restriction and the static-geometry
prolongation. Coarse levels are replicated (every shard computes them
identically in the fused cycle), so their kernels run unsharded — the
same variable-major dispatch the fused cycle's coarse visits use.

Kernel attribution matches the reference: flux, compute_step,
time_step, indirect_rw, restrict, prolong per level.
"""
from __future__ import annotations

import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import SolverConfig
from ..core.constants import RK, NVAR, far_field_state
from ..core.types import MultigridMesh
from ..ops import (
    time_step, residual, calc_rms, invalid_variables_count, mg_restrict,
    prolong_residuals_interpolate,
)
from ..solver.solver import t_step_factor, t_compute_fluxes, t_indirect_rw
from .instrument import KernelStats, _cost_details_of


class InstrumentedShardedSolver:
    def __init__(self, mesh: MultigridMesh, config: SolverConfig,
                 devices=None):
        from ..parallel.sharded import ShardedSolver
        config.validate()
        self.mesh = mesh
        self.config = config
        # reuse ShardedSolver's full setup (partitioning, conditioned
        # coarse hierarchy, window plans, consts) — then build per-kernel
        # callables against the same data instead of its fused cycle
        self._base = ShardedSolver(mesh, config, devices=devices)
        self.smesh = self._base.smesh
        self.jmesh: Mesh = self._base.jmesh
        # the fused sharded cycle now runs its replicated coarse chain
        # in the single-chip production layout (lane-padded variable-
        # major, windowed kernels); this per-kernel-timed variant keeps
        # its own unpadded node-major coarse build — per-kernel timing
        # needs separable dispatches, and the shift-path coarse kernels
        # are the separable form
        self.dmesh_coarse = self._base.dmesh_coarse
        if self._base._tc and self.dmesh_coarse:
            import dataclasses as _dc0
            from ..core.constants import MeshVariant as _MV
            from ..core.types import MultigridMesh as _MM
            from ..solver.solver import prepare_device_mesh as _pdm
            S0 = len(self.smesh.levels)
            cond = _MM(levels=self._base._conditioned.levels[S0:],
                       variant=_MV.FVCORR)
            self.dmesh_coarse = _pdm(
                cond, _dc0.replace(config, accumulate="shift")).levels
        self.dtype = jnp.dtype(config.dtype)
        self.legacy = mesh.variant.uses_legacy_step_factor
        ff_q, ff_flux = far_field_state(np.float64)
        self.ff_flux = jnp.asarray(ff_flux, self.dtype)
        self.stats = KernelStats(defaultdict(float), defaultdict(int),
                                 defaultdict(int), defaultdict(float),
                                 defaultdict(float))
        self._example_args = {}
        self._build_kernels()

        sd = self.smesh.level0
        sharding = NamedSharding(self.jmesh, P("x"))
        self.vars_f = jax.device_put(self._base.state["variables0"],
                                     sharding)
        self.res_f = jax.device_put(self._base.state["residuals0"],
                                    sharding)
        ff_q = jnp.asarray(far_field_state(np.float64)[0], self.dtype)
        self.vars_c = [jnp.tile(ff_q[None, :], (l.num_nodes, 1))
                       for l in self.dmesh_coarse]
        self.res_c = [jnp.zeros((l.num_nodes, NVAR), self.dtype)
                      for l in self.dmesh_coarse]
        self.rms_history: list[float] = []
        self._sd = sd

    # --- kernel construction -------------------------------------------
    def _build_kernels(self):
        from ..parallel.sharded import (
            AXIS, build_sharded_consts, _sharded_step_factor,
            _window_flux_total, _stream_flux_total, _window_rw_token,
            _stream_rw_token, _use_stream_shift, _sharded_restrict,
            _sharded_prolong)
        import dataclasses as _dc

        sd = self.smesh.level0
        cfg = self.config
        cs, cr, wkernels, pkernel, rkernel = build_sharded_consts(
            sd, cfg, self.dtype, self.jmesh)
        self._consts = (cs, cr)
        mesh = self.jmesh
        ff_flux = self.ff_flux
        legacy = self.legacy

        def shmap(fn, state_specs, out_spec):
            m = jax.shard_map(fn, mesh=mesh,
                              in_specs=(P(AXIS), P(), *state_specs),
                              out_specs=out_spec, check_vma=False)
            jf = jax.jit(m)

            def bound(*args):
                return jf(cs, cr, *args)

            bound.lower = lambda *args: jf.lower(cs, cr, *args)
            return bound

        def const_of(const_sh, const_rep):
            c = {k: v[0] for k, v in const_sh.items()}
            c.update(const_rep)
            return c

        self.k = {}
        # ---- sharded fine level (level 0) ----
        self.k[("compute_step", 0)] = shmap(
            lambda csh, crep, v: _sharded_step_factor(
                const_of(csh, crep), v.T, legacy),
            (P(AXIS),), P(AXIS))

        if wkernels is not None:
            def flux0(csh, crep, v):
                return _window_flux_total(sd, const_of(csh, crep), v.T,
                                          wkernels).T
        else:
            use_shift = _use_stream_shift(sd, cs, cfg)

            def flux0(csh, crep, v):
                return _stream_flux_total(sd, const_of(csh, crep), v.T,
                                          ff_flux, use_shift)
        self.k[("flux", 0)] = shmap(flux0, (P(AXIS),), P(AXIS))

        self.k[("time_step", 0)] = jax.jit(
            lambda j, sf, fx, old: time_step(j, sf, fx, old),
            static_argnums=0)

        if wkernels is not None:
            def rw0(csh, crep, v):
                return jax.lax.psum(_window_rw_token(
                    sd, const_of(csh, crep), v.T, wkernels), AXIS)
        else:
            use_shift_rw = _use_stream_shift(sd, cs, cfg)

            def rw0(csh, crep, v):
                return jax.lax.psum(_stream_rw_token(
                    sd, const_of(csh, crep), v.T, use_shift_rw), AXIS)
        self.k[("indirect_rw", 0)] = shmap(rw0, (P(AXIS),), P())

        if self.dmesh_coarse:
            self.k[("restrict", 0)] = shmap(
                lambda csh, crep, vf, vc: _sharded_restrict(
                    sd, const_of(csh, crep), vf, vc, rkernel=rkernel),
                (P(AXIS), P()), P())
            self.k[("prolong", 0)] = shmap(
                lambda csh, crep, rc, rf, vf: _sharded_prolong(
                    sd, const_of(csh, crep), rc, rf, vf,
                    pkernel=pkernel),
                (P(), P(AXIS), P(AXIS)), P(AXIS))

        # ---- replicated coarse levels (level 1..L-1), unsharded: the
        # same variable-major dispatch the fused cycle's coarse visits
        # run (rolled shift when the pallas/window fine config swaps the
        # coarse hierarchy onto the shift path) ----
        coarse_cfg = cfg
        if cfg.accumulate in ("pallas", "window"):
            coarse_cfg = _dc.replace(cfg, accumulate="shift")

        def bindc(fn, lvl):
            jf = jax.jit(fn)

            def bound(*args):
                return jf(*args)
            bound.lower = lambda *args: jf.lower(*args)
            return bound

        for i, lvl in enumerate(self.dmesh_coarse):
            l = i + 1
            self.k[("compute_step", l)] = bindc(
                lambda v, lv=lvl: t_step_factor(lv, v.T, legacy), lvl)
            self.k[("flux", l)] = bindc(
                lambda v, lv=lvl: t_compute_fluxes(
                    lv, v.T, ff_flux, coarse_cfg).T, lvl)
            self.k[("time_step", l)] = jax.jit(
                lambda j, sf, fx, old: time_step(j, sf, fx, old),
                static_argnums=0)
            self.k[("indirect_rw", l)] = bindc(
                lambda v, lv=lvl: jnp.sum(t_indirect_rw(
                    lv, v.T, coarse_cfg)), lvl)
            if i + 1 < len(self.dmesh_coarse):
                # the same precomputed-table transfer dispatch the fused
                # sharded cycle runs (solver.apply_*_padded; the raw ops
                # recompute prolong geometry per call)
                from ..solver.solver import (apply_prolong_padded,
                                             apply_restrict_padded)
                nxt = self.dmesh_coarse[i + 1]
                self.k[("restrict", l)] = bindc(
                    lambda vf, vc, lv=lvl, nx=nxt: apply_restrict_padded(
                        lv, nx, vf, vc, False), lvl)
                self.k[("prolong", l)] = bindc(
                    lambda rc, rf, vf, lv=lvl, nx=nxt:
                    apply_prolong_padded(lv, nx, rc, rf, vf, False), lvl)

    # --- timed invocation ----------------------------------------------
    _recording = True

    def _run_kernel(self, name, l, iters, *args):
        fn = self.k[(name, l)]
        self._example_args.setdefault((name, l), args)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        if self._recording:
            self.stats.times[(name, l)] += time.perf_counter() - t0
            self.stats.iters[(name, l)] += iters
            self.stats.calls[(name, l)] += 1
        return out

    # --- solver walk ----------------------------------------------------
    def _edges_on(self, l: int) -> int:
        if l == 0:
            return self.mesh.levels[0].num_internal_edges
        return self.dmesh_coarse[l - 1].edge_a.shape[0]

    def _visit(self, l):
        if l == 0:
            n = self._sd.num_nodes
            v = self.vars_f
            old = v
            sf = self._run_kernel("compute_step", 0, n, v)
            for j in range(RK):
                fx = self._run_kernel("flux", 0, self._edges_on(0), v)
                v = self._run_kernel("time_step", 0, n, j, sf, fx, old)
                if self.config.include_indirect_rw:
                    self._run_kernel("indirect_rw", 0,
                                     self._edges_on(0), v)
            self.vars_f = v
            self.res_f = residual(old, v)
            nm = self._consts[0]["node_mask"].reshape(-1)
            if int(invalid_variables_count(v * nm[:, None])) > 0:
                raise FloatingPointError("invalid state on level 0")
            sq = float(jnp.sum(self.res_f * self.res_f * nm[:, None]))
            return np.sqrt(sq / n)
        lvl = self.dmesh_coarse[l - 1]
        n = lvl.num_nodes
        v = self.vars_c[l - 1]
        old = v
        sf = self._run_kernel("compute_step", l, n, v)
        for j in range(RK):
            fx = self._run_kernel("flux", l, self._edges_on(l), v)
            v = self._run_kernel("time_step", l, n, j, sf, fx, old)
            if self.config.include_indirect_rw:
                self._run_kernel("indirect_rw", l, self._edges_on(l), v)
        self.vars_c[l - 1] = v
        self.res_c[l - 1] = residual(old, v)
        if int(invalid_variables_count(v)) > 0:
            raise FloatingPointError(f"invalid state on level {l}")
        return None

    def run(self, cycles: int | None = None, verbose: bool = False,
            warmup: bool = True):
        """Timed run; one untimed warmup cycle first compiles every
        kernel so Times.csv measures steady-state execution."""
        cycles = cycles if cycles is not None else self.config.num_cycles
        if warmup:
            snap = (self.vars_f, self.res_f, list(self.vars_c),
                    list(self.res_c))
            self._recording = False
            try:
                self.run(cycles=1, warmup=False)
            finally:
                self._recording = True
                (self.vars_f, self.res_f, self.vars_c,
                 self.res_c) = snap
                self.rms_history = []
        L = 1 + len(self.dmesh_coarse)
        t_start = time.perf_counter()
        for i in range(cycles):
            rms = self._visit(0)
            self.rms_history.append(rms)
            if L > 1:
                self.vars_c[0] = self._run_kernel(
                    "restrict", 0, self._sd.num_nodes, self.vars_f,
                    self.vars_c[0])
                for l in range(1, L - 1):
                    self._visit(l)
                    self.vars_c[l] = self._run_kernel(
                        "restrict", l, self.dmesh_coarse[l - 1].num_nodes,
                        self.vars_c[l - 1], self.vars_c[l])
                self._visit(L - 1)
                for l in range(L - 2, 0, -1):
                    self.vars_c[l - 1] = self._run_kernel(
                        "prolong", l, self._edges_on(l),
                        self.res_c[l], self.res_c[l - 1],
                        self.vars_c[l - 1])
                    self._visit(l)
                self.vars_f = self._run_kernel(
                    "prolong", 0, self._edges_on(0),
                    self.res_c[0], self.res_f, self.vars_f)
            if verbose:
                print(f"MG cycle {i + 1} / {cycles} "
                      f"(RMS = {self.rms_history[-1]:.3e})")
        self.stats.total_time = time.perf_counter() - t_start
        return self.stats

    # --- accessors / reports -------------------------------------------
    def variables(self, level: int = 0) -> np.ndarray:
        if level == 0:
            sd = self._sd
            v = np.asarray(self.vars_f).reshape(sd.P, sd.block, NVAR)
            parts = [v[p, :max(0, min((p + 1) * sd.part_width,
                                      sd.num_nodes)
                               - p * sd.part_width)]
                     for p in range(sd.P)]
            return np.concatenate(parts, axis=0)
        return np.asarray(self.vars_c[level - 1])

    def step_factors(self, level: int = 0) -> np.ndarray:
        self._base.state["variables0"] = self.vars_f
        self._base.state["variables_c"] = list(self.vars_c)
        return self._base.step_factors(level)

    def record_costs(self):
        for (name, l), args in self._example_args.items():
            d = _cost_details_of(self.k[(name, l)], *args)
            self.stats.flops[(name, l)] = d.get("flops", 0.0)
            self.stats.bytes_accessed[(name, l)] = d.get(
                "bytes accessed", 0.0)
            self.stats.cost_details[(name, l)] = d

    def dump_hlo(self, out_dir: str) -> list:
        import os
        os.makedirs(out_dir, exist_ok=True)
        paths = []
        for (name, l), args in sorted(self._example_args.items()):
            try:
                txt = self.k[(name, l)].lower(*args).compile().as_text()
            except Exception as e:
                txt = f"<HLO capture failed: {type(e).__name__}: {e}>\n"
            p = os.path.join(out_dir, f"{name}{l}.hlo.txt")
            with open(p, "w") as f:
                f.write(txt)
            paths.append(p)
        return paths

    def write_reports(self, prefix: str = "", include_costs: bool = True):
        from .csvout import (CsvIdentification, write_times_csv,
                             write_loop_stats_csv, write_costs_csv)
        ident = CsvIdentification.build(
            self.config, self.mesh,
            num_partitions=self.config.num_partitions)
        L = 1 + len(self.dmesh_coarse)
        p1 = write_times_csv(prefix, ident, dict(self.stats.times), L,
                             self.stats.total_time)
        p2 = write_loop_stats_csv(prefix, ident, dict(self.stats.iters), L)
        paths = [p1, p2]
        if include_costs:
            if not self.stats.cost_details:
                self.record_costs()
            from .events import event_rows
            paths.append(write_costs_csv(
                prefix, ident, event_rows(self.config, self.stats), L))
        return tuple(paths)
