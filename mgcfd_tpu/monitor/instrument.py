"""Per-kernel instrumented solver.

The fused solver (solver/) compiles a whole V-cycle into one XLA program —
fastest, but unattributable. This instrumented variant mirrors the
reference's monitoring model (timer.cpp/loop_stats.cpp): each kernel is
its own jitted call, timed with block_until_ready, accumulated per
(kernel, level), with iteration counts recorded per invocation — emitting
Times.csv / LoopNumIters.csv in the reference schema plus an XLACosts.csv
(flops / bytes from XLA cost analysis: the PAPI-counter analogue).

The kernels timed here are the SAME dispatch the fused solver runs
(solver.t_compute_fluxes / apply_restrict / apply_prolong / ...): when the
config selects the transposed layout, the pallas megakernel, gather or
structured MG transfers, Times.csv attributes those — not a slower
reference formulation (the production configuration is what users run).
One deliberate exception: `fuse_stage` (the whole-RK-stage megakernel,
pallas/flux_shift.PallasFusedStage) is ignored here — a single fused
launch is per-kernel-unattributable by construction, so instrumented
runs time the separate flux / time_step / invalid dispatches that the
fused kernel folds together (the per-kernel split is this monitor's
entire purpose; whole-cycle wall time of the fused configuration comes
from the fused solver / bench.py).

Caveat for remote-tunnelled TPUs (this dev environment): every
block_until_ready round-trip costs ~30 ms of dispatch latency, which
floors per-kernel numbers on small problems; the fused solver's
whole-cycle timing (bench.py) is the accurate wall-clock there. On
locally-attached hardware dispatch overhead is negligible and these
timers attribute faithfully.

Kernel attribution matches the reference:
  flux         internal+boundary+wall flux computation & accumulation
               (flux_loops.cpp wraps all three under COMPUTE_FLUX_EDGE)
  update       the separate accumulate phase when flux_fission is on
  compute_step step factor
  time_step    RK update
  indirect_rw  the data-movement twin
  restrict     MG restriction
  prolong      MG prolongation
"""
from __future__ import annotations

import dataclasses
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import SolverConfig
from ..core.constants import RK, NVAR, far_field_state
from ..core.types import MultigridMesh
from ..ops import (
    internal_edge_flux, boundary_edge_flux, wall_edge_flux,
    indirect_rw_edge_values, accumulate_flux,
    compute_step_factor, compute_step_factor_legacy, time_step,
    residual, calc_rms, invalid_variables_count,
)
from ..ops.tops import t_time_step
from ..solver.solver import (
    prepare_device_mesh, state_is_transposed, real_view, lane_writeback,
    apply_restrict_padded, apply_prolong_padded, t_step_factor,
    t_compute_fluxes,
    t_indirect_rw, t_invalid_count, _compute_fluxes,
    _split_arrays, _merge_arrays,
)


def _bind(fn, *struct, name: str | None = None):
    """jit `fn(*merged_struct, *args)` with every array inside `struct`
    (DeviceLevel fields incl. window plans, edge lists, MG tables)
    passed as jit ARGUMENTS — not closure constants, which inline into
    the HLO module (confirmed: a 512-node windowed flux kernel lowered
    to 2.2 MB of StableHLO; at flagship scale the plans are 100s of MB
    and this environment's remote compiler rejects such bodies). Same
    policy as solver._parametrised. The returned callable exposes
    .lower() for cost analysis / HLO capture.

    `name` labels the compiled module (`jit_<name>`): the handle
    monitor/opstats.py uses to attribute measured profiler device time
    back to (kernel, level)."""
    arrays: list = []
    tpl = _split_arrays(struct, arrays)

    def wrapper(arrs, *args):
        return fn(*_merge_arrays(tpl, arrs), *args)
    if name:
        wrapper.__name__ = name
    jf = jax.jit(wrapper)

    def bound(*args):
        return jf(arrays, *args)

    bound.lower = lambda *args: jf.lower(arrays, *args)
    return bound


@dataclasses.dataclass
class KernelStats:
    times: dict            # (kernel, level) -> seconds
    iters: dict            # (kernel, level) -> iteration count
    calls: dict            # (kernel, level) -> invocation count
    flops: dict            # (kernel, level) -> flop estimate (XLA)
    bytes_accessed: dict   # (kernel, level) -> bytes estimate (XLA)
    total_time: float = 0.0
    # full per-kernel cost-analysis dicts (flops, bytes accessed,
    # transcendentals, optimal_seconds, ...): the pool the -p event
    # selection draws XLACosts.csv rows from (monitor/events.py)
    cost_details: dict = dataclasses.field(default_factory=dict)
    # measured per-kernel device time from a --measure-ops profiler
    # trace (monitor/opstats.py); empty unless that mode ran
    measured: dict = dataclasses.field(default_factory=dict)


def _cost_details_of(jitted, *args) -> dict:
    try:
        an = jitted.lower(*args).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return {k: float(v) for k, v in dict(an).items()
                if isinstance(v, (int, float))}
    except Exception:
        return {}


def _cost_of(jitted, *args):
    d = _cost_details_of(jitted, *args)
    return d.get("flops", 0.0), d.get("bytes accessed", 0.0)


class InstrumentedSolver:
    def __init__(self, mesh: MultigridMesh, config: SolverConfig):
        self.mesh = mesh
        self.config = config
        self.dmesh = prepare_device_mesh(mesh, config)
        self.dtype = jnp.dtype(config.dtype)
        self.legacy = mesh.variant.uses_legacy_step_factor
        self.tstate = state_is_transposed(self.dmesh, config)
        ff_q, ff_flux = far_field_state(np.float64)
        self.ff_flux = jnp.asarray(ff_flux, self.dtype)
        self.ff_q = jnp.asarray(ff_q, self.dtype)
        self.stats = KernelStats(defaultdict(float), defaultdict(int),
                                 defaultdict(int), defaultdict(float),
                                 defaultdict(float))
        self._example_args = {}
        self._build_kernels()

        def width(l):
            return (l.num_lanes or l.num_nodes) if self.tstate \
                else l.num_nodes

        def init_vars(l):
            v = jnp.tile(self.ff_q[None, :], (width(l), 1))
            return v.T if self.tstate else v

        def init_res(l):
            shape = ((NVAR, width(l)) if self.tstate
                     else (width(l), NVAR))
            return jnp.zeros(shape, self.dtype)

        self.state_vars = [init_vars(l) for l in self.dmesh.levels]
        self.state_res = [init_res(l) for l in self.dmesh.levels]
        self.rms_history: list[float] = []

    # --- kernel construction -------------------------------------------
    def _build_kernels(self):
        cfg = self.config
        ts = self.tstate
        self.k = {}
        for l, lvl in enumerate(self.dmesh.levels):
            if ts:
                self.k[("compute_step", l)] = _bind(
                    lambda lv, q: t_step_factor(lv, q, self.legacy), lvl,
                    name=f"k_compute_step_l{l}")
                # the production flux dispatch (window / pallas / rolled
                # shift + spill + dense boundary/wall)
                self.k[("flux", l)] = _bind(
                    lambda lv, q: t_compute_fluxes(lv, q, self.ff_flux,
                                                   cfg), lvl,
                    name=f"k_flux_l{l}")
                def _ts_t(j, sf, fx, old):
                    return t_time_step(j, sf, fx, old)
                _ts_t.__name__ = f"k_time_step_l{l}"
                self.k[("time_step", l)] = jax.jit(_ts_t,
                                                   static_argnums=0)
                self.k[("indirect_rw", l)] = _bind(
                    lambda lv, q: t_indirect_rw(lv, q, cfg), lvl,
                    name=f"k_indirect_rw_l{l}")
            else:
                step = (compute_step_factor_legacy if self.legacy
                        else compute_step_factor)
                self.k[("compute_step", l)] = _bind(
                    lambda lv, v, step=step: step(v, lv.volumes), lvl,
                    name=f"k_compute_step_l{l}")

                if cfg.flux_fission:
                    def flux_vals(lv, v):
                        return (internal_edge_flux(
                            v[lv.edge_a], v[lv.edge_b],
                            lv.edge_w, lv.edge_ewt),
                            boundary_edge_flux(v[lv.bedge_b], lv.bedge_w),
                            wall_edge_flux(v[lv.wedge_b], lv.wedge_w,
                                           self.ff_flux))

                    def update(lv, vals):
                        vi, vb, vw = vals
                        return accumulate_flux(
                            lv.num_nodes, lv.edge_a, lv.edge_b, vi,
                            lv.bedge_b, vb, lv.wedge_b, vw,
                            mode="segment")

                    self.k[("flux", l)] = _bind(
                        flux_vals, lvl, name=f"k_flux_l{l}")
                    self.k[("update", l)] = _bind(
                        update, lvl, name=f"k_update_l{l}")
                else:
                    # honours config.accumulate (segment/scatter/ell/shift)
                    self.k[("flux", l)] = _bind(
                        lambda lv, v: _compute_fluxes(lv, v, self.ff_flux,
                                                      cfg), lvl,
                        name=f"k_flux_l{l}")

                def _ts(j, sf, fx, old):
                    return time_step(j, sf, fx, old)
                _ts.__name__ = f"k_time_step_l{l}"
                self.k[("time_step", l)] = jax.jit(_ts,
                                                   static_argnums=0)

                def rw(lv, v):
                    va, vb = indirect_rw_edge_values(
                        v[lv.edge_a], v[lv.edge_b], lv.edge_w)
                    return accumulate_flux(lv.num_nodes, lv.edge_a,
                                           lv.edge_b, va, mode="segment",
                                           val_internal_b=vb)
                self.k[("indirect_rw", l)] = _bind(
                    rw, lvl, name=f"k_indirect_rw_l{l}")

            if l < len(self.dmesh.levels) - 1:
                nxt = self.dmesh.levels[l + 1]

                # same dispatch as the fused cycle: windowed / structured
                # parity / gather tables / segment-mean scatter, with
                # lane-padded writeback when the state carries padding
                self.k[("restrict", l)] = _bind(
                    lambda lv, nx, vf, vc: apply_restrict_padded(
                        lv, nx, vf, vc, ts), lvl, nxt,
                    name=f"k_restrict_l{l}")
                self.k[("prolong", l)] = _bind(
                    lambda lv, nx, rc, rf, vf: apply_prolong_padded(
                        lv, nx, rc, rf, vf, ts), lvl, nxt,
                    name=f"k_prolong_l{l}")

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

    def dump_hlo(self, out_dir: str) -> list:
        """Write each compiled kernel's optimized HLO text into out_dir —
        the TPU analogue of the reference harness's per-job objdump'd
        loop assembly (run-templates/run-mgcfd.sh:97-119): the artifact an
        instruction-level analysis pipeline consumes. One file per
        (kernel, level), e.g. flux0.hlo.txt."""
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

    def record_costs(self):
        """XLA cost analysis per compiled kernel (PAPI-counter analogue).
        Uses the example arguments captured from the run itself, so every
        timed kernel — including MG transfers and the RK update — gets a
        flop/byte row in XLACosts.csv."""
        for (name, l), args in self._example_args.items():
            d = _cost_details_of(self.k[(name, l)], *args)
            self.stats.flops[(name, l)] = d.get("flops", 0.0)
            self.stats.bytes_accessed[(name, l)] = d.get(
                "bytes accessed", 0.0)
            self.stats.cost_details[(name, l)] = d

    # --- solver walk ----------------------------------------------------
    def _invalid(self, v) -> int:
        if self.tstate:
            return int(t_invalid_count(v))
        return int(invalid_variables_count(v))

    def _visit(self, l):
        lvl = self.dmesh.levels[l]
        n = lvl.num_nodes
        v = self.state_vars[l]
        old = v
        sf = self._run_kernel("compute_step", l, n, v)
        for j in range(RK):
            if self.config.flux_fission and not self.tstate:
                ne = (lvl.edge_a.shape[0] + lvl.bedge_b.shape[0]
                      + lvl.wedge_b.shape[0])
                vals = self._run_kernel("flux", l, lvl.edge_a.shape[0], v)
                fx = self._run_kernel("update", l, ne, vals)
            else:
                fx = self._run_kernel("flux", l, lvl.edge_a.shape[0], v)
            v = self._run_kernel("time_step", l, n, j, sf, fx, old)
            if self.config.include_indirect_rw:
                self._run_kernel("indirect_rw", l, lvl.edge_a.shape[0], v)
        self.state_vars[l] = v
        self.state_res[l] = residual(old, v)
        if self._invalid(v) > 0:
            raise FloatingPointError(f"invalid state on level {l}")
        return self.state_res[l]

    def run(self, cycles: int | None = None, verbose: bool = False,
            warmup: bool = True):
        """Timed run. With warmup (default), one full untimed cycle first
        triggers every kernel's compilation, then the state is restored —
        so Times.csv measures steady-state execution, not XLA compiles
        (matching what the reference's -DTIME timers measure)."""
        cycles = cycles if cycles is not None else self.config.num_cycles
        if warmup:
            snap_v = list(self.state_vars)
            snap_r = list(self.state_res)
            self._recording = False
            try:
                self.run(cycles=1, warmup=False)
            finally:
                self._recording = True
                self.state_vars = snap_v
                self.state_res = snap_r
                self.rms_history = []
        L = len(self.dmesh.levels)
        t_start = time.perf_counter()
        for i in range(cycles):
            if L == 1:
                res = self._visit(0)
                self.rms_history.append(float(calc_rms(
                    res, self.dmesh.levels[0].num_nodes)))
            else:
                for l in range(L - 1):
                    res = self._visit(l)
                    if l == 0:
                        self.rms_history.append(float(calc_rms(
                            res, self.dmesh.levels[0].num_nodes)))
                    self.state_vars[l + 1] = self._run_kernel(
                        "restrict", l, self.dmesh.levels[l].num_nodes,
                        self.state_vars[l], self.state_vars[l + 1])
                self._visit(L - 1)
                for l in range(L - 2, -1, -1):
                    self.state_vars[l] = self._run_kernel(
                        "prolong", l, self.dmesh.levels[l].edge_a.shape[0],
                        self.state_res[l + 1], self.state_res[l],
                        self.state_vars[l])
                    if l > 0:
                        self._visit(l)
            if verbose:
                print(f"MG cycle {i + 1} / {cycles} "
                      f"(RMS = {self.rms_history[-1]:.3e})")
        self.stats.total_time = time.perf_counter() - t_start
        return self.stats

    def variables(self, level: int = 0) -> np.ndarray:
        """Real-width node-major view (dumps / validation) in the
        caller's node order — same accessor API as
        MGCFDSolver.variables."""
        v = self.state_vars[level]
        n = self.dmesh.levels[level].num_nodes
        v = np.asarray(v[:, :n].T if self.tstate else v)
        if self.dmesh.node_orders is not None:
            v = v[np.argsort(self.dmesh.node_orders[level])]
        return v

    def write_reports(self, prefix: str = "", include_costs: bool = True):
        from .csvout import (CsvIdentification, write_times_csv,
                             write_loop_stats_csv, write_costs_csv)
        ident = CsvIdentification.build(
            self.config, self.mesh,
            num_partitions=self.config.num_partitions)
        L = len(self.dmesh.levels)
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
