#!/usr/bin/env python
"""Headline benchmark: compute_flux edges/sec + V-cycle wall time on the
flagship M6-scale mesh (304,640 nodes / 900,328 internal edges, 4 levels).

Emission contract (VERDICT r03 #1): a COMPLETE JSON line is printed as
soon as the first production mode has flux + V-cycle numbers, and a
refined line after every further phase — a driver that kills this
process at any point after the first phase still tail-parses a valid
headline. The LAST line printed is the most complete.

  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Phases (each budget-gated, see MGCFD_BENCH_BUDGET_SEC):
  1. flagship 'window' production mode: flux + V-cycle  -> emit
  2. flagship 'pallas' production mode: flux + V-cycle  -> emit
  3. unstructured tet flagship (window): flux + V-cycle -> emit
  4. opt-in extras (MGCFD_BENCH_FULL=1): shift/shift_t/segment modes,
     marginal-K slopes, indirect-rw twin                -> emit

The persistent XLA compilation cache is ON by default at
.golden/xlacache (override dir with MGCFD_COMPILE_CACHE=DIR, disable
with MGCFD_COMPILE_CACHE=off) — repeat bench runs of unchanged code
skip the cold compiles that killed the round-3 driver run.

vs_baseline compares against the reference C++ binary measured on this
machine's CPU (single core, gnu -O3 -ffast-math; see BASELINE.md).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax

_T0 = time.time()
# Total wall budget for the whole bench. The driver's round-end budget
# is unknown; default comfortably under any sane timeout so phase gates
# leave headroom for the phase they admit.
_BUDGET = float(os.environ.get("MGCFD_BENCH_BUDGET_SEC", "1500"))


def _remaining() -> float:
    return _BUDGET - (time.time() - _T0)


def _note(msg: str) -> None:
    print(f"bench[{time.time() - _T0:7.1f}s]: {msg}", file=sys.stderr,
          flush=True)


_cache_env = os.environ.get("MGCFD_COMPILE_CACHE", "")
if _cache_env.lower() not in ("off", "0", "none", "disable"):
    from mgcfd_tpu.utils.compilecache import enable_compile_cache
    enable_compile_cache(_cache_env or ".golden/xlacache")

from mgcfd_tpu.bench import flagship_mesh, FLAGSHIP_SPEC
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver import MGCFDSolver
from mgcfd_tpu.solver.solver import _compute_fluxes

# Reference binary on this machine's CPU (see BASELINE.md "Measured"):
# gnu -O3 -ffast-math, 1 thread, Xeon @2.10GHz, flagship mesh:
# flux0 = 13,504,920 edge-iters / 0.349074 s; total 1.21643 s / 5 cycles.
# V-cycle POLICY (both columns): the diagnostic indirect_rw twin is
# EXCLUDED — CPU total minus its per-level Times.csv rows (0.134537 s
# over 5 cycles), TPU run with include_indirect_rw=False. A secondary
# number with the twin ON on both sides is reported as
# vcycle_with_rw_twin_sec (CPU: the raw 0.24329 s total).
CPU_BASELINE_FLUX_EDGES_PER_SEC = 38.69e6
CPU_BASELINE_VCYCLE_SEC = 0.21638
CPU_BASELINE_VCYCLE_WITH_RW_SEC = 0.24329
CPU_BASELINE_RW_EDGES_PER_SEC = 128.6e6

# Reference binary on the unstructured tet-flagship hierarchy (305K
# nodes / 2.28M edges finest; .golden/benchtet, BASELINE.md round 2):
# flux0 = 34,181,685 edge-iters / 1.82 s; kernel Total excl. the rw
# twin 3.966 s / 5 cycles (median of 3 clean runs — single-core runs
# on this box swing ~2x under host contention, so baselines are taken
# with the machine quiet). The CPU degrades on unstructured (18.8M vs
# 38.7M edges/s) — its gathers cache-miss too.
CPU_TET_FLUX_EDGES_PER_SEC = 18.8e6
CPU_TET_VCYCLE_SEC = 0.7932


def _wait_for_device():
    """The axon TPU tunnel on this machine wedges for minutes if two
    processes ever raced it; poll in subprocesses until the backend is
    usable so the driver's round-end bench never dies to a stale lease.
    Falls back to CPU (flagged in the output) as a last resort.
    Capped: never eats more than ~1/3 of the total budget."""
    import subprocess
    max_wait = min(float(os.environ.get("MGCFD_BENCH_DEVICE_WAIT_SEC",
                                        "300")),
                   _BUDGET / 3)
    deadline = time.time() + max_wait
    while time.time() < deadline:
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True,
                timeout=max(30, deadline - time.time()))
        except subprocess.TimeoutExpired:
            break
        if r.returncode == 0:
            return True
        time.sleep(20)
    _note("device not reachable in budget; falling back to CPU backend")
    jax.config.update("jax_platforms", "cpu")
    return False


def _time(fn, x0, reps=20):
    """Chained slope timing with a REAL device->host fetch.

    Two tunnel timing traps (verify skill): identical re-executions
    report fake times, and (since round 3) block_until_ready signals
    before chained work finishes — a small np.asarray fetch of the
    result is the only wait that tells the truth. fn must map an array
    to a same-shaped array (every flux mode does)."""
    import numpy as np
    import jax.numpy as jnp

    def chain(k):
        x = x0
        t0 = time.perf_counter()
        for _ in range(k):
            x = x + fn(x) * jnp.asarray(1e-12, x0.dtype)
        np.asarray(x.ravel()[:8])
        return time.perf_counter() - t0

    chain(2)
    return (chain(reps + 2) - chain(2)) / reps


class Emitter:
    """Accumulates results and prints a complete JSON line after every
    phase. Key order is stable; later lines strictly refine earlier
    ones, so the driver's tail-parse always lands on the best data."""

    def __init__(self, spec):
        self.spec = spec
        self.flux_modes = {}          # mode -> edges/sec
        self.vcycle_modes = {}        # mode -> sec/cycle
        self.extras = {}

    def emit(self, n_edges):
        if not self.flux_modes or not self.vcycle_modes:
            return                    # nothing complete yet
        best_mode = max(self.flux_modes, key=self.flux_modes.get)
        edges_per_sec = self.flux_modes[best_mode]
        cycle_time = min(self.vcycle_modes.values())
        doc = {
            "metric": "compute_flux_edges_per_sec",
            "value": round(edges_per_sec, 1),
            "unit": "edges/sec",
            "vs_baseline": round(edges_per_sec
                                 / CPU_BASELINE_FLUX_EDGES_PER_SEC, 3),
            "accumulate": best_mode,
            "per_mode_edges_per_sec": {k: round(v, 1)
                                       for k, v in
                                       self.flux_modes.items()},
            "vcycle_wall_time_sec": round(cycle_time, 6),
            "vcycle_vs_baseline": round(CPU_BASELINE_VCYCLE_SEC
                                        / cycle_time, 3),
            "vcycle_per_mode_sec": {k: round(v, 6)
                                    for k, v in
                                    self.vcycle_modes.items()},
            **self.extras,
            "device": str(jax.devices()[0]),
            "dtype": "float32",
            "mesh": f"{self.spec.nx}x{self.spec.ny}"
                    f"x{self.spec.nz} L{self.spec.num_levels}",
            "num_internal_edges": n_edges,
            "bench_wall_sec": round(time.time() - _T0, 1),
        }
        print(json.dumps(doc), flush=True)


def _make_flux_fn(solver, mode, cfg):
    """A jitted v -> flux-like array closure for slope timing."""
    lvl0 = solver.dmesh.levels[0]
    v0 = solver.state["variables"][0]
    v0_t = v0 if solver._tstate else v0.T       # (5, N) view
    if mode == "pallas":
        pf = lvl0.pallas_flux
        return jax.jit(lambda v, pf=pf: pf(v)), v0_t
    if mode == "window":
        # plan arrays must travel as jit ARGUMENTS (HLO size)
        jf = jax.jit(lambda v, a, wf=lvl0.window_flux: wf(v, a))

        def flux_fn(v, jf=jf, a=lvl0.window_arrays):
            return jf(v, a)
        return flux_fn, v0_t
    if cfg.transposed:
        from mgcfd_tpu.ops import tops
        deltas, weights, _ = lvl0.shift
        if lvl0.shift_wpad_t is not None:
            wpad = lvl0.shift_wpad_t

            def flux_fn(v, deltas=deltas, wpad=wpad):
                return tops.t_shift_flux_rolled(deltas, wpad, v)
        else:
            weights_t = [w.T for w in weights]

            def flux_fn(v, deltas=deltas, weights_t=weights_t,
                        lvl0=lvl0):
                return tops.t_shift_flux(deltas, weights_t, v,
                                         lvl0.num_nodes)
        return jax.jit(flux_fn), v0_t
    flux_fn = jax.jit(
        lambda v, lvl0=lvl0, solver=solver, cfg=cfg:
        _compute_fluxes(lvl0, v, solver.dmesh.ff_flux, cfg))
    return flux_fn, solver.state["variables"][0]


def _vcycle_time(solver, cycles=50):
    """K-cycles-per-dispatch wall time. K=50 amortises the ~78 ms fixed
    per-dispatch tunnel overhead (K-scan, BASELINE.md round 3) — a
    harness artefact like the host-sync readback, amortised the same
    way the reference amortises process startup over its whole run."""
    import numpy as _np
    solver.config.check_invalid_every = 10 ** 9
    solver.run_batched(cycles, cycles)          # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        solver.run_batched(cycles, cycles)
        _np.asarray(solver.state["variables"][0].ravel()[:8])
        best = min(best, (time.perf_counter() - t0) / cycles)
    return best


def _flagship_mode(em, mesh, n_edges, mode, cfg):
    """One production mode end to end: flux rate + V-cycle, then emit."""
    solver = MGCFDSolver(mesh, cfg)
    flux_fn, arg = _make_flux_fn(solver, mode, cfg)
    t = _time(flux_fn, arg)
    em.flux_modes[mode] = n_edges / t
    _note(f"{mode}: flux {n_edges / t / 1e6:.1f} M edges/s")
    em.vcycle_modes[mode] = _vcycle_time(solver)
    _note(f"{mode}: vcycle {em.vcycle_modes[mode] * 1e3:.2f} ms")
    em.emit(n_edges)
    return solver


def _tet_phase(em, n_edges):
    """Secondary headline: the windowed-gather path on a genuinely
    unstructured tet mesh at M6 scale (the reference's real workload
    shape). Cached dataset; regenerated if absent."""
    import pickle
    import numpy as _np
    import jax.numpy as jnp

    cache = ".golden/benchtet/mesh.pkl"
    if os.path.exists(cache):
        mesh = pickle.load(open(cache, "rb"))
    else:
        from mgcfd_tpu.mesh.unstructured import \
            generate_unstructured_hierarchy
        from mgcfd_tpu.prep.renumber import renumber_hierarchy
        mesh = renumber_hierarchy(
            generate_unstructured_hierarchy(68, 64, 70, 4, seed=1))
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        pickle.dump(mesh, open(cache, "wb"))
    E = mesh.levels[0].num_internal_edges

    cfg = SolverConfig(dtype="float32", accumulate="window",
                       include_indirect_rw=False,
                       plan_cache_dir=".golden/benchtet/plans")
    s = MGCFDSolver(mesh, cfg)
    s.config.check_invalid_every = 10 ** 9

    # flux kernel, slope-timed with a chained dependency
    lvl0 = s.dmesh.levels[0]
    wf, arrs = lvl0.window_flux, lvl0.window_arrays
    f = jax.jit(lambda v, a: wf(v, a))
    q = s.state["variables"][0]

    def chain(k):
        x = q
        t0 = time.perf_counter()
        for _ in range(k):
            x = x + f(x, arrs) * jnp.float32(1e-12)
        _np.asarray(x.ravel()[:8])  # real fetch (tunnel ready-signal lies)
        return time.perf_counter() - t0
    chain(2)
    dt = (chain(22) - chain(2)) / 20
    em.extras["tet_flux_edges_per_sec"] = round(E / dt, 1)
    em.extras["tet_flux_vs_cpu"] = round(E / dt
                                         / CPU_TET_FLUX_EDGES_PER_SEC, 3)
    _note(f"tet: flux {E / dt / 1e6:.1f} M edges/s")
    em.emit(n_edges)

    best = _vcycle_time(s, cycles=50)
    em.extras["tet_vcycle_wall_time_sec"] = round(best, 6)
    em.extras["tet_vcycle_vs_cpu"] = round(CPU_TET_VCYCLE_SEC / best, 3)
    _note(f"tet: vcycle {best * 1e3:.2f} ms")
    em.emit(n_edges)
    return s


def _in_cycle_flux(solver, n_edges):
    """MEASURED in-cycle flux rate + HBM-roofline share (VERDICT r04 #6).

    The repeated-dispatch flux metric pays tunnel dispatch per
    repetition and swung 2x across sessions; the stable kernel number
    is the xplane-measured per-eval time inside a real traced cycle
    (monitor/opstats.measure_production over the production program's
    named scopes — the same pipeline as --measure-ops). Returns
    (edges_per_sec, pct_hbm_peak) or None on any failure; in fused-stage
    mode the flux row includes the in-kernel time_step (slightly
    conservative). pct_hbm_peak divides the kernel's minimum HBM motion
    (one read of the (5, N) state operand + one write of the flux) by
    the device peak — the flux kernel is gather-issue-bound, so a LOW
    share is the honest roofline statement."""
    from mgcfd_tpu.core.constants import RK
    from mgcfd_tpu.bench.aggregate import device_peaks
    from mgcfd_tpu.monitor.opstats import measure_production

    m = measure_production(solver, cycles=1)
    fl = m.get(("flux", 0))
    if not fl or fl["time_us"] <= 0:
        return None
    t_eval = fl["time_us"] / 1e6 / RK        # level 0: RK evals/cycle
    rate = n_edges / t_eval
    lvl0 = solver.dmesh.levels[0]
    npad = lvl0.num_lanes or lvl0.num_nodes
    kern = lvl0.window_flux or lvl0.pallas_flux
    n_in = getattr(kern, "padded_in", npad) if kern is not None else npad
    bytes_eval = 4.0 * 5 * (n_in + npad)     # X read + flux write, fp32
    _, peak_bw = device_peaks(jax.devices()[0].device_kind)
    pct = (100.0 * bytes_eval / t_eval / peak_bw) if peak_bw else None
    return rate, pct


def _marginal(solver):
    """MARGINAL per-cycle cost (sustained throughput): the K-batch slope
    cancels the fixed per-dispatch tunnel overhead (~93 ms through axon
    — a K=25/50/100 fit matches xprof device busy exactly; BASELINE.md).
    Costs two extra scan compiles — opt-in via MGCFD_BENCH_FULL."""
    import numpy as _np
    times = {}
    for K in (25, 100):
        solver.run_batched(K, K)
        b = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            solver.run_batched(K, K)
            _np.asarray(solver.state["variables"][0].ravel()[:8])
            b = min(b, time.perf_counter() - t0)
        times[K] = b
    return (times[100] - times[25]) / 75


def main():
    full = os.environ.get("MGCFD_BENCH_FULL", "") not in ("", "0")
    if os.environ.get("MGCFD_BENCH_PLATFORM"):
        # CI smoke: pin the backend (the axon site hook ignores
        # JAX_PLATFORMS) and skip the device wait.
        jax.config.update("jax_platforms",
                          os.environ["MGCFD_BENCH_PLATFORM"])
    else:
        _wait_for_device()
    spec = FLAGSHIP_SPEC
    if os.environ.get("MGCFD_BENCH_SPEC"):
        # CI smoke: tiny mesh, e.g. MGCFD_BENCH_SPEC=8,8,8,2
        import dataclasses as _dc
        nx, ny, nz, nl = map(int,
                             os.environ["MGCFD_BENCH_SPEC"].split(","))
        spec = _dc.replace(FLAGSHIP_SPEC, nx=nx, ny=ny, nz=nz,
                           num_levels=nl)
    mesh = flagship_mesh(spec)
    n_edges = mesh.levels[0].num_internal_edges
    em = Emitter(spec)
    solvers = {}

    # Phase 1+2: the two production modes, fastest-to-first-line order.
    # 'window' first: it is the flagship winner on both mesh classes and
    # its plan cache (.golden/benchmesh/plans) makes setup cheap.
    phase_modes = [
        ("window", SolverConfig(dtype="float32",
                                include_indirect_rw=False,
                                accumulate="window",
                                plan_cache_dir=".golden/benchmesh/plans")),
        ("pallas", SolverConfig(dtype="float32",
                                include_indirect_rw=False,
                                accumulate="pallas")),
    ]
    if full:
        phase_modes += [
            ("shift_t", SolverConfig(dtype="float32",
                                     include_indirect_rw=False,
                                     accumulate="shift",
                                     transposed=True)),
            ("shift", SolverConfig(dtype="float32",
                                   include_indirect_rw=False,
                                   accumulate="shift")),
            ("segment", SolverConfig(dtype="float32",
                                     include_indirect_rw=False,
                                     accumulate="segment")),
        ]
    for i, (mode, cfg) in enumerate(phase_modes):
        if i > 0 and em.flux_modes and _remaining() < 180:
            _note(f"budget: skipping mode {mode} "
                  f"({_remaining():.0f}s left)")
            continue
        try:
            solvers[mode] = _flagship_mode(em, mesh, n_edges, mode, cfg)
        except Exception as e:   # a mode failing must not kill the bench
            _note(f"mode {mode} failed: {type(e).__name__}: {e}")

    # Measured in-cycle flux rate of the best flagship mode (one traced
    # cycle; stable across tunnel sessions where the repeated-dispatch
    # metric swings 2x — VERDICT r04 #6). Fallback-safe + budget-gated.
    if em.flux_modes and _remaining() > 180:
        try:
            bm = max(em.flux_modes, key=em.flux_modes.get)
            r = _in_cycle_flux(solvers[bm], n_edges)
            if r is not None:
                rate, pct = r
                em.extras["flux_in_cycle_edges_per_sec"] = round(rate, 1)
                em.extras["flux_in_cycle_vs_baseline"] = round(
                    rate / CPU_BASELINE_FLUX_EDGES_PER_SEC, 3)
                if pct is not None:
                    em.extras["pct_hbm_peak_flux"] = round(pct, 2)
                _note(f"in-cycle flux ({bm}): {rate / 1e6:.0f} M edges/s"
                      + (f", {pct:.1f}% HBM peak" if pct else ""))
                em.emit(n_edges)
        except Exception as e:
            _note(f"in-cycle flux failed: {type(e).__name__}: {e}")

    # Phase 3: unstructured tet flagship (the reference's real workload
    # shape). Cold tet compiles are the most expensive in the suite;
    # gate on remaining budget so the flagship line always survives.
    tet_solver = None
    if os.environ.get("MGCFD_BENCH_SPEC"):
        _note("spec override: skipping tet phase (full-size dataset)")
    elif _remaining() > 240:
        try:
            tet_solver = _tet_phase(em, n_edges)
        except Exception as e:
            _note(f"tet metrics failed: {type(e).__name__}: {e}")
    else:
        _note(f"budget: skipping tet phase ({_remaining():.0f}s left)")

    if tet_solver is not None and _remaining() > 180:
        try:
            E = tet_solver.mesh.levels[0].num_internal_edges
            r = _in_cycle_flux(tet_solver, E)
            if r is not None:
                rate, pct = r
                em.extras["tet_flux_in_cycle_edges_per_sec"] = round(
                    rate, 1)
                em.extras["tet_flux_in_cycle_vs_cpu"] = round(
                    rate / CPU_TET_FLUX_EDGES_PER_SEC, 3)
                if pct is not None:
                    em.extras["tet_pct_hbm_peak_flux"] = round(pct, 2)
                _note(f"tet in-cycle flux: {rate / 1e6:.0f} M edges/s")
                em.emit(n_edges)
        except Exception as e:
            _note(f"tet in-cycle flux failed: {type(e).__name__}: {e}")

    # Phase 4 (opt-in extras): marginal-K slopes + indirect-rw twin.
    if full and em.vcycle_modes and _remaining() > 300:
        try:
            bm = min(em.vcycle_modes, key=em.vcycle_modes.get)
            marg = _marginal(solvers[bm])
            em.extras["vcycle_marginal_sec"] = round(marg, 6)
            em.extras["vcycle_marginal_vs_baseline"] = round(
                CPU_BASELINE_VCYCLE_SEC / marg, 3)
            em.emit(n_edges)
        except Exception as e:
            _note(f"marginal metric failed: {type(e).__name__}: {e}")
        if tet_solver is not None and _remaining() > 240:
            try:
                marg = _marginal(tet_solver)
                em.extras["tet_vcycle_marginal_sec"] = round(marg, 6)
                em.extras["tet_vcycle_marginal_vs_cpu"] = round(
                    CPU_TET_VCYCLE_SEC / marg, 3)
                em.emit(n_edges)
            except Exception as e:
                _note(f"tet marginal failed: {type(e).__name__}: {e}")
        if _remaining() > 240:
            # like-for-like: faithful indirect_rw twin ON (same slicing
            # traffic, near-zero flops) vs the CPU total WITH rw
            try:
                rw_solver = MGCFDSolver(mesh, SolverConfig(
                    dtype="float32", include_indirect_rw=True,
                    accumulate="pallas"))
                rw = _vcycle_time(rw_solver)
                em.extras["vcycle_with_rw_twin_sec"] = round(rw, 6)
                em.extras["vcycle_with_rw_twin_vs_baseline"] = round(
                    CPU_BASELINE_VCYCLE_WITH_RW_SEC / rw, 3)
                em.emit(n_edges)
            except Exception as e:
                _note(f"rw-twin cycle failed: {type(e).__name__}: {e}")

    if not em.flux_modes or not em.vcycle_modes:
        # Nothing completed — still emit a parseable failure marker.
        print(json.dumps({"metric": "compute_flux_edges_per_sec",
                          "value": None, "unit": "edges/sec",
                          "vs_baseline": None, "error": "no mode ran"}),
              flush=True)


if __name__ == "__main__":
    main()
