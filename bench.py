#!/usr/bin/env python
"""Headline benchmark: compute_flux edges/sec + V-cycle wall time on the
flagship M6-scale mesh (304,640 nodes / 900,328 internal edges, 4 levels).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline compares against the reference C++ binary measured on this
machine's CPU (single core, gnu -O3 -ffast-math; see BASELINE.md).
"""
from __future__ import annotations

import json
import os
import time

import jax

if os.environ.get("MGCFD_COMPILE_CACHE"):
    from mgcfd_tpu.utils.compilecache import enable_compile_cache
    enable_compile_cache(os.environ["MGCFD_COMPILE_CACHE"])

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


def _wait_for_device(max_wait_sec=900):
    """The axon TPU tunnel on this machine wedges for minutes if two
    processes ever raced it; poll in subprocesses until the backend is
    usable so the driver's round-end bench never dies to a stale lease.
    Falls back to CPU (flagged in the output) as a last resort."""
    import subprocess
    import sys
    deadline = time.time() + max_wait_sec
    while time.time() < deadline:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices()"],
            capture_output=True, timeout=180)
        if r.returncode == 0:
            return True
        time.sleep(20)
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


# Reference binary on the unstructured tet-flagship hierarchy (305K
# nodes / 2.28M edges finest; .golden/benchtet, BASELINE.md round 2):
# flux0 = 34,181,685 edge-iters / 1.82 s; kernel Total excl. the rw
# twin 3.966 s / 5 cycles (median of 3 clean runs — single-core runs
# on this box swing ~2x under host contention, so baselines are taken
# with the machine quiet). The CPU degrades on unstructured (18.8M vs
# 38.7M edges/s) — its gathers cache-miss too.
CPU_TET_FLUX_EDGES_PER_SEC = 18.8e6
CPU_TET_VCYCLE_SEC = 0.7932


def _tet_metrics():
    """Secondary headline: the windowed-gather path on a genuinely
    unstructured tet mesh at M6 scale (the reference's real workload
    shape). Cached dataset; regenerated if absent."""
    import os
    import pickle
    out = {"tet_flux_edges_per_sec": None, "tet_vcycle_wall_time_sec": None,
           "tet_flux_vs_cpu": None, "tet_vcycle_vs_cpu": None,
           "tet_vcycle_marginal_sec": None, "tet_vcycle_marginal_vs_cpu": None}
    try:
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

        # flux kernel, slope-timed with a chained dependency (identical
        # re-executions through the tunnel report fake times)
        lvl0 = s.dmesh.levels[0]
        wf, arrs = lvl0.window_flux, lvl0.window_arrays
        f = jax.jit(lambda v, a: wf(v, a))
        q = s.state["variables"][0]

        def chain(k):
            import numpy as _np
            x = q
            t0 = time.perf_counter()
            for _ in range(k):
                x = x + f(x, arrs) * jnp.float32(1e-12)
            _np.asarray(x.ravel()[:8])   # real fetch (tunnel ready-signal lies)
            return time.perf_counter() - t0
        chain(2)
        dt = (chain(22) - chain(2)) / 20
        out["tet_flux_edges_per_sec"] = round(E / dt, 1)
        out["tet_flux_vs_cpu"] = round(E / dt
                                       / CPU_TET_FLUX_EDGES_PER_SEC, 3)

        import numpy as _np

        def batch_time(K):
            s.run_batched(K, K)          # compile + warm this K
            b = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                s.run_batched(K, K)
                _np.asarray(s.state["variables"][0].ravel()[:8])
                b = min(b, time.perf_counter() - t0)
            return b

        t25, t50, t100 = batch_time(25), batch_time(50), batch_time(100)
        best = t50 / 50
        out["tet_vcycle_wall_time_sec"] = round(best, 6)
        out["tet_vcycle_vs_cpu"] = round(CPU_TET_VCYCLE_SEC / best, 3)
        # MARGINAL per-cycle cost (sustained throughput): the K-batch
        # slope cancels the fixed per-dispatch tunnel overhead (~93 ms
        # through axon — a K=25/50/100 fit matches xprof device busy
        # exactly; BASELINE.md). The K=50 wall number above is kept for
        # round-over-round comparability.
        marg = (t100 - t25) / 75
        out["tet_vcycle_marginal_sec"] = round(marg, 6)
        out["tet_vcycle_marginal_vs_cpu"] = round(
            CPU_TET_VCYCLE_SEC / marg, 3)
    except Exception as e:  # the secondary metric must not kill the bench
        import sys
        print(f"bench: tet metrics failed: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)
    return out


def main():
    _wait_for_device()
    mesh = flagship_mesh()
    n_edges = mesh.levels[0].num_internal_edges

    results = {}
    solvers = {}
    candidates = (
        ("pallas", SolverConfig(dtype="float32",
                                include_indirect_rw=False,
                                accumulate="pallas")),
        ("window", SolverConfig(dtype="float32",
                                include_indirect_rw=False,
                                accumulate="window",
                                plan_cache_dir=".golden/benchmesh/plans")),
        ("shift_t", SolverConfig(dtype="float32",
                                 include_indirect_rw=False,
                                 accumulate="shift", transposed=True)),
        ("shift", SolverConfig(dtype="float32", include_indirect_rw=False,
                               accumulate="shift")),
        ("segment", SolverConfig(dtype="float32",
                                 include_indirect_rw=False,
                                 accumulate="segment")),
    )
    for mode, cfg in candidates:
        try:
            solver = MGCFDSolver(mesh, cfg)
            solvers[mode] = solver
            lvl0 = solver.dmesh.levels[0]
            v0 = solver.state["variables"][0]
            v0_t = v0 if solver._tstate else v0.T  # (5, N) view
            if mode == "pallas":
                pf = lvl0.pallas_flux
                flux_fn = jax.jit(lambda v, pf=pf: pf(v))
                arg = v0_t
            elif mode == "window":
                # plan arrays must travel as jit ARGUMENTS (HLO size)
                jf = jax.jit(lambda v, a, wf=lvl0.window_flux: wf(v, a))

                def flux_fn(v, jf=jf, a=lvl0.window_arrays):
                    return jf(v, a)
                arg = v0_t
            elif cfg.transposed:
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
                flux_fn = jax.jit(flux_fn)
                arg = v0_t
            else:
                flux_fn = jax.jit(
                    lambda v, lvl0=lvl0, solver=solver, cfg=cfg:
                    _compute_fluxes(lvl0, v, solver.dmesh.ff_flux, cfg))
                arg = solver.state["variables"][0]
            t = _time(flux_fn, arg)
            results[mode] = n_edges / t
        except Exception as e:  # a mode failing must not kill the bench
            import sys
            print(f"bench: mode {mode} failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            solvers.pop(mode, None)

    best_mode = max(results, key=results.get)
    edges_per_sec = results[best_mode]

    # Full V-cycle wall time. Defer the host-side NaN-guard sync to the
    # end of the run: each per-cycle device->host readback costs a full
    # tunnel round-trip (~50 ms measured), a harness artefact, not solver
    # work. Measured for both shift layouts (tunnel timing is noisy);
    # best wins.
    cycle_times = {}
    # K=50 cycles per dispatch: the tunnel charges ~78 ms of FIXED
    # per-dispatch overhead (K-scan, BASELINE.md round 3) — a harness
    # artefact like the host-sync readback, amortised the same way the
    # reference amortises process startup over its whole run
    cycles = 50
    for mode in ("pallas", "window", "shift_t", "shift"):
        solver = solvers.get(mode)
        if solver is None:
            continue
        solver.config.check_invalid_every = 10 ** 9
        solver.run_batched(cycles, cycles)  # warm/compile
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            solver.run_batched(cycles, cycles)
            import numpy as _np
            _np.asarray(solver.state["variables"][0].ravel()[:8])
            best = min(best, (time.perf_counter() - t0) / cycles)
        cycle_times[mode] = best
    cycle_time = min(cycle_times.values())

    # marginal per-cycle cost of the winning mode (sustained rate): the
    # K-batch slope cancels the fixed per-dispatch tunnel overhead and
    # matches xprof device busy (BASELINE.md); K=50 wall stays the
    # comparable headline
    vcycle_marginal = None
    try:
        bm = min(cycle_times, key=cycle_times.get)
        sb = solvers[bm]
        times = {}
        for K in (25, 100):
            sb.run_batched(K, K)
            b = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                sb.run_batched(K, K)
                import numpy as _np
                _np.asarray(sb.state["variables"][0].ravel()[:8])
                b = min(b, time.perf_counter() - t0)
            times[K] = b
        vcycle_marginal = (times[100] - times[25]) / 75
    except Exception as e:
        import sys
        print(f"bench: marginal metric failed: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)

    # secondary like-for-like number: the faithful indirect_rw twin ON
    # (same slicing traffic, near-zero flops) vs the CPU total WITH rw
    rw_cycle_time = None
    try:
        rw_solver = MGCFDSolver(mesh, SolverConfig(
            dtype="float32", include_indirect_rw=True,
            accumulate="pallas"))
        rw_solver.config.check_invalid_every = 10 ** 9
        rw_solver.run_batched(cycles, cycles)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            rw_solver.run_batched(cycles, cycles)
            import numpy as _np
            _np.asarray(rw_solver.state["variables"][0].ravel()[:8])
            best = min(best, (time.perf_counter() - t0) / cycles)
        rw_cycle_time = best
    except Exception as e:
        import sys
        print(f"bench: rw-twin cycle failed: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)

    tet = _tet_metrics()

    print(json.dumps({
        "metric": "compute_flux_edges_per_sec",
        "value": round(edges_per_sec, 1),
        "unit": "edges/sec",
        "vs_baseline": round(edges_per_sec
                             / CPU_BASELINE_FLUX_EDGES_PER_SEC, 3),
        "accumulate": best_mode,
        "per_mode_edges_per_sec": {k: round(v, 1)
                                   for k, v in results.items()},
        "vcycle_wall_time_sec": round(cycle_time, 6),
        "vcycle_vs_baseline": round(CPU_BASELINE_VCYCLE_SEC / cycle_time,
                                    3),
        "vcycle_marginal_sec": (None if vcycle_marginal is None
                                else round(vcycle_marginal, 6)),
        "vcycle_marginal_vs_baseline": (
            None if vcycle_marginal is None
            else round(CPU_BASELINE_VCYCLE_SEC / vcycle_marginal, 3)),
        "vcycle_per_mode_sec": {k: round(v, 6)
                                for k, v in cycle_times.items()},
        "vcycle_with_rw_twin_sec": (None if rw_cycle_time is None
                                    else round(rw_cycle_time, 6)),
        "vcycle_with_rw_twin_vs_baseline": (
            None if rw_cycle_time is None
            else round(CPU_BASELINE_VCYCLE_WITH_RW_SEC / rw_cycle_time,
                       3)),
        **tet,
        "device": str(jax.devices()[0]),
        "dtype": "float32",
        "mesh": f"{FLAGSHIP_SPEC.nx}x{FLAGSHIP_SPEC.ny}x{FLAGSHIP_SPEC.nz}"
                f" L{FLAGSHIP_SPEC.num_levels}",
        "num_internal_edges": n_edges,
    }))


if __name__ == "__main__":
    main()
