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
import time

import jax
import jax.numpy as jnp

from mgcfd_tpu.bench import flagship_mesh, FLAGSHIP_SPEC
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver import MGCFDSolver
from mgcfd_tpu.solver.solver import _compute_fluxes

# Reference binary on this machine's CPU (see BASELINE.md "Measured"):
# gnu -O3 -ffast-math, 1 thread, Xeon @2.10GHz, flagship mesh:
# flux0 = 13,504,920 edge-iters / 0.349074 s
CPU_BASELINE_FLUX_EDGES_PER_SEC = 38.69e6
CPU_BASELINE_VCYCLE_SEC = 0.2433


def main():
    mesh = flagship_mesh()
    cfg = SolverConfig(dtype="float32", include_indirect_rw=False,
                       accumulate="segment")
    solver = MGCFDSolver(mesh, cfg)
    lvl0 = solver.dmesh.levels[0]
    n_edges = mesh.levels[0].num_internal_edges

    flux_fn = jax.jit(
        lambda v: _compute_fluxes(lvl0, v, solver.dmesh.ff_flux, cfg))
    v0 = solver.state["variables"][0]

    flux_fn(v0).block_until_ready()  # compile
    reps = 30
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = flux_fn(v0)
    out.block_until_ready()
    flux_time = (time.perf_counter() - t0) / reps
    edges_per_sec = n_edges / flux_time

    # Full V-cycle wall time (jit-compiled; includes all levels and MG ops)
    solver.run(cycles=1)  # compile + warm
    t0 = time.perf_counter()
    cycles = 5
    solver.run(cycles=cycles)
    jax.block_until_ready(solver.state["variables"][0])
    cycle_time = (time.perf_counter() - t0) / cycles

    print(json.dumps({
        "metric": "compute_flux_edges_per_sec",
        "value": round(edges_per_sec, 1),
        "unit": "edges/sec",
        "vs_baseline": round(edges_per_sec / CPU_BASELINE_FLUX_EDGES_PER_SEC,
                             3),
        "vcycle_wall_time_sec": round(cycle_time, 6),
        "device": str(jax.devices()[0]),
        "dtype": cfg.dtype,
        "accumulate": cfg.accumulate,
        "mesh": f"{FLAGSHIP_SPEC.nx}x{FLAGSHIP_SPEC.ny}x{FLAGSHIP_SPEC.nz}"
                f" L{FLAGSHIP_SPEC.num_levels}",
        "num_internal_edges": n_edges,
    }))


if __name__ == "__main__":
    main()
