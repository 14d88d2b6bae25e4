"""mgcfd_tpu — TPU-native unstructured-mesh multigrid CFD framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
warwick-hpsc/MG-CFD-app-plain (3D unstructured-mesh edge-based finite-volume
inviscid Euler solver with geometric multigrid, plus its benchmarking,
monitoring and validation harness).

Layering (TPU-first, not a port):
  core/      constants, typed containers, solver config
  mesh/      mesh generators, reference-format (.dat/.coords/.mg) I/O, caching
  prep/      renumbering, edge blocking, ELL incidence, partitioning
  ops/       pure-JAX kernels (flux, stepping, multigrid, validation)
  pallas/    hand-written TPU kernels for the hot edge loops
  solver/    RK smoother + multigrid V-cycle drivers (jit-compiled)
  parallel/  SPMD sharding, halo exchange, multi-chip V-cycle
  monitor/   per-kernel timers, iteration stats, cost analysis, CSV schema
  validate/  golden-file comparison semantics
  cli/       command-line driver mirroring the reference binary's flags
  bench/     job generation + result aggregation harness
"""

__version__ = "0.1.0"
