"""Command-line driver.

Mirrors the reference binary's interface (config.cpp:32-47, :281-305):
  -i/--input-file, -c/--config-filepath, -d/--input-directory,
  -o/--output-file-prefix, -m/--mesh-duplicate-count, -g/--num-cycles,
  -v/--validate-result, --output-variables/-fluxes/-step-factors/-volumes
plus TPU-era additions: --dtype, --partitions, --monitor, --synthetic.

Config files are `key = value` lines with `#` comments (read_config,
config.cpp:159-217); CLI flags override file values when given.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

from ..core.config import SolverConfig
from ..mesh import load_multigrid_mesh, duplicate_mesh
from ..validate.golden import (
    dump_variables, dump_scalars, output_filepath, solution_filepath,
    read_solution, identify_differences)

def read_config_file(path: str, cfg: SolverConfig) -> None:
    base = os.path.dirname(os.path.abspath(path))
    with open(path) as f:
        for raw in f:
            line = raw.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            key, value = (s.strip() for s in line.split("=", 1))
            if key == "input_file":
                cfg.input_file = value
            elif key == "input_file_directory":
                # relative paths are relative to the config file
                # (config.cpp:196-216)
                cfg.input_file_directory = (
                    value if value.startswith("/")
                    else (base if value == "./"
                          else os.path.join(base, value)))
            elif key == "output_file_prefix":
                cfg.output_file_prefix = value
            elif key == "mesh_duplicate_count":
                cfg.mesh_duplicate_count = int(value)
            elif key == "cycles":
                cfg.num_cycles = int(value)
            elif key == "output_variables":
                cfg.output_variables = value == "Y"
            elif key == "output_step_factors":
                cfg.output_step_factors = value == "Y"
            elif key == "output_fluxes":
                cfg.output_fluxes = value == "Y"
            elif key == "output_volumes":
                cfg.output_volumes = value == "Y"
            elif key == "output_edge_fluxes":
                cfg.output_edge_fluxes = value == "Y"
            elif key == "dtype":
                cfg.dtype = value
            elif key == "partitions":
                cfg.num_partitions = int(value)
            elif key == "shard_levels":
                cfg.shard_levels = int(value)
            elif key == "partition_2d":
                cfg.partition_2d = value
            elif key == "papi_config_file":
                cfg.event_config_file = (
                    value if value.startswith("/")
                    else os.path.join(base, value))
            elif key == "compile_cache":
                cfg.compile_cache_dir = (
                    value if value.startswith("/")
                    else os.path.join(base, value))
            elif key in ("omp_num_threads", "output_old_variables",
                         "config_filepath"):
                pass  # accepted for reference compatibility
            else:
                print(f"WARNING: Unknown key '{key}' encountered during "
                      f"parsing of config file.")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="mgcfd",
        description="TPU-native MG-CFD: 3D unstructured-mesh multigrid "
                    "Euler solver")
    p.add_argument("-i", "--input-file", default=None,
                   help="Multigrid input grid (input.dat descriptor)")
    p.add_argument("-c", "--config-filepath", default=None,
                   help="key=value config file")
    p.add_argument("-d", "--input-directory", default=None)
    p.add_argument("-o", "--output-file-prefix", default=None)
    p.add_argument("-m", "--mesh-duplicate-count", type=int, default=None)
    p.add_argument("-g", "--num-cycles", type=int, default=None)
    p.add_argument("-v", "--validate-result", action="store_true")
    p.add_argument("-p", "--papi-config-file", default=None,
                   help="event-selection file (papi.conf analogue): one "
                        "event name per line choosing the XLACosts.csv "
                        "rows — XLA_FLOPS_ESTIMATE, "
                        "XLA_BYTES_ACCESSED_ESTIMATE, "
                        "XLA_TRANSCENDENTALS_ESTIMATE, "
                        "XLA_OPTIMAL_SECONDS_ESTIMATE, CALLS")
    p.add_argument("--output-variables", action="store_true")
    p.add_argument("--output-fluxes", action="store_true")
    p.add_argument("--output-step-factors", action="store_true")
    p.add_argument("--output-volumes", action="store_true")
    p.add_argument("--output-edge-fluxes", action="store_true")
    # TPU-era options
    p.add_argument("--dtype", default=None,
                   choices=["float32", "float64", "bfloat16"])
    p.add_argument("--shard-levels", type=int, default=None,
                   help="with --partitions: how many MG levels are "
                        "sharded (coarser levels replicate; default 1; "
                        "0 = auto by the SCALING.md crossover rule)")
    p.add_argument("--partitions", type=int, default=None,
                   help="SPMD shards over the device mesh")
    p.add_argument("--partition-2d", default=None, metavar="PXxPY|auto",
                   help="with --partitions: 2-D tile decomposition of "
                        "the sharded levels instead of 1-D slabs "
                        "('auto' = near-square); pays off where slab "
                        "separators stop scaling (P >~ 16)")
    p.add_argument("--monitor", choices=["fused", "instrumented"],
                   default=None, help="per-kernel timing mode")
    p.add_argument("--synthetic", default=None, metavar="NX,NY,NZ,L",
                   help="run on a generated box mesh instead of -i")
    p.add_argument("--accumulate", default=None,
                   choices=["auto", "segment", "scatter", "ell", "shift",
                            "pallas", "window"],
                   help="flux accumulation strategy; default 'auto' "
                        "picks the fast path for the backend and mesh "
                        "(pallas on shift-covered meshes, window "
                        "otherwise, segment on CPU/float64)")
    p.add_argument("--renumber", action="store_true",
                   help="RCM-renumber the mesh hierarchy before solving "
                        "(prep/renumber.py): imported unstructured "
                        "meshes arrive in arbitrary order and the fast "
                        "paths depend on locality. NOTE: dumps and "
                        "validation then use the renumbered node order.")
    # kernel variants (reference compile-time macros as runtime switches)
    p.add_argument("--flux-cripple", action="store_true",
                   help="also run the arithmetic-free flux twin "
                        "(FLUX_CRIPPLE)")
    p.add_argument("--flux-precompute-edge-weights", action="store_true",
                   help="precompute |edge normal| "
                        "(FLUX_PRECOMPUTE_EDGE_WEIGHTS)")
    p.add_argument("--flux-fission", action="store_true",
                   help="two-phase flux: per-edge store + update "
                        "(FLUX_FISSION)")
    p.add_argument("--flux-reuse-div", action="store_true",
                   help="FLUX_REUSE_DIV (reporting only; XLA already "
                        "shares reciprocals)")
    p.add_argument("--flux-reuse-factor", action="store_true",
                   help="FLUX_REUSE_FACTOR (reporting only)")
    p.add_argument("--no-indirect-rw", action="store_true",
                   help="skip the indirect_rw data-movement twin")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--checkpoint-every", type=int, default=None,
                   metavar="CYCLES")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in "
                        "--checkpoint-dir")
    p.add_argument("--platform", default=None,
                   help="jax platform override, e.g. cpu (useful when the "
                        "TPU is held by another process)")
    p.add_argument("--transposed", action="store_true",
                   help="variable-major (5, N) state layout in the RK "
                        "loop (with --accumulate shift)")
    p.add_argument("--measure-ops", action="store_true",
                   help="capture one profiled cycle after the run and "
                        "emit MEASURED per-kernel device time beside "
                        "the XLACosts estimates (XPROF_DEVICE_TIME_US "
                        "rows; needs --monitor instrumented)")
    p.add_argument("--profile-dir", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of one extra "
                        "V-cycle after the run (view with xprof/"
                        "tensorboard)")
    p.add_argument("--plan-cache", default=None, metavar="DIR",
                   help="content-addressed cache for windowed-gather "
                        "plans (--accumulate window preprocessing)")
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache: repeat runs "
                        "of one configuration skip the cold compile "
                        "(minutes at capacity scale through the tunnel)")
    p.add_argument("--dump-hlo", default=None, metavar="DIR",
                   help="save compiled optimized-HLO text per kernel "
                        "(instrumented) or for the whole V-cycle (fused) "
                        "— the objdump-capture analogue of the reference "
                        "harness (run-mgcfd.sh:97-119)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    if args.dtype == "float64":
        # without this, jax silently truncates fp64 arrays to fp32
        import jax
        jax.config.update("jax_enable_x64", True)
    cfg = SolverConfig()
    if args.config_filepath:
        read_config_file(args.config_filepath, cfg)
    if args.input_file is not None:
        cfg.input_file = args.input_file
    if args.input_directory is not None:
        cfg.input_file_directory = args.input_directory
    if args.output_file_prefix is not None:
        cfg.output_file_prefix = args.output_file_prefix
    if args.mesh_duplicate_count is not None:
        cfg.mesh_duplicate_count = args.mesh_duplicate_count
    if args.num_cycles is not None:
        cfg.num_cycles = args.num_cycles
    cfg.validate_result = args.validate_result or cfg.validate_result
    cfg.output_variables |= args.output_variables
    cfg.output_fluxes |= args.output_fluxes
    cfg.output_step_factors |= args.output_step_factors
    cfg.output_volumes |= args.output_volumes
    cfg.output_edge_fluxes |= args.output_edge_fluxes
    if args.dtype:
        cfg.dtype = args.dtype
    if args.partitions:
        cfg.num_partitions = args.partitions
    if args.shard_levels is not None:
        cfg.shard_levels = args.shard_levels
    if args.partition_2d is not None:
        cfg.partition_2d = args.partition_2d
    if args.monitor:
        cfg.monitor_mode = args.monitor
    if args.accumulate:
        cfg.accumulate = args.accumulate
    cfg.transposed |= args.transposed
    cfg.flux_cripple |= args.flux_cripple
    cfg.flux_precompute_edge_weights |= args.flux_precompute_edge_weights
    cfg.flux_fission |= args.flux_fission
    cfg.flux_reuse_div |= args.flux_reuse_div
    cfg.flux_reuse_factor |= args.flux_reuse_factor
    if args.no_indirect_rw:
        cfg.include_indirect_rw = False
    if args.papi_config_file is not None:
        cfg.event_config_file = args.papi_config_file
    if args.plan_cache is not None:
        cfg.plan_cache_dir = args.plan_cache
    if args.compile_cache is not None:
        cfg.compile_cache_dir = args.compile_cache
    if cfg.compile_cache_dir:
        from ..utils.compilecache import enable_compile_cache
        enable_compile_cache(cfg.compile_cache_dir)
    else:
        # A previous in-process invocation may have enabled a cache dir;
        # without an explicit request this run must not keep writing there.
        from ..utils.compilecache import disable_compile_cache
        disable_compile_cache()
    if args.checkpoint_dir is not None:
        cfg.checkpoint_dir = args.checkpoint_dir
    if args.checkpoint_every is not None:
        cfg.checkpoint_every = args.checkpoint_every
    cfg.resume |= args.resume

    # --- load mesh ---
    if args.synthetic:
        from ..bench.flagship import FlagshipSpec, flagship_mesh
        nx, ny, nz, L = (int(x) for x in args.synthetic.split(","))
        mesh = flagship_mesh(FlagshipSpec(nx=nx, ny=ny, nz=nz,
                                          num_levels=L))
    else:
        if not cfg.input_file:
            print("ERROR: input_file not set")
            return 1
        path = cfg.input_file
        if cfg.input_file_directory:
            path = os.path.join(cfg.input_file_directory, cfg.input_file)
        mesh = load_multigrid_mesh(path, cfg.input_file_directory)
    if cfg.mesh_duplicate_count > 1:
        mesh = duplicate_mesh(mesh, cfg.mesh_duplicate_count)
    if args.renumber:
        from ..prep.renumber import renumber_hierarchy
        mesh = renumber_hierarchy(mesh)

    # --- run ---
    t0 = time.time()
    if cfg.num_partitions > 1 and cfg.monitor_mode == "instrumented":
        from ..monitor import InstrumentedShardedSolver
        solver = InstrumentedShardedSolver(mesh, cfg)
        stats = solver.run(cfg.num_cycles, verbose=True)
    elif cfg.num_partitions > 1:
        from ..parallel import ShardedSolver
        solver = ShardedSolver(mesh, cfg)
        remaining = max(0, cfg.num_cycles - solver.completed_cycles)
        if remaining < cfg.num_cycles:
            print(f"Resumed at cycle {solver.completed_cycles}; "
                  f"running {remaining} more")
        solver.run(remaining, verbose=True)
        stats = None
    elif cfg.monitor_mode == "instrumented":
        from ..monitor import InstrumentedSolver
        solver = InstrumentedSolver(mesh, cfg)
        stats = solver.run(cfg.num_cycles, verbose=True)
    else:
        from ..solver import MGCFDSolver
        solver = MGCFDSolver(mesh, cfg)
        remaining = max(0, cfg.num_cycles - solver.completed_cycles)
        if remaining < cfg.num_cycles:
            print(f"Resumed at cycle {solver.completed_cycles}; "
                  f"running {remaining} more")
        solver.run(remaining, verbose=True)
        stats = None
    total = time.time() - t0
    print(f"Total runtime = {total}")

    if args.profile_dir and hasattr(solver, "run"):
        import jax
        with jax.profiler.trace(args.profile_dir):
            solver.run(1)
        print(f"Profiler trace written to: {args.profile_dir}")

    if args.measure_ops:
        if cfg.monitor_mode == "instrumented" and hasattr(solver, "k"):
            from ..monitor.opstats import measure_instrumented
            measured = measure_instrumented(solver)
            print(f"Measured device time captured for {len(measured)} "
                  f"kernels (XPROF_* rows of XLACosts.csv)")
        elif hasattr(solver, "_cycle"):
            # PRODUCTION fused program (default monitor): per-op xplane
            # attribution through the cycle's named scopes
            # (monitor/opstats.measure_production; VERDICT r04 #4).
            from ..monitor.csvout import (CsvIdentification,
                                          write_costs_csv)
            from ..monitor.opstats import measure_production
            measured = measure_production(solver)
            for (k, l), v in sorted(measured.items(),
                                    key=lambda kv: (kv[0][1], kv[0][0])):
                print(f"  measured {k} level {l}: "
                      f"{v['time_us']:.1f} us device "
                      f"({v['occurrences']} ops)")
            ident = CsvIdentification.build(
                cfg, mesh, num_partitions=cfg.num_partitions)
            rows = [("XPROF_DEVICE_TIME_US",
                     {kl: v["time_us"] for kl, v in measured.items()}),
                    ("XPROF_OCCURRENCES",
                     {kl: v["occurrences"]
                      for kl, v in measured.items()})]
            path = write_costs_csv(cfg.output_file_prefix, ident, rows,
                                   mesh.num_levels)
            print(f"Measured device time captured for {len(measured)} "
                  f"kernels -> {path}")
        else:
            print("WARNING: --measure-ops is unavailable for this run "
                  "mode; skipping")

    if args.dump_hlo and hasattr(solver, "dump_hlo"):
        paths = solver.dump_hlo(args.dump_hlo)
        print(f"HLO artifacts written: {len(paths)} files in "
              f"{args.dump_hlo}")

    # --- validation (euler3d_cpu_double.cpp:704-744) ---
    if cfg.validate_result:
        print("Beginning validation of variables[]")
        # per-level NaN/Inf/negative scan first (euler3d:704-710 runs
        # check_for_invalid_variables on EVERY level at -v time)
        from ..ops.validation import invalid_variables_count
        import jax.numpy as _jnp
        for level in range(mesh.num_levels):
            bad = int(invalid_variables_count(
                _jnp.asarray(solver.variables(level))))
            if bad:
                print(f"  level {level}: {bad} invalid entries")
                return 1
        print("  NaN check passed")
        sol_path = solution_filepath(cfg.input_file_directory, "variables",
                                     cfg.mesh_duplicate_count,
                                     cfg.num_cycles, 0)
        if not os.path.exists(sol_path):
            print("  could not open variables solution file:")
            print(f"    {sol_path}")
            print("  aborting validation")
        else:
            vars0 = solver.variables(0)
            sol = read_solution(sol_path, vars0.shape[0])
            from ..validate.golden import ValidationError
            try:
                identify_differences(vars0, sol, mesh.variant)
            except ValidationError as e:
                # reference ergonomics (validation.cpp:188-196): report
                # the offending value and exit EXIT_FAILURE cleanly —
                # no traceback
                print(f"Validation of variables[] failed: {e}")
                return 1
            print("PASS: variables[] validated successfully")

    # --- dumps (finest level only, euler3d:749-772) ---
    if cfg.output_variables:
        path = output_filepath(cfg.output_file_prefix, "variables",
                               cfg.mesh_duplicate_count, cfg.num_cycles, 0)
        print(f"Dumping variables[] to file: {path}")
        dump_variables(path, solver.variables(0))
    if cfg.output_step_factors:
        path = output_filepath(cfg.output_file_prefix, "step_factors",
                               cfg.mesh_duplicate_count, cfg.num_cycles, 0)
        dump_scalars(path, solver.step_factors(0))
    if cfg.output_volumes:
        path = output_filepath(cfg.output_file_prefix, "volumes",
                               cfg.mesh_duplicate_count, cfg.num_cycles, 0)
        dump_scalars(path, mesh.levels[0].volumes)
    if cfg.output_fluxes:
        # per-node flux dump (dump_flux, io_enhanced.cpp:791-817). The
        # reference dumps the fluxes array's END-OF-RUN state, which is
        # all zeros: every RK iteration ends with time_step/zero_fluxes
        # clearing it (verified against the binary: a --output-fluxes
        # run emits N rows of 0.00000000000000000e+00). Our functional
        # solver rebuilds fluxes each stage, so the faithful dump is the
        # same zero array.
        import numpy as _np
        path = output_filepath(cfg.output_file_prefix, "fluxes",
                               cfg.mesh_duplicate_count, cfg.num_cycles, 0)
        print(f"Dumping fluxes[] to file: {path}")
        dump_variables(path, _np.zeros((mesh.levels[0].num_nodes, 5)))
    if cfg.output_edge_fluxes:
        import numpy as _np
        from ..core.constants import far_field_state
        from ..ops import (internal_edge_flux, boundary_edge_flux,
                           wall_edge_flux)
        from ..validate.golden import dump_edge_fluxes
        if (hasattr(solver, "dmesh")
                and getattr(solver.dmesh, "node_orders", None) is None):
            lvl = solver.dmesh.levels[0]
            ea, eb, ew = lvl.edge_a, lvl.edge_b, lvl.edge_w
            bb, bw_, wb, ww = (lvl.bedge_b, lvl.bedge_w, lvl.wedge_b,
                               lvl.wedge_w)
        else:
            # sharded solvers hold per-shard streams, and the tile-
            # interleaved window solver holds internal-order indices
            # while variables() returns the caller's order — both
            # recondition the level-0 edge weights from the mesh (same
            # path the solver applied at partition time)
            import dataclasses as _dc
            from ..mesh.build import apply_ewt_conditioning
            l0 = _dc.replace(mesh.levels[0])
            l0.edge_w = l0.edge_w.copy()
            l0.bedge_w = l0.bedge_w.copy()
            l0.wedge_w = l0.wedge_w.copy()
            apply_ewt_conditioning([l0], mesh.variant)
            ea, eb, ew = l0.edge_a, l0.edge_b, l0.edge_w
            bb, bw_, wb, ww = (l0.bedge_b, l0.bedge_w, l0.wedge_b,
                               l0.wedge_w)
        import jax.numpy as jnp
        v0 = jnp.asarray(solver.variables(0))
        vi = _np.asarray(internal_edge_flux(v0[ea], v0[eb],
                                            jnp.asarray(ew, v0.dtype)))
        vb = _np.asarray(boundary_edge_flux(
            v0[bb], jnp.asarray(bw_, v0.dtype)))
        _, ff = far_field_state()
        vw = _np.asarray(wall_edge_flux(v0[wb], jnp.asarray(ww, v0.dtype),
                                        jnp.asarray(ff, v0.dtype)))
        paths = dump_edge_fluxes(cfg.output_file_prefix,
                                 cfg.mesh_duplicate_count,
                                 cfg.num_cycles, 0, vi, vb, vw)
        print(f"Dumped edge fluxes: {len(paths)} files")

    # --- monitoring reports ---
    if stats is not None:
        paths = solver.write_reports(cfg.output_file_prefix)
        print(f"Loop runtimes written to: {paths[0]}")
        print(f"Loop stats written to: {paths[1]}")
        if len(paths) > 2:
            print(f"Cost analysis written to: {paths[2]}")

    return 0


if __name__ == "__main__":
    sys.exit(main())
