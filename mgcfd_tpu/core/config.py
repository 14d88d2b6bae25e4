"""Solver / run configuration.

The reference splits configuration across compile-time macros
(Makefile:1-20), runtime CLI flags (config.cpp:32-47) and the input.dat
descriptor (io_enhanced.cpp:407-579). Here everything is one runtime
dataclass; compile-time build variants of the reference become
config-selected kernel variants of the same program (the *names* are kept
so the harness/CSV schema lines up).
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class SolverConfig:
    # --- runtime flags (reference CLI: config.cpp:32-47) ---
    input_file: str = ""
    input_file_directory: str = ""
    output_file_prefix: str = ""
    mesh_duplicate_count: int = 1     # -m (weak scaling by replication)
    num_cycles: int = 25              # -g (default 25: config.cpp:63)
    validate_result: bool = False     # -v
    output_variables: bool = False
    output_fluxes: bool = False
    output_step_factors: bool = False
    output_volumes: bool = False
    output_edge_fluxes: bool = False

    # --- kernel variants (reference compile-time macros, same names) ---
    flux_fission: bool = False        # FLUX_FISSION: per-edge store + update
    flux_cripple: bool = False        # FLUX_CRIPPLE: memory-bound twin runs too
    flux_precompute_edge_weights: bool = False  # FLUX_PRECOMPUTE_EDGE_WEIGHTS
    flux_reuse_flux: bool = False     # FLUX_REUSE_FLUX (b-side = -a-side)
    # FLUX_REUSE_DIV / FLUX_REUSE_FACTOR are micro-optimisations of the
    # reference's scalar code (shared reciprocals / reused dissipation
    # factor); under XLA these rewrites are the compiler's job and the
    # math here already shares subexpressions, so the flags only affect
    # reporting (CSV "Flux options" field) for sweep-schema parity:
    flux_reuse_div: bool = False      # FLUX_REUSE_DIV
    flux_reuse_factor: bool = False   # FLUX_REUSE_FACTOR
    include_indirect_rw: bool = True  # reference always runs it in the RK loop

    # --- checkpoint / resume (new capability; SURVEY 5.4) ---
    checkpoint_dir: str = ""
    checkpoint_every: int = 0         # cycles between snapshots (0 = off)
    resume: bool = False              # resume from latest checkpoint

    # --- cost/profiler event selection (-p, the papi.conf analogue;
    # monitor/events.py) ---
    event_config_file: str = ""

    # --- TPU-specific policy (new; no reference counterpart) ---
    dtype: str = "float32"            # float64 for validation, float32/bf16 perf
    accumulate: str = "auto"          # 'auto'|'segment'|'scatter'|'ell'|
                                      # 'shift'|'pallas'|'window'; 'auto'
                                      # resolves at solver build
                                      # (solver.resolve_accumulate): the
                                      # fast path for the backend/mesh —
                                      # pallas when shift coverage is
                                      # high, window otherwise, segment
                                      # on CPU / float64 / flux_fission
    fuse_stage: bool = True           # accumulate='pallas': run the whole RK
    # stage (flux + boundary/wall + time_step + NaN count) as ONE kernel
    # launch; False falls back to the separate-kernel pipeline
    fuse_window_stage: bool | None = None  # same fusion for
    # accumulate='window' (PallasWindowFusedStage). None = auto: fuse
    # exactly when the kernel keeps whole-X VMEM residency — measured
    # faster there with depth-bucketed dispatch (9.33 vs 9.64 ms/cycle,
    # tet flagship); above the residency cliff (capacity-scale meshes)
    # the extra fused operands risk the Mosaic compile ceiling, so auto
    # turns it off. True/False force it.
    transposed: bool = False          # (NVAR, N) state layout inside the RK
    # loop (lane-major; needs accumulate='shift')
    window_tile_order: bool = True    # accumulate='window': run on an
    # INTERNAL tile-interleaved node order (prep/renumber.
    # tile_interleave_levels) so window-kernel operands/results are pure
    # reshapes of the state — removes ~1.9 ms/cycle of XLA relayout on
    # the tet flagship. External I/O (variables(), checkpoints, dumps)
    # is translated back; set False to run kernels directly in the
    # caller's node order (the pre-round-3 behavior).
    mg_gather: bool = True            # gather-transpose restrict/prolong
    # (TPU-fast; False falls back to the scatter formulation)
    plan_cache_dir: str = ""          # content-addressed npz cache for
    # windowed-gather plans (prep/window.cached_plan); "" = rebuild
    compile_cache_dir: str = ""       # persistent XLA compilation cache
    # (utils/compilecache.enable_compile_cache); "" = off. Repeat runs
    # of one configuration skip the minutes-scale cold compile.
    check_invalid_every: int = 1      # host-side NaN-guard cadence (cycles)
    num_partitions: int = 1           # SPMD shards (parallel/)
    partition_2d: str = ""            # 2-D tile decomposition of the
    # sharded levels: "" = 1-D contiguous blocks (slabs), "auto" =
    # near-square Px x Py tiling, "PXxPY" explicit. Realised as a node
    # REORDERING before block partitioning (partition_order_2d), so the
    # whole sharded machinery is decomposition-agnostic; external I/O
    # (variables(), checkpoints, dumps) is translated back. Pays off
    # where 1-D slab separators stop scaling (P >~ 16 at flagship size;
    # SCALING.md P-sweep).
    shard_levels: int = 1             # MG levels sharded (0..S-1);
    # coarser levels replicate. 0 = AUTO: shard while a level still has
    # >= 4096 nodes per shard (the crossover rule, SCALING.md: shard a
    # level while its whole-level time exceeds the ~30-60 us collective
    # floor — level 1 qualifies at flagship scale, level 3 never does).
    monitor_mode: str = "fused"       # 'fused' | 'instrumented'

    def validate(self) -> None:
        """Reject configurations that would silently ignore a requested
        kernel variant (VERDICT r02 #6). FLUX_FISSION is the reference's
        explicit per-edge-store + update two-phase split
        (flux_loops.cpp:120-123, cfd_loops.cpp:159-213); the
        shift/pallas/window formulations have no per-edge store phase at
        all — honoring the flag there is meaningless, and emitting a CSV
        identification row claiming 'Flux fission: Y' for a run that
        ignored it would corrupt sweep analyses. The edge-stream modes
        (segment/scatter/ell) are fission-structured and honor it."""
        if self.flux_fission and (
                self.accumulate in ("shift", "pallas", "window")
                or self.transposed):
            how = (f"accumulate='{self.accumulate}'"
                   + (" with transposed state" if self.transposed else ""))
            raise ValueError(
                f"flux_fission is undefined for {how}: these "
                "formulations have no per-edge store phase. Use "
                "accumulate='segment' (structurally fission) or drop "
                "the flag.")

    def flux_options_string(self) -> str:
        """CSV 'Flux options' field (io_enhanced.cpp:895-908 semantics)."""
        s = ""
        if self.flux_precompute_edge_weights:
            s += "PrecomputeLength;"
        if self.flux_reuse_div:
            s += "Reciprocal;"
        if self.flux_reuse_factor:
            s += "ReuseFactor;"
        if self.flux_reuse_flux:
            s += "ReuseFluxes;"
        return s

    def flux_variant_string(self) -> str:
        return "FluxCripple" if self.flux_cripple else "Normal"
