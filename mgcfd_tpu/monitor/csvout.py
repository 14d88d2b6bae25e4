"""CSV output with the reference's schema.

The reference writes Times.csv / PAPI.csv / LoopNumIters.csv with a shared
~16-column identification prefix (prepare_csv_identification,
io_enhanced.cpp:858-1016) followed by per-kernel x per-level columns
(timer.cpp:106-195, loop_stats.cpp:83-171). We keep the column NAMES so
the aggregation tooling carries over, with platform-appropriate values:
CC -> "jax", CC version -> jax.__version__, Instruction set -> device
kind, SIMD len -> lane width stand-in, CPU -> device description,
Num threads -> partition count.
"""
from __future__ import annotations

import dataclasses
import os

KERNEL_COLUMNS = ["flux", "update", "compute_step", "time_step",
                  "restrict", "prolong", "indirect_rw"]


@dataclasses.dataclass
class CsvIdentification:
    size: int
    mesh_name: str
    mg_cycles: int
    flux_variant: str
    flux_options: str
    cc: str
    cc_version: str
    opt_level: str
    instruction_set: str
    simd: str
    simd_len: str
    openmp: str
    num_threads: int
    omp_scatters: str
    flux_fission: str
    cpu: str

    @staticmethod
    def build(config, mesh, num_partitions=1):
        import jax
        dev = jax.devices()[0]
        return CsvIdentification(
            size=mesh.problem_size,
            mesh_name=mesh.variant.value,
            mg_cycles=config.num_cycles,
            flux_variant=config.flux_variant_string(),
            flux_options=config.flux_options_string(),
            cc="jax",
            cc_version=jax.__version__,
            opt_level="3",
            instruction_set=getattr(dev, "device_kind", dev.platform),
            simd="Y",
            simd_len=str({"float32": 8, "float64": 4,
                          "bfloat16": 16}.get(config.dtype, 8)),
            openmp="Strong" if num_partitions > 1 else "Off",
            num_threads=num_partitions,
            omp_scatters="N",
            flux_fission="Y" if config.flux_fission else "N",
            cpu=str(dev),
        )

    def header(self) -> str:
        return ("Size,Mesh,MG cycles,Flux variant,Flux options,CC,"
                "CC version,Opt level,Instruction set,SIMD,SIMD len,"
                "OpenMP,Num threads,Permit scatter OpenMP,Flux fission,"
                "CPU,")

    def row(self) -> str:
        return (f"{self.size},{self.mesh_name},{self.mg_cycles},"
                f"{self.flux_variant},{self.flux_options},{self.cc},"
                f"{self.cc_version},{self.opt_level},"
                f"{self.instruction_set},{self.simd},{self.simd_len},"
                f"{self.openmp},{self.num_threads},{self.omp_scatters},"
                f"{self.flux_fission},{self.cpu},")


def _output_path(prefix: str, name: str) -> str:
    path = prefix or ""
    if path and not path.endswith("/"):
        path += "."
    return path + name


def _write_wide_csv(filepath: str, ident: CsvIdentification,
                    per_level: dict, num_levels: int,
                    total: float | None) -> str:
    """One row (ThreadNum=0): per-kernel x per-level columns in the
    reference order, plus Total for Times.csv."""
    header = ident.header() + "ThreadNum,CpuId,"
    for l in range(num_levels):
        for k in KERNEL_COLUMNS:
            header += f"{k}{l},"
    if total is not None:
        header += "Total,"

    row = ident.row() + "0,0,"
    for l in range(num_levels):
        for k in KERNEL_COLUMNS:
            row += f"{per_level.get((k, l), 0)},"
    if total is not None:
        row += f"{total},"

    os.makedirs(os.path.dirname(filepath) or ".", exist_ok=True)
    with open(filepath, "w") as f:
        f.write(header + "\n")
        f.write(row + "\n")
    return filepath


def write_times_csv(prefix: str, ident: CsvIdentification,
                    times: dict, num_levels: int, total_time: float) -> str:
    return _write_wide_csv(_output_path(prefix, "Times.csv"), ident,
                           times, num_levels, total_time)


def write_loop_stats_csv(prefix: str, ident: CsvIdentification,
                         iters: dict, num_levels: int) -> str:
    return _write_wide_csv(_output_path(prefix, "LoopNumIters.csv"), ident,
                           iters, num_levels, None)


def write_costs_csv(prefix: str, ident: CsvIdentification,
                    events: list, num_levels: int) -> str:
    """XLACosts.csv — the PAPI.csv analogue. PAPI hardware counters don't
    exist for TPU user code; the compiler's cost analysis provides the
    same per-kernel flop/byte attribution the reference derived from
    PAPI_TOT_INS + objdump (aggregate-output-data.py:499-540). Format
    mirrors PAPI.csv: one row per 'event', kernel x level columns.
    `events`: [(event_name, {(kernel, level): value})] — the selection
    comes from `-p events.conf` (monitor/events.py), defaulting to
    flops + bytes + calls."""
    filepath = _output_path(prefix, "XLACosts.csv")
    header = ident.header() + "ThreadNum,CpuId,Event,"
    for l in range(num_levels):
        for k in KERNEL_COLUMNS:
            header += f"{k}{l},"
    lines = [header]
    for event, data in events:
        row = ident.row() + f"0,0,{event},"
        for l in range(num_levels):
            for k in KERNEL_COLUMNS:
                row += f"{data.get((k, l), 0)},"
        lines.append(row)
    os.makedirs(os.path.dirname(filepath) or ".", exist_ok=True)
    with open(filepath, "w") as f:
        f.write("\n".join(lines) + "\n")
    return filepath
