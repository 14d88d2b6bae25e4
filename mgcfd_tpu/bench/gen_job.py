"""Benchmark job generation.

TPU-era re-design of the reference's run-scripts/gen_job.py (Python 2,
477 lines): a JSON profile describes an iteration space; each point
becomes a job directory with a self-contained run.sh and the whole batch
gets submit_all.sh + list_errored_jobs.sh. The reference's compile-time
axes map onto runtime axes of the single program:

  reference axis                      TPU axis
  compilers (gnu/intel/clang/cray) -> dtypes (float32/float64/bfloat16)
  ISA targets (SSE42/AVX2/...)     -> accumulate strategies
                                      (segment/scatter/ell/pallas)
  flux-flag powerset               -> same flag names, runtime switches
                                      (FLUX_CRIPPLE still excludes others)
  thread counts                    -> partition counts (SPMD shards)
  mesh multiplier raising          -> -m passthrough (no thread-safety
                                      coupling: conflict-free by design)

Profile schema (see bench/profiles/annotated.json):
  {"compile": {"dtypes": [...], "accumulate": [...],
               "flux flags": [...], "min flag set size": 0},
   "run": {"partitions": [...], "num repeats": N, "mg cycles": N,
           "mesh multi": N, "unit walltime": secs, "platform": "..."},
   "setup": {"jobs dir": "...", "input dat": "...", "data dirpath": "..."}}
"""
from __future__ import annotations

import itertools
import json
import os
import stat
import sys

# FLUX_REUSE_FLUX is structurally always-on here (the b-side value is
# the exact negation of the a-side everywhere), so it is not a sweep axis.
FLUX_FLAGS = ["FLUX_CRIPPLE", "FLUX_PRECOMPUTE_EDGE_WEIGHTS",
              "FLUX_FISSION", "FLUX_REUSE_DIV", "FLUX_REUSE_FACTOR"]

DEFAULTS = {
    "compile": {"dtypes": ["float32"], "accumulate": ["segment"],
                "flux flags": [], "min flag set size": 0},
    "run": {"partitions": [1], "num repeats": 1, "mg cycles": 10,
            "mesh multi": 1, "unit walltime": 60.0, "platform": "",
            "validate": False},
    "setup": {"jobs dir": "jobs", "input dat": "input.dat",
              "data dirpath": ".", "synthetic": ""},
}


def _merged(profile: dict) -> dict:
    cfg = {k: dict(v) for k, v in DEFAULTS.items()}
    for cat, vals in profile.items():
        cfg.setdefault(cat, {}).update(vals)
    return cfg


def flag_sets(flags: list[str], min_size: int,
              accumulate: str = "segment") -> list[tuple[str, ...]]:
    """Powerset of flux flags, pruned: FLUX_CRIPPLE excludes all other
    flux flags (it replaces the arithmetic, so combinations are
    meaningless — same pruning as the reference's generator), and
    FLUX_FISSION only exists on the edge-stream accumulate modes (the
    shift/pallas/window kernels have no per-edge store phase; the solver
    rejects the combination, SolverConfig.validate)."""
    out = []
    fission_ok = accumulate in ("segment", "scatter", "ell")
    for r in range(min_size, len(flags) + 1):
        for combo in itertools.combinations(flags, r):
            if "FLUX_CRIPPLE" in combo and len(combo) > 1:
                continue
            if "FLUX_FISSION" in combo and not fission_ok:
                continue
            out.append(combo)
    return out


def estimate_walltime(unit: float, cycles: int, multi: int,
                      partitions: int) -> int:
    """unit_walltime * cycles * multi / sqrt(partitions), floored at 60s
    (same shape as the reference's heuristic)."""
    est = unit * cycles * max(1, multi) / max(1.0, partitions ** 0.5)
    return max(60, int(est))


def job_name(dtype: str, acc: str, flags: tuple[str, ...],
             parts: int, repeat: int, shard_levels: int = 1) -> str:
    f = ".".join(sorted(flags)) if flags else "noflags"
    sl = f".S{shard_levels}" if shard_levels != 1 else ""
    return f"{dtype}.{acc}.{f}.P{parts}{sl}.r{repeat}"


def generate_jobs(profile_path: str, repo_root: str | None = None) -> str:
    with open(profile_path) as f:
        profile = json.load(f)
    cfg = _merged(profile)
    comp, run, setup = cfg["compile"], cfg["run"], cfg["setup"]
    repo_root = repo_root or os.getcwd()

    jobs_dir = os.path.abspath(setup["jobs dir"])
    os.makedirs(jobs_dir, exist_ok=True)

    job_dirs = []
    # sharded-MG depth axis ("shard levels", default [1]; 0 = auto by
    # the SCALING.md crossover rule) — only meaningful with parts > 1,
    # so single-chip jobs prune the axis to avoid duplicates
    slevels_all = run.get("shard levels", [1])
    for dtype, acc, parts in itertools.product(
            comp["dtypes"], comp["accumulate"], run["partitions"]):
      slevels = slevels_all if parts > 1 else [1]
      for sl in slevels:
       for flags in flag_sets(comp["flux flags"],
                              comp["min flag set size"], acc):
        for repeat in range(run["num repeats"]):
            name = job_name(dtype, acc, flags, parts, repeat,
                            shard_levels=sl)
            jdir = os.path.join(jobs_dir, name)
            os.makedirs(jdir, exist_ok=True)

            cli = [sys.executable, "-m", "mgcfd_tpu.cli.main"]
            if setup.get("synthetic"):
                cli += ["--synthetic", setup["synthetic"]]
            else:
                cli += ["-i", setup["input dat"],
                        "-d", setup["data dirpath"]]
            # 'shift_t' = shift accumulation + variable-major layout
            acc_flags = (["--accumulate", "shift", "--transposed"]
                         if acc == "shift_t"
                         else ["--accumulate", acc])
            cli += ["-g", str(run["mg cycles"]),
                    "-m", str(run["mesh multi"]),
                    "-o", "./", "--dtype", dtype,
                    *acc_flags,
                    "--monitor", "instrumented",
                    # per-job event selection (the reference generator
                    # writes papi.conf with PAPI_TOT_INS/PAPI_TOT_CYC,
                    # gen_job.py:229-231)
                    "-p", "events.conf",
                    # compiled-artifact capture per job (the objdump
                    # analogue, run-templates/run-mgcfd.sh:97-119)
                    "--dump-hlo", "hlo"]
            # One persistent compilation cache across the sweep: repeats
            # and flag-only variants of one program skip the cold compile
            # (the reference pays this once at `make`;
            # utils/compilecache.py). Sweeps that exist to MEASURE
            # cold-compile cost (the make-time axis) opt out with
            # `"setup": {"compile cache": false}`.
            if setup.get("compile cache", True):
                cli += ["--compile-cache",
                        os.path.join(jobs_dir, "xlacache")]
            if parts > 1:
                cli += ["--partitions", str(parts)]
                if sl != 1:
                    cli += ["--shard-levels", str(sl)]
            if run.get("platform"):
                cli += ["--platform", run["platform"]]
            if run.get("validate"):
                cli += ["-v"]
            for fl in flags:
                cli += [f"--{fl.lower().replace('_', '-')}"]

            wall = estimate_walltime(run["unit walltime"],
                                     run["mg cycles"], run["mesh multi"],
                                     parts)
            script = f"""#!/bin/bash
# generated by mgcfd_tpu.bench.gen_job — walltime estimate: {wall}s
set -u
cd "$(dirname "$0")"
if [ -f Times.csv ]; then
  echo "Times.csv exists, job already complete; skipping."
  exit 0
fi
touch job-is-running.txt
# append (never overwrite) PYTHONPATH: some environments bootstrap the
# accelerator plugin through it
export PYTHONPATH="{repo_root}${{PYTHONPATH:+:$PYTHONPATH}}"
{" ".join(cli)} > run.log 2>&1
rc=$?
rm -f job-is-running.txt
if [ $rc -eq 0 ]; then touch job-is-complete.txt; else touch job-errored.txt; fi
exit $rc
"""
            events = run.get("events", ["XLA_FLOPS_ESTIMATE",
                                        "XLA_BYTES_ACCESSED_ESTIMATE",
                                        "XLA_TRANSCENDENTALS_ESTIMATE",
                                        "CALLS"])
            with open(os.path.join(jdir, "events.conf"), "w") as f:
                f.write("# cost/profiler events recorded per kernel "
                        "(XLACosts.csv rows)\n")
                f.write("\n".join(events) + "\n")
            spath = os.path.join(jdir, "run.sh")
            with open(spath, "w") as f:
                f.write(script)
            os.chmod(spath, os.stat(spath).st_mode | stat.S_IEXEC)
            job_dirs.append(jdir)

    submit = os.path.join(jobs_dir, "submit_all.sh")
    with open(submit, "w") as f:
        f.write("#!/bin/bash\nset -u\n")
        for d in job_dirs:
            f.write(f'echo "=== {os.path.basename(d)}"\n"{d}/run.sh"\n')
    os.chmod(submit, os.stat(submit).st_mode | stat.S_IEXEC)

    errored = os.path.join(jobs_dir, "list_errored_jobs.sh")
    with open(errored, "w") as f:
        f.write("#!/bin/bash\n"
                f'find "{jobs_dir}" -name job-errored.txt | sort\n')
    os.chmod(errored, os.stat(errored).st_mode | stat.S_IEXEC)
    return jobs_dir


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(
        description="generate benchmark job directories from a JSON "
                    "profile")
    p.add_argument("--json", required=True)
    args = p.parse_args(argv)
    jobs_dir = generate_jobs(args.json)
    print(f"jobs written to {jobs_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
