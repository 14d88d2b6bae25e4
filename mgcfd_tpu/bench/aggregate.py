"""Benchmark result aggregation.

Python-3 re-design of the reference's run-scripts/aggregate-output-data.py
(733 lines of Python 2): walk job directories, collate the per-job
Times.csv / LoopNumIters.csv (same identification-prefix schema,
monitor/csvout.py), average over repeats, and derive throughput metrics.

Derived metrics (reference: aggregate-output-data.py:542-724):
  edges/sec per kernel  = iterations / seconds   (the headline)
  GFLOPs/sec, GB/sec    = from XLA cost analysis when XLACosts data is
                          present (replaces objdump+PAPI instruction
                          classification — the compiler, not a regex over
                          x86 assembly, is the source of truth here)
Output: all-data-combined.csv (one row per config x kernel x level).
"""
from __future__ import annotations

import csv
import os
import sys
from collections import defaultdict

ID_COLS = ["Size", "Mesh", "MG cycles", "Flux variant", "Flux options",
           "CC", "CC version", "Opt level", "Instruction set", "SIMD",
           "SIMD len", "OpenMP", "Num threads", "Permit scatter OpenMP",
           "Flux fission", "CPU"]
KERNELS = ["flux", "update", "compute_step", "time_step", "restrict",
           "prolong", "indirect_rw"]

# Peak device rates for utilization normalization — the TPU analogue of
# the reference's GHz / Flops/Cycle derived columns (aggregate-output-
# data.py:624-692): instead of normalizing by clock, normalize by the
# device's peak FLOP/s and peak HBM bandwidth (public spec-sheet
# numbers). Keyed by substrings of the 'Instruction set' CSV field
# (jax device_kind). Values: (peak FLOP/s dense bf16, peak HBM B/s).
# This app is memory-bound (<1 flop/byte, SURVEY §6), so '% HBM peak'
# is the roofline-relevant column; '% peak FLOPs' is reported for
# completeness (fp32 VPU code sees a fraction of the bf16 MXU peak).
DEVICE_PEAKS = [
    ("v6e", (918e12, 1640e9)),
    ("v6 lite", (918e12, 1640e9)),   # jax device_kind string for v6e
    ("trillium", (918e12, 1640e9)),
    ("v5p", (459e12, 2765e9)),
    ("v5e", (197e12, 819e9)),
    ("v5 lite", (197e12, 819e9)),
    ("v4", (275e12, 1228e9)),
]


def device_peaks(device_kind: str):
    """-> (peak_flops, peak_bw) or (0, 0) when unknown (CPU, new TPUs)."""
    dk = (device_kind or "").lower()
    for key, peaks in DEVICE_PEAKS:
        if key in dk:
            return peaks
    return 0.0, 0.0


def _read_wide_csv(path: str):
    with open(path) as f:
        rows = list(csv.reader(f))
    if len(rows) < 2:
        return None
    header = [h for h in rows[0] if h != ""]
    out = []
    for row in rows[1:]:
        if not row or all(c == "" for c in row):
            continue
        out.append(dict(zip(header, row)))
    return header, out


def _split_kernel_cols(header):
    """-> {(kernel, level): column_name}"""
    out = {}
    for col in header:
        for k in KERNELS:
            if col.startswith(k) and col[len(k):].isdigit():
                out[(k, int(col[len(k):]))] = col
    return out


def _read_costs(path):
    """XLACosts.csv -> {(kernel, level): (flops, bytes)} per invocation."""
    r = _read_wide_csv(path)
    if r is None:
        return {}
    header, rows = r
    kcols = _split_kernel_cols(header)
    out = {}
    by_event = {row.get("Event", ""): row for row in rows}
    fl = by_event.get("XLA_FLOPS_ESTIMATE", {})
    by = by_event.get("XLA_BYTES_ACCESSED_ESTIMATE", {})
    ca = by_event.get("CALLS", {})
    for key, col in kcols.items():
        out[key] = (float(fl.get(col, 0) or 0),
                    float(by.get(col, 0) or 0),
                    float(ca.get(col, 0) or 0))
    return out


# HLO opcode classification for the captured per-kernel optimized HLO
# (--dump-hlo artifacts) — the analogue of the reference's objdump'd
# loop-assembly analysis (aggregate-output-data.py:219-304: instructions
# per loop iteration + x86 FP-instruction classification :499-540). On
# TPU the compiled artifact is optimized HLO; we classify its static
# instruction mix per kernel. Dynamic per-iteration arithmetic comes
# from the XLA cost analysis (flops/iter, bytes/iter columns).
_HLO_CLASSES = {
    "arith": {"add", "subtract", "multiply", "divide", "negate",
              "maximum", "minimum", "abs", "compare", "select", "and",
              "or", "not", "xor", "sign", "clamp"},
    "transcendental": {"sqrt", "rsqrt", "exp", "log", "power", "cbrt",
                       "tanh", "expm1", "log1p"},
    "layout": {"copy", "slice", "pad", "reshape", "broadcast",
               "transpose", "concatenate", "reverse", "bitcast",
               "bitcast-convert", "convert", "iota"},
    "indexed": {"gather", "scatter", "scatter-add", "dynamic-slice",
                "dynamic-update-slice"},
    "reduce": {"reduce", "reduce-window"},
    "fusion": {"fusion"},
    "kernel_call": {"custom-call"},   # pallas kernels lower to custom-call
    "collective": {"all-gather", "all-reduce", "reduce-scatter",
                   "collective-permute", "all-to-all",
                   "all-gather-start", "all-reduce-start"},
}
_HLO_OPCODE_RE = None


def analyze_hlo(path: str) -> dict:
    """Classify the static instruction mix of one optimized-HLO text
    dump: {'hlo ops': total, 'hlo <class>': count, ...}."""
    global _HLO_OPCODE_RE
    import re
    if _HLO_OPCODE_RE is None:
        # '  %name = f32[...]{...} opcode(' — opcode after the shape
        _HLO_OPCODE_RE = re.compile(
            r"=\s*(?:\([^)]*\)|[a-z0-9]+\[[^\]]*\][^ ]*)\s*"
            r"([a-z][a-z0-9._-]*)\(")
    counts = defaultdict(int)
    total = 0
    try:
        with open(path) as f:
            for line in f:
                m = _HLO_OPCODE_RE.search(line)
                if not m:
                    continue
                op = m.group(1)
                if op in ("parameter", "constant", "tuple",
                          "get-tuple-element"):
                    continue
                total += 1
                for cls, ops in _HLO_CLASSES.items():
                    if op in ops:
                        counts[cls] += 1
                        break
                else:
                    counts["other"] += 1
    except OSError:
        return {}
    out = {"hlo ops": total}
    for cls in list(_HLO_CLASSES) + ["other"]:
        out[f"hlo {cls}"] = counts.get(cls, 0)
    return out


def collate(jobs_dir: str):
    """-> list of records: one per (job, kernel, level) with id columns,
    seconds, iterations, and per-invocation flop/byte estimates."""
    records = []
    for root, dirs, files in os.walk(jobs_dir):
        if "Times.csv" not in files:
            continue
        t = _read_wide_csv(os.path.join(root, "Times.csv"))
        i = _read_wide_csv(os.path.join(root, "LoopNumIters.csv")) \
            if "LoopNumIters.csv" in files else None
        costs = _read_costs(os.path.join(root, "XLACosts.csv")) \
            if "XLACosts.csv" in files else {}
        if t is None:
            continue
        theader, trows = t
        kcols = _split_kernel_cols(theader)
        irows = i[1] if i else []
        hlo_dir = os.path.join(root, "hlo")
        for ridx, trow in enumerate(trows):
            irow = irows[ridx] if ridx < len(irows) else {}
            ident = {c: trow.get(c, "") for c in ID_COLS}
            for (kernel, level), col in kcols.items():
                secs = float(trow.get(col, 0) or 0)
                iters = float(irow.get(col, 0) or 0)
                if secs == 0 and iters == 0:
                    continue
                fl, by, calls = costs.get((kernel, level),
                                          (0.0, 0.0, 0.0))
                hlo = analyze_hlo(os.path.join(
                    hlo_dir, f"{kernel}{level}.hlo.txt")) \
                    if os.path.isdir(hlo_dir) else {}
                records.append({**ident, "job": os.path.basename(root),
                                "kernel": kernel, "level": level,
                                "seconds": secs, "iterations": iters,
                                "flops_total": fl * calls,
                                "bytes_total": by * calls,
                                "hlo": hlo,
                                "total": float(trow.get("Total", 0) or 0)})
    return records


def _repeat_key(rec):
    """Aggregation key: everything identifying except the repeat index
    (job names end in .rN, gen_job.job_name)."""
    job = rec["job"]
    base = job.rsplit(".r", 1)[0] if ".r" in job else job
    return (base, rec["kernel"], rec["level"],
            tuple(rec[c] for c in ID_COLS))


def aggregate(records):
    groups = defaultdict(list)
    for r in records:
        groups[_repeat_key(r)].append(r)
    out = []
    for (base, kernel, level, ident_vals), rs in sorted(groups.items()):
        secs = [r["seconds"] for r in rs]
        iters = [r["iterations"] for r in rs]
        n = len(rs)
        mean_s = sum(secs) / n
        mean_i = sum(iters) / n
        std_s = (sum((x - mean_s) ** 2 for x in secs) / n) ** 0.5
        rec = dict(zip(ID_COLS, ident_vals))
        mean_fl = sum(r.get("flops_total", 0.0) for r in rs) / n
        mean_by = sum(r.get("bytes_total", 0.0) for r in rs) / n
        peak_fl, peak_bw = device_peaks(rec.get("Instruction set", ""))
        flops_sec = (mean_fl / mean_s) if mean_s else 0.0
        bytes_sec = (mean_by / mean_s) if mean_s else 0.0
        rec.update({
            "config": base, "kernel": kernel, "level": level,
            "num repeats": n,
            "seconds mean": mean_s,
            "seconds std pct": (100.0 * std_s / mean_s) if mean_s else 0.0,
            "iterations": mean_i,
            "iters/sec": (mean_i / mean_s) if mean_s else 0.0,
            # derived metrics (reference: aggregate-output-data.py:542-724;
            # flop counts from the compiler instead of x86 asm regexes)
            "GFLOPs/sec": flops_sec / 1e9,
            "GB/sec": bytes_sec / 1e9,
            "Flops/Byte": (mean_fl / mean_by) if mean_by else 0.0,
            # measured-vs-peak utilization (the GHz / Flops/Cycle
            # analogue): % of the device's peak FLOP/s and % of peak
            # HBM bandwidth per kernel; 0 when the device is unknown
            "pct peak FLOPs": (100.0 * flops_sec / peak_fl)
            if peak_fl else 0.0,
            "pct peak HBM": (100.0 * bytes_sec / peak_bw)
            if peak_bw else 0.0,
            # dynamic per-iteration arithmetic (the reference's
            # FLOPs-per-loop-iteration analogue, aggregate-output-
            # data.py:499-540, sourced from XLA cost analysis)
            "flops/iter": (mean_fl / mean_i) if mean_i else 0.0,
            "bytes/iter": (mean_by / mean_i) if mean_i else 0.0,
            "total mean": sum(r["total"] for r in rs) / n,
        })
        # static instruction mix of the captured optimized HLO (the
        # objdump'd-loop-assembly analysis analogue)
        hlo = next((r["hlo"] for r in rs if r.get("hlo")), {})
        for col in (["hlo ops"] + [f"hlo {c}" for c in
                    list(_HLO_CLASSES) + ["other"]]):
            rec[col] = hlo.get(col, 0)
        out.append(rec)
    return out


def write_combined(out_path: str, rows) -> str:
    if not rows:
        raise SystemExit("no Times.csv found under the jobs directory")
    cols = list(rows[0].keys())
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=cols)
        w.writeheader()
        w.writerows(rows)
    return out_path


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser(
        description="collate + aggregate benchmark CSVs")
    p.add_argument("--jobs-dir", required=True)
    p.add_argument("--output", default=None,
                   help="default: <jobs-dir>/all-data-combined.csv")
    args = p.parse_args(argv)
    rows = aggregate(collate(args.jobs_dir))
    out = args.output or os.path.join(args.jobs_dir,
                                      "all-data-combined.csv")
    path = write_combined(out, rows)
    print(f"combined data written to {path} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
