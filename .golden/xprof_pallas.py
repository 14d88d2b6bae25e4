"""Profile the flagship V-cycle on the TPU and print the top device ops.

Usage (TPU must be free; serialize):
  PYTHONPATH=/root/repo:/root/.axon_site python .golden/xprof_profile.py

Methodology that works through the axon tunnel: jax.profiler.trace
captures a vm.xplane.pb; the trace.json is useless (1M host events crowd
out the device plane) but xprof (installed) converts the xplane to
framework_op_stats — per-framework-op device self-time, bandwidth,
occurrences. This is how the 7 GB/s strided-indexing gather (30% of
device time) was found in round 1.
"""
import collections
import csv as _csv
import glob
import io
import json
import os
import sys
import tempfile

import jax

OUT = tempfile.mkdtemp(prefix="mgcfd_trace_")


def capture():
    from mgcfd_tpu.bench.flagship import flagship_mesh, FLAGSHIP_SPEC
    from mgcfd_tpu.core.config import SolverConfig
    from mgcfd_tpu.solver import MGCFDSolver
    mesh = flagship_mesh(FLAGSHIP_SPEC)
    s = MGCFDSolver(mesh, SolverConfig(dtype="float32", accumulate="pallas",
                                       
                                       include_indirect_rw=False))
    s.run_batched(5, 5)                      # compile + warm
    with jax.profiler.trace(OUT):
        s.run_batched(10, 10)                # 10 cycles in one dispatch
        jax.block_until_ready(s.state["variables"][0])


def report():
    from xprof.convert import raw_to_tool_data as r2t
    paths = sorted(glob.glob(f"{OUT}/**/*.xplane.pb", recursive=True))
    data, _ = r2t.xspace_to_tool_data(paths, "framework_op_stats", {})
    tbl = json.loads(data)[0]
    cols = [c["label"] for c in tbl["cols"]]
    rows = [dict(zip(cols, [c.get("v") for c in r["c"]]))
            for r in tbl["rows"]]
    dev = [r for r in rows if r["Host/device"] == "Device"]
    tot = sum(r["Total self-time (us)"] for r in dev)
    print(f"total device self-time: {tot/1e3:.1f} ms over the trace "
          f"(10 cycles -> {tot/1e4:.2f} ms/cycle busy)")
    for r in dev[:20]:
        print(f"{r['Total self-time (us)']/1e3:8.2f} ms "
              f"x{int(r['#Occurrences']):<4} {r['Operation Type']:<20} "
              f"bw={r['Measured Memory BW (GBytes/Sec)']:.0f}GB/s "
              f"{str(r['Operation Name'])[:70]}")


if __name__ == "__main__":
    capture()
    report()
