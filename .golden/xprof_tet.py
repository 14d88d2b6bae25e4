"""Per-op device profile of the tet-flagship cycle (window mode).

PYTHONPATH=/root/repo:/root/.axon_site python .golden/xprof_tet.py [mode]
"""
import glob
import json
import os
import pickle
import sys
import tempfile

import jax

OUT = tempfile.mkdtemp(prefix="mgcfd_tet_")
MODE = sys.argv[1] if len(sys.argv) > 1 else "window"
K = 10


def capture():
    from mgcfd_tpu.core.config import SolverConfig
    from mgcfd_tpu.solver import MGCFDSolver
    import numpy as np
    mesh = pickle.load(open(".golden/benchtet/mesh.pkl", "rb"))
    cfg = SolverConfig(dtype="float32", accumulate=MODE,
                       include_indirect_rw=False,
                       plan_cache_dir=".golden/benchtet/plans")
    s = MGCFDSolver(mesh, cfg)
    s.config.check_invalid_every = 10 ** 9
    s.run_batched(K, K)                      # compile + warm
    with jax.profiler.trace(OUT):
        s.run_batched(K, K)
        np.asarray(s.state["variables"][0].ravel()[:8])


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
    busy = sum(r["Total self-time (us)"] for r in dev
               if r["Operation Type"] != "IDLE")
    print(f"mode={MODE}: device busy {busy/K/1e3:.3f} ms/cycle "
          f"(total incl idle {tot/1e3:.2f} ms / {K} cycles)")
    for r in dev[:30]:
        print(f"{r['Total self-time (us)']/1e3:8.3f} ms "
              f"x{int(r['#Occurrences']):<5} {r['Operation Type']:<18} "
              f"bw={r['Measured Memory BW (GBytes/Sec)']:.0f}GB/s "
              f"{str(r['Operation Name'])[:70]}")


if __name__ == "__main__":
    capture()
    report()
