"""Capacity tet (8.23M edges) cycle probe: baseline timing, optional
whole-X override, optional xprof attribution.

PYTHONPATH=/root/repo:/root/.axon_site python .golden/bigtet_probe.py \
    [--whole-x-mb N] [--profile] [--k K]
"""
import argparse
import glob
import json
import os
import pickle
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--whole-x-mb", type=float, default=None)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    from mgcfd_tpu.core.config import SolverConfig
    from mgcfd_tpu.solver import MGCFDSolver
    from mgcfd_tpu.pallas import flux_window

    if args.whole_x_mb is not None:
        flux_window.WHOLE_X_LIMIT_BYTES = int(args.whole_x_mb * 2 ** 20)
        print(f"WHOLE_X_LIMIT_BYTES = {args.whole_x_mb} MB", flush=True)

    D = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bigtet")
    mesh = pickle.load(open(os.path.join(D, "mesh.pkl"), "rb"))
    K = args.k
    cfg = SolverConfig(dtype="float32", accumulate="window",
                       include_indirect_rw=False,
                       plan_cache_dir=os.path.join(D, "plans"))
    t0 = time.time()
    s = MGCFDSolver(mesh, cfg)
    s.config.check_invalid_every = 10 ** 9
    print(f"solver built {time.time()-t0:.0f}s", flush=True)
    lvl0 = s.dmesh.levels[0]
    wf = lvl0.window_flux
    if wf is not None:
        whole = (wf.plan.src_windows * 8 * 4096
                 <= flux_window.WHOLE_X_LIMIT_BYTES)
        print(f"L0: n_win={wf.plan.n_win} src_windows={wf.plan.src_windows}"
              f" kw={wf.plan.kw} l_max={wf.plan.l_max}"
              f" X={wf.plan.src_windows*8*4096/2**20:.1f}MB"
              f" whole_x={whole} buckets={wf.buckets}"
              f" fused={lvl0.window_fused is not None}", flush=True)
    t0 = time.time()
    s.run_batched(K, K)
    np.asarray(s.state["variables"][0].ravel()[:8])
    print(f"warm (compile) {time.time()-t0:.0f}s", flush=True)
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        s.run_batched(K, K)
        np.asarray(s.state["variables"][0].ravel()[:8])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"window: {best*1e3:.2f} ms/cycle (K={K})", flush=True)
    print("rms finite:", bool(np.isfinite(np.asarray(
        s.rms_history)).all()) if len(s.rms_history) else "n/a", flush=True)

    if args.profile:
        out = tempfile.mkdtemp(prefix="mgcfd_bigtet_")
        with jax.profiler.trace(out):
            s.run_batched(K, K)
            np.asarray(s.state["variables"][0].ravel()[:8])
        report(out, K)


def report(out, K):
    from xprof.convert import raw_to_tool_data as r2t
    paths = sorted(glob.glob(f"{out}/**/*.xplane.pb", recursive=True))
    data, _ = r2t.xspace_to_tool_data(paths, "framework_op_stats", {})
    tbl = json.loads(data)[0]
    cols = [c["label"] for c in tbl["cols"]]
    rows = [dict(zip(cols, [c.get("v") for c in r["c"]]))
            for r in tbl["rows"]]
    dev = [r for r in rows if r["Host/device"] == "Device"]
    tot = sum(r["Total self-time (us)"] for r in dev)
    busy = sum(r["Total self-time (us)"] for r in dev
               if r["Operation Type"] != "IDLE")
    print(f"device busy {busy/K/1e3:.3f} ms/cycle "
          f"(total incl idle {tot/1e3:.2f} ms / {K} cycles)")
    for r in dev[:36]:
        print(f"{r['Total self-time (us)']/1e3:8.3f} ms "
              f"x{int(r['#Occurrences']):<5} {r['Operation Type']:<18} "
              f"bw={r['Measured Memory BW (GBytes/Sec)']:.0f}GB/s "
              f"{str(r['Operation Name'])[:70]}")


if __name__ == "__main__":
    main()
