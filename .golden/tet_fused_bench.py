import pickle, time, jax
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.solver import MGCFDSolver

mesh = pickle.load(open(".golden/benchtet/mesh.pkl", "rb"))

def run(tag, **kw):
    s = MGCFDSolver(mesh, SolverConfig(dtype="float32", accumulate="window",
                                       include_indirect_rw=False,
                                       plan_cache_dir=".golden/benchtet/plans",
                                       **kw))
    s.config.check_invalid_every = 10**9
    K = 50
    s.run_batched(K, K)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        s.run_batched(K, K)
        jax.block_until_ready(s.state["variables"][0])
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{tag}: {best*1e3:.2f} ms/cycle rms={s.rms_history[-1]:.3e}", flush=True)

run("tet window unfused", fuse_stage=False)
run("tet window FUSED", fuse_stage=True)
