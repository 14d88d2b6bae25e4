import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from mgcfd_tpu.bench.flagship import FlagshipSpec, flagship_mesh
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.parallel import ShardedSolver, partition_mesh
from mgcfd_tpu.solver import MGCFDSolver
from mgcfd_tpu.mesh.build import apply_ewt_conditioning
import copy

# flagship-shaped (scaled) problem for the study
mesh = flagship_mesh(FlagshipSpec(nx=34, ny=32, nz=35, num_levels=3))
lvl0 = mesh.levels[0]
print(f"mesh: {lvl0.num_nodes} nodes, {lvl0.num_internal_edges} edges")

ref = MGCFDSolver(mesh, SolverConfig(dtype="float64"))
ref.run(cycles=2)
print(f"{'P':>3} {'B':>8} {'Smax':>7} {'sep%':>6} {'halo KB/eval':>13} "
      f"{'cross-edge%':>12} {'max|err|':>10}")
for P in (1, 2, 4, 8):
    cm = copy.deepcopy(mesh)
    apply_ewt_conditioning(cm.levels, cm.variant)
    sm = partition_mesh(cm, P)
    sd = sm.level0
    total_sep = int(sd.sep_mask.sum())
    # cross edges = stream entries referencing the pool
    pool_refs = (sd.edge_b >= sd.block).sum() + (sd.edge_a >= sd.block).sum()
    real_edges = lvl0.num_internal_edges
    halo_kb = (P * sd.smax * 5 * 4 * 2) / 1024.0  # all_gather + psum_scatter, fp32

    s = ShardedSolver(mesh, SolverConfig(dtype="float64", num_partitions=P))
    s.run(cycles=2)
    err = np.abs(s.variables(0) - ref.variables(0)).max()
    print(f"{P:>3} {sd.block:>8} {sd.smax:>7} "
          f"{100.0*total_sep/lvl0.num_nodes:>5.1f}% {halo_kb:>12.1f} "
          f"{100.0*pool_refs/real_edges:>11.2f}% {err:>10.2e}")
