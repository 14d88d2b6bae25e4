"""Real-TPU Mosaic compile smoke (VERDICT r02 #8).

The CI suite forces the CPU backend, where every Pallas kernel runs in
interpret mode — Mosaic lowering regressions (the round-1 failure mode)
would otherwise surface only at the round-end bench. These tests
compile and run BOTH production kernels non-interpreted on a tiny mesh
when a TPU is reachable.

Each test runs in a SUBPROCESS with a clean jax config: the suite
conftest pins the CPU platform and enables x64, and fp64/int64 modules
are not a supported TPU configuration here (fp64 validation runs on
the CPU backend by design — BASELINE.md).

Run explicitly (serialize TPU use — one process on the chip):
    MGCFD_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -q
Under the default suite it skips.
"""
import os
import subprocess
import sys

import pytest

RUN = os.environ.get("MGCFD_TPU_SMOKE") == "1"
pytestmark = pytest.mark.skipif(
    not RUN, reason="set MGCFD_TPU_SMOKE=1 with a free TPU")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_COMMON = """
import jax
import numpy as np
devs = [d for d in jax.devices() if d.platform != "cpu"]
assert devs, "no TPU device reachable"
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.mesh import generate_multigrid_box
from mgcfd_tpu.solver import MGCFDSolver
mesh = generate_multigrid_box(12, 10, 10, 2, h=(0.1, 0.1, 0.1),
                              volume_jitter=0.2)
r = MGCFDSolver(mesh, SolverConfig(dtype="float32",
                                   accumulate="segment"))
r.run(cycles=2)
"""


def _run(code):
    env = os.environ.copy()
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, "-u", "-c", code],
                       capture_output=True, text=True, timeout=1200,
                       cwd=REPO, env=env)
    assert r.returncode == 0, (r.stdout[-2000:] + r.stderr[-4000:])


def test_mosaic_shift_fused_kernels():
    """Shift megakernel + fused RK-stage kernel compile under Mosaic
    (non-interpret) and agree with the segment path."""
    _run(_COMMON + """
s = MGCFDSolver(mesh, SolverConfig(dtype="float32", accumulate="pallas"))
assert not s.dmesh.levels[0].pallas_flux.interpret
assert s.dmesh.levels[0].pallas_fused is not None
s.run(cycles=2)
np.testing.assert_allclose(s.variables(0), r.variables(0),
                           rtol=5e-5, atol=1e-7)
print("pallas fused smoke ok")
""")


def test_mosaic_window_kernel():
    """Windowed-gather kernel (dynamic_gather path) compiles under
    Mosaic and agrees with the segment path — in both node orders:
    the default tile-interleaved internal order (linear-layout plans,
    reshape-only I/O) and the caller-order interleave layout."""
    _run(_COMMON + """
s = MGCFDSolver(mesh, SolverConfig(dtype="float32", accumulate="window"))
assert not s.dmesh.levels[0].window_flux.interpret
assert s.dmesh.levels[0].window_flux.plan.linear_layout == 1
s.run(cycles=2)
np.testing.assert_allclose(s.variables(0), r.variables(0),
                           rtol=5e-5, atol=1e-7)
print("window linear smoke ok")
s2 = MGCFDSolver(mesh, SolverConfig(dtype="float32", accumulate="window",
                                    window_tile_order=False))
assert s2.dmesh.levels[0].window_flux.plan.linear_layout == 0
s2.run(cycles=2)
np.testing.assert_allclose(s2.variables(0), r.variables(0),
                           rtol=5e-5, atol=1e-7)
print("window interleave smoke ok")
# depth-bucketed dispatch + fused window stage under Mosaic: zero
# launch cost makes the DP split at every distinct depth, so the
# multi-pallas_call alias path lowers and must agree too
import mgcfd_tpu.pallas.flux_window as FW
FW.LAUNCH_COST_WL = 0
s3 = MGCFDSolver(mesh, SolverConfig(dtype="float32", accumulate="window",
                                    fuse_window_stage=True))
wf3 = s3.dmesh.levels[0].window_flux
s3.run(cycles=2)
np.testing.assert_allclose(s3.variables(0), r.variables(0),
                           rtol=5e-5, atol=1e-7)
print("window fused+bucketed smoke ok, buckets:", wf3.buckets)
""")


def test_mosaic_sharded_window_p1():
    """The SHARDED windowed production program Mosaic-compiles and runs
    on the real chip at P=1 — the only multi-chip configuration this
    hardware allows (VERDICT r04 #1). Covers the sharded kernel
    template: pool-concatenated _window_exchange operand, wmap-as-data
    shared depth buckets, and the shard_map'd cycle. Must agree with
    the single-chip segment oracle."""
    _run(_COMMON + """
from mgcfd_tpu.parallel import ShardedSolver
sh = ShardedSolver(mesh, SolverConfig(dtype="float32",
                                      accumulate="window",
                                      num_partitions=1))
assert sh.wkernels is not None and not sh.wkernels[0].interpret
sh.run(cycles=2)
np.testing.assert_allclose(sh.variables(0), r.variables(0),
                           rtol=5e-5, atol=1e-7)
print("sharded window P=1 smoke ok")
""")
