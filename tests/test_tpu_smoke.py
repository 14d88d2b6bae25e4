"""Real-TPU Mosaic compile smoke (VERDICT r02 #8).

The CI suite forces the CPU backend, where every Pallas kernel runs in
interpret mode — Mosaic lowering regressions (the round-1 failure mode)
would otherwise surface only at the round-end bench. This module
compiles and runs BOTH production kernels non-interpreted on a tiny
mesh when a TPU is reachable.

Run explicitly (serialize TPU use — one process on the chip):
    MGCFD_TPU_SMOKE=1 python -m pytest tests/test_tpu_smoke.py -q
Under the default suite (CPU backend forced by conftest) it skips.
"""
import os

import numpy as np
import pytest

RUN = os.environ.get("MGCFD_TPU_SMOKE") == "1"
pytestmark = pytest.mark.skipif(
    not RUN, reason="set MGCFD_TPU_SMOKE=1 with a free TPU")


@pytest.fixture(scope="module")
def tpu():
    import jax
    devs = [d for d in jax.devices() if d.platform != "cpu"]
    if not devs:
        pytest.skip("no TPU device")
    return devs[0]


def test_mosaic_shift_fused_kernels(tpu):
    """Shift megakernel + fused RK-stage kernel compile (Mosaic, not
    interpret) and agree with the CPU-oracle solver."""
    from mgcfd_tpu.core.config import SolverConfig
    from mgcfd_tpu.mesh import generate_multigrid_box
    from mgcfd_tpu.solver import MGCFDSolver
    mesh = generate_multigrid_box(12, 10, 10, 2, h=(0.1, 0.1, 0.1),
                                  volume_jitter=0.2)
    s = MGCFDSolver(mesh, SolverConfig(dtype="float32",
                                       accumulate="pallas"))
    assert not s.dmesh.levels[0].pallas_flux.interpret
    s.run(cycles=2)
    r = MGCFDSolver(mesh, SolverConfig(dtype="float32",
                                       accumulate="segment"))
    r.run(cycles=2)
    np.testing.assert_allclose(s.variables(0), r.variables(0),
                               rtol=5e-5, atol=1e-7)


def test_mosaic_window_kernel(tpu):
    """Windowed-gather kernel (dynamic_gather path) compiles under
    Mosaic and agrees with the segment path."""
    from mgcfd_tpu.core.config import SolverConfig
    from mgcfd_tpu.mesh import generate_multigrid_box
    from mgcfd_tpu.solver import MGCFDSolver
    mesh = generate_multigrid_box(12, 10, 10, 2, h=(0.1, 0.1, 0.1),
                                  volume_jitter=0.2)
    s = MGCFDSolver(mesh, SolverConfig(dtype="float32",
                                       accumulate="window"))
    assert not s.dmesh.levels[0].window_flux.interpret
    s.run(cycles=2)
    r = MGCFDSolver(mesh, SolverConfig(dtype="float32",
                                       accumulate="segment"))
    r.run(cycles=2)
    np.testing.assert_allclose(s.variables(0), r.variables(0),
                               rtol=5e-5, atol=1e-7)
