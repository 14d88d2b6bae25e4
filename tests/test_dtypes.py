"""Precision policy: fp64 (validation), fp32 (perf), bf16 (smoke)."""
import numpy as np
import pytest

from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.mesh import generate_multigrid_box
from mgcfd_tpu.solver import MGCFDSolver


@pytest.fixture(scope="module")
def mesh():
    return generate_multigrid_box(6, 6, 6, 2, h=(0.1, 0.1, 0.1),
                                  volume_jitter=0.2)


def test_fp32_tracks_fp64(mesh):
    a = MGCFDSolver(mesh, SolverConfig(dtype="float64"))
    a.run(cycles=3)
    b = MGCFDSolver(mesh, SolverConfig(dtype="float32"))
    b.run(cycles=3)
    # fp32 perf mode should track the fp64 solution to single precision
    np.testing.assert_allclose(b.variables(0), a.variables(0),
                               rtol=2e-5, atol=1e-7)


@pytest.mark.parametrize("mode", [
    "segment",
    pytest.param("shift", marks=pytest.mark.slow),
])
def test_bfloat16_runs_and_stays_finite(mesh, mode):
    s = MGCFDSolver(mesh, SolverConfig(dtype="bfloat16", accumulate=mode))
    s.run(cycles=2)
    v = s.variables(0).astype(np.float32)
    assert np.isfinite(v).all()
    assert (v[:, 0] > 0).all()  # density stays positive


def test_cli_float64_enables_x64(tmp_path, capsys):
    """--dtype float64 must produce real fp64 output (17 significant
    digits survive the dump round-trip)."""
    from mgcfd_tpu.cli.main import main as cli_main
    rc = cli_main(["--synthetic", "5,5,5,2", "-g", "1",
                   "--dtype", "float64", "--output-variables",
                   "-o", str(tmp_path) + "/"])
    assert rc == 0
    import jax
    assert jax.config.jax_enable_x64
