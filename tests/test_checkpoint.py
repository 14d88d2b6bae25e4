"""Checkpoint/resume: bitwise-identical continuation."""
import numpy as np
import pytest

from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.mesh import generate_multigrid_box
from mgcfd_tpu.solver import MGCFDSolver
from mgcfd_tpu.utils.checkpoint import (save_checkpoint, load_checkpoint,
                                        latest_checkpoint)


def test_resume_bitwise_identical(tmp_path):
    mesh = generate_multigrid_box(5, 5, 5, 2, h=(0.1, 0.1, 0.1))
    ck = str(tmp_path / "ck")

    # uninterrupted 6 cycles
    a = MGCFDSolver(mesh, SolverConfig(dtype="float64"))
    a.run(cycles=6)

    # 3 cycles + checkpoint, then resume in a fresh solver for 3 more
    b1 = MGCFDSolver(mesh, SolverConfig(dtype="float64",
                                        checkpoint_dir=ck,
                                        checkpoint_every=3))
    b1.run(cycles=3)
    assert latest_checkpoint(ck) is not None

    b2 = MGCFDSolver(mesh, SolverConfig(dtype="float64",
                                        checkpoint_dir=ck, resume=True))
    assert b2.completed_cycles == 3
    b2.run(cycles=3)

    np.testing.assert_array_equal(b2.variables(0), a.variables(0))
    np.testing.assert_array_equal(b2.variables(1), a.variables(1))


def test_checkpoint_fingerprint_mismatch(tmp_path):
    mesh = generate_multigrid_box(5, 5, 5, 2)
    other = generate_multigrid_box(6, 5, 5, 2)
    s = MGCFDSolver(mesh, SolverConfig(dtype="float64"))
    s.run(cycles=1)
    path = save_checkpoint(str(tmp_path), mesh, s.state, 1)
    with pytest.raises(ValueError, match="different problem"):
        load_checkpoint(path, other, np.float64)


def test_latest_checkpoint_ordering(tmp_path):
    mesh = generate_multigrid_box(4, 4, 4, 2)
    s = MGCFDSolver(mesh, SolverConfig(dtype="float64"))
    s.run(cycles=1)
    save_checkpoint(str(tmp_path), mesh, s.state, 2)
    save_checkpoint(str(tmp_path), mesh, s.state, 10)
    assert latest_checkpoint(str(tmp_path)).endswith("ckpt-000010.npz")


def test_cli_checkpoint_resume(tmp_path, capsys):
    from mgcfd_tpu.cli.main import main as cli_main
    ck = str(tmp_path / "ck")
    rc = cli_main(["--synthetic", "5,5,5,2", "-g", "2", "--dtype",
                   "float64", "--checkpoint-dir", ck,
                   "--checkpoint-every", "1"])
    assert rc == 0
    rc = cli_main(["--synthetic", "5,5,5,2", "-g", "4", "--dtype",
                   "float64", "--checkpoint-dir", ck, "--resume"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Resumed at cycle 2; running 2 more" in out
