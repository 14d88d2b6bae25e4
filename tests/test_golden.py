"""Golden validation against the reference C++ binary.

These tests generate synthetic meshes in the reference's own .dat format,
run the actual MG-CFD binary on them (built once into .golden/refbuild;
see .claude/skills/verify/SKILL.md), and compare our solver's solution
elementwise at the reference's identify_differences tolerances. Skipped
when the binary is absent (e.g. on CI without a toolchain).
"""
import glob
import os
import subprocess

import numpy as np
import pytest

from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.core.constants import MeshVariant
from mgcfd_tpu.core.types import MultigridMesh
from mgcfd_tpu.mesh import (generate_box_mesh, generate_multigrid_box,
                            write_grid_dat, write_input_dat,
                            write_mg_connectivity)
from mgcfd_tpu.solver import MGCFDSolver
from mgcfd_tpu.validate.golden import identify_differences

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BINARIES = glob.glob(os.path.join(REPO, ".golden", "refbuild", "bin",
                                  "euler3d_cpu_double_*.b"))

pytestmark = pytest.mark.skipif(not BINARIES,
                                reason="reference binary not built")


def _write_dataset(d, mesh):
    files, mgs = [], []
    for i, lvl in enumerate(mesh.levels):
        write_grid_dat(str(d / f"level{i}.dat"), lvl, mesh.variant,
                       write_coords=mesh.num_levels > 1)
        files.append(f"level{i}.dat")
        if lvl.mg_mapping is not None:
            write_mg_connectivity(str(d / f"mg{i}.dat"), lvl.mg_mapping)
            mgs.append(f"mg{i}.dat")
    write_input_dat(str(d / "input.dat"), mesh, files, mgs)


def _run_reference(d, cycles):
    out = d / "refout"
    os.makedirs(out, exist_ok=True)
    r = subprocess.run(
        [BINARIES[0], "-i", "input.dat", "-d", str(d),
         "-o", str(out) + "/", "-g", str(cycles), "--output-variables"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    path = out / f"variables.size=1x.cycles={cycles}.level=0"
    return np.loadtxt(str(path))


@pytest.mark.parametrize("variant,cycles", [
    (MeshVariant.FVCORR, 5),
    (MeshVariant.M6_WING, 5),
])
def test_single_level_matches_reference_binary(tmp_path, variant, cycles):
    lvl = generate_box_mesh(6, 6, 6, h=(0.1, 0.1, 0.1),
                            volume_jitter=0.2, seed=42)
    mesh = MultigridMesh(levels=[lvl], variant=variant)
    _write_dataset(tmp_path, mesh)
    ref = _run_reference(tmp_path, cycles).reshape(lvl.num_nodes, 5)

    solver = MGCFDSolver(mesh, SolverConfig(dtype="float64"))
    solver.run(cycles=cycles)
    assert identify_differences(solver.variables(0), ref, variant) == 0


@pytest.mark.parametrize("variant", [
    MeshVariant.M6_WING,
    # the two otherwise-untested conditioned variants (VERDICT r04 #5):
    # their dampen factors (1e-7 / 2e-7) and the adjust-then-dampen
    # sequencing (euler3d_cpu_double.cpp:333-352) are exactly what this
    # end-to-end compare catches
    MeshVariant.LA_CASCADE,
    MeshVariant.ROTOR_37,
])
def test_multigrid_matches_reference_binary(tmp_path, variant):
    mesh = generate_multigrid_box(8, 8, 8, 3, h=(0.1, 0.1, 0.1),
                                  variant=variant,
                                  volume_jitter=0.2, seed=9)
    _write_dataset(tmp_path, mesh)
    ref = _run_reference(tmp_path, 4).reshape(
        mesh.levels[0].num_nodes, 5)

    solver = MGCFDSolver(mesh, SolverConfig(dtype="float64"))
    solver.run(cycles=4)
    assert identify_differences(solver.variables(0), ref,
                                mesh.variant) == 0


def test_duplicated_mesh_matches_reference_binary(tmp_path):
    """-m weak scaling: the reference duplicates in-process; we duplicate
    in the mesh layer — solutions must agree copy-for-copy."""
    from mgcfd_tpu.mesh import duplicate_mesh
    lvl = generate_box_mesh(5, 5, 5, h=(0.1, 0.1, 0.1),
                            volume_jitter=0.2, seed=1)
    mesh = MultigridMesh(levels=[lvl], variant=MeshVariant.FVCORR)
    _write_dataset(tmp_path, mesh)

    out = tmp_path / "refout"
    os.makedirs(out, exist_ok=True)
    r = subprocess.run(
        [BINARIES[0], "-i", "input.dat", "-d", str(tmp_path),
         "-o", str(out) + "/", "-g", "3", "-m", "2",
         "--output-variables"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    ref = np.loadtxt(str(out / "variables.size=2x.cycles=3.level=0"))

    dup = duplicate_mesh(mesh, 2)
    solver = MGCFDSolver(dup, SolverConfig(dtype="float64"))
    solver.run(cycles=3)
    got = solver.variables(0)
    assert got.shape == ref.shape
    assert identify_differences(got, ref.reshape(got.shape),
                                MeshVariant.FVCORR) == 0


def test_output_fluxes_matches_reference_binary(tmp_path):
    """--output-fluxes: the reference dumps the fluxes array's
    end-of-run state — all zeros, because every RK iteration ends with
    time_step/zero_fluxes clearing it (io_enhanced.cpp:791-817,
    euler3d:766-768). Compare files line-for-line."""
    from mgcfd_tpu.cli.main import main as cli_main

    lvl = generate_box_mesh(5, 5, 5, h=(0.1, 0.1, 0.1),
                            volume_jitter=0.2, seed=4)
    mesh = MultigridMesh(levels=[lvl], variant=MeshVariant.FVCORR)
    _write_dataset(tmp_path, mesh)
    out = tmp_path / "refout"
    os.makedirs(out, exist_ok=True)
    r = subprocess.run(
        [BINARIES[0], "-i", "input.dat", "-d", str(tmp_path),
         "-o", str(out) + "/", "-g", "2", "--output-fluxes"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    ref_path = out / "fluxes.size=1x.cycles=2.level=0"

    ours = tmp_path / "ours"
    os.makedirs(ours, exist_ok=True)
    rc = cli_main(["-i", "input.dat", "-d", str(tmp_path),
                   "-o", str(ours) + "/", "-g", "2", "--output-fluxes",
                   "--dtype", "float64"])
    assert rc == 0
    got_path = ours / "fluxes.size=1x.cycles=2.level=0"
    assert got_path.exists()
    with open(ref_path) as f1, open(got_path) as f2:
        ref_lines = f1.read().splitlines()
        got_lines = f2.read().splitlines()
    assert len(ref_lines) == len(got_lines) == lvl.num_nodes
    assert np.loadtxt(str(got_path)).shape == (lvl.num_nodes, 5)
    np.testing.assert_array_equal(np.loadtxt(str(ref_path)),
                                  np.loadtxt(str(got_path)))
