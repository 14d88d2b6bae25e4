"""Unstructured tetrahedral meshes: metrics correctness, solver behavior,
renumbering invariance, and golden parity with the reference binary.

The box meshes prove format/numerics parity; THESE prove the framework on
the workload shape of the reference's real datasets (tetrahedral M6/
fvcorr, README.md:69-71): arbitrary node order, full delta spectrum,
spill-heavy shift plans.
"""
import glob
import os
import subprocess

import numpy as np
import pytest

from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.core.constants import MeshVariant
from mgcfd_tpu.mesh.unstructured import (
    generate_unstructured_mesh, generate_unstructured_hierarchy,
    dual_closure_error)
from mgcfd_tpu.solver import MGCFDSolver


@pytest.fixture(scope="module")
def tet_mesh():
    return generate_unstructured_hierarchy(8, 8, 8, 2, seed=5)


def test_dual_closure_and_volumes():
    lvl = generate_unstructured_mesh(9, 8, 10, seed=7, jitter=0.45)
    # median-dual metrics close to machine precision and partition the box
    assert dual_closure_error(lvl) < 1e-12
    assert abs(lvl.volumes.sum() - 8 * 7 * 9) < 1e-9
    assert lvl.volumes.min() > 0
    assert lvl.num_boundary_edges > 0 and lvl.num_wall_edges > 0
    # genuinely unstructured: far more distinct spans than a box mesh
    d = np.abs(lvl.edge_b.astype(np.int64) - lvl.edge_a.astype(np.int64))
    assert len(np.unique(d)) > 100


def test_solver_runs_and_converges(tet_mesh):
    s = MGCFDSolver(tet_mesh, SolverConfig(dtype="float64",
                                           include_indirect_rw=False))
    s.run(3)
    assert all(np.isfinite(r) for r in s.rms_history)
    assert np.isfinite(s.variables(0)).all()


def test_renumbering_is_solution_permutation(tet_mesh):
    """RCM renumbering must not change the physics: solutions are exact
    permutations of each other (the ops are order-independent in fp64
    up to accumulation order; compare at tight tolerance)."""
    from mgcfd_tpu.prep.renumber import renumber_hierarchy, rcm_order, \
        locality_stats
    rn = renumber_hierarchy(tet_mesh)
    # locality actually improved
    raw = locality_stats(tet_mesh.levels[0])
    new = locality_stats(rn.levels[0])
    assert new["mean_span"] < raw["mean_span"] / 3
    a = MGCFDSolver(tet_mesh, SolverConfig(dtype="float64",
                                           include_indirect_rw=False))
    a.run(2)
    b = MGCFDSolver(rn, SolverConfig(dtype="float64",
                                     include_indirect_rw=False))
    b.run(2)
    order = rcm_order(tet_mesh.levels[0].num_nodes,
                      tet_mesh.levels[0].edge_a, tet_mesh.levels[0].edge_b)
    np.testing.assert_allclose(b.variables(0), a.variables(0)[order],
                               rtol=1e-12, atol=1e-15)


@pytest.mark.slow
def test_accumulate_modes_agree_on_tet(tet_mesh):
    """The general-mesh accumulate strategies must agree on a spill-heavy
    unstructured mesh (shift plans here cover only a fraction of edges).
    'window' is the windowed-gather Pallas path (interpret-mode on CPU)
    running the full transposed V-cycle."""
    from mgcfd_tpu.prep.renumber import renumber_hierarchy
    rn = renumber_hierarchy(tet_mesh)
    ref = None
    for acc in ("segment", "ell", "shift", "window"):
        s = MGCFDSolver(rn, SolverConfig(dtype="float64", accumulate=acc,
                                         include_indirect_rw=False))
        s.run(2)
        v = s.variables(0)
        if ref is None:
            ref = v
        else:
            np.testing.assert_allclose(v, ref, rtol=1e-11, atol=1e-14,
                                       err_msg=acc)


def test_window_mode_with_rw_twin_side_effect_free(tet_mesh):
    """The windowed indirect_rw twin must not change the solution."""
    from mgcfd_tpu.prep.renumber import renumber_hierarchy
    rn = renumber_hierarchy(tet_mesh)
    a = MGCFDSolver(rn, SolverConfig(dtype="float64", accumulate="window",
                                     include_indirect_rw=False))
    a.run(2)
    b = MGCFDSolver(rn, SolverConfig(dtype="float64", accumulate="window",
                                     include_indirect_rw=True))
    b.run(2)
    np.testing.assert_array_equal(a.variables(0), b.variables(0))


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BINARIES = glob.glob(os.path.join(REPO, ".golden", "refbuild", "bin",
                                  "euler3d_cpu_double_*.b"))


@pytest.mark.skipif(not BINARIES, reason="reference binary not built")
def test_golden_tet_multigrid(tmp_path):
    """End-to-end parity with the reference C++ binary on an unstructured
    tet hierarchy — the strongest evidence the unstructured path matches
    the reference on its real workload shape."""
    from mgcfd_tpu.mesh import (write_grid_dat, write_input_dat,
                                write_mg_connectivity)
    from mgcfd_tpu.validate.golden import identify_differences

    mesh = generate_unstructured_hierarchy(7, 7, 7, 2, seed=11)
    d = tmp_path
    files, mgs = [], []
    for i, lvl in enumerate(mesh.levels):
        write_grid_dat(str(d / f"level{i}.dat"), lvl, mesh.variant,
                       write_coords=True)
        files.append(f"level{i}.dat")
        if lvl.mg_mapping is not None:
            write_mg_connectivity(str(d / f"mg{i}.dat"), lvl.mg_mapping)
            mgs.append(f"mg{i}.dat")
    write_input_dat(str(d / "input.dat"), mesh, files, mgs)

    cycles = 5
    out = d / "refout"
    os.makedirs(out, exist_ok=True)
    r = subprocess.run(
        [BINARIES[0], "-i", "input.dat", "-d", str(d),
         "-o", str(out) + "/", "-g", str(cycles), "--output-variables"],
        capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    ref_vars = np.loadtxt(str(out / f"variables.size=1x.cycles={cycles}"
                                    ".level=0"))

    s = MGCFDSolver(mesh, SolverConfig(dtype="float64",
                                       include_indirect_rw=False))
    s.run(cycles)
    identify_differences(s.variables(0), ref_vars, mesh.variant)


def test_window_mode_with_forced_spill(tet_mesh, monkeypatch):
    """The flagship tet plans spill nothing, so force spill (tiny kw)
    and prove the cycle's segment spill path integrates correctly."""
    import mgcfd_tpu.prep.window as W
    from mgcfd_tpu.prep.renumber import renumber_hierarchy
    rn = renumber_hierarchy(tet_mesh)
    orig = W.build_window_plan

    def tiny_kw(lvl, kw=None, l_cap=64, **kwargs):
        # heavy spill by construction; forward node_map etc.
        return orig(lvl, kw=1, l_cap=8, **kwargs)

    monkeypatch.setattr(W, "build_window_plan", tiny_kw)
    ref = MGCFDSolver(rn, SolverConfig(dtype="float64",
                                       accumulate="segment",
                                       include_indirect_rw=False))
    ref.run(2)
    s = MGCFDSolver(rn, SolverConfig(dtype="float64", accumulate="window",
                                     include_indirect_rw=False))
    lvl0 = s.dmesh.levels[0]
    assert lvl0.shift[2][0].shape[0] > 0   # spill edges present
    s.run(2)
    np.testing.assert_allclose(s.variables(0), ref.variables(0),
                               rtol=1e-11, atol=1e-14)


def test_cli_window_mode_end_to_end(tmp_path, capsys):
    """CLI drive of the windowed path: .dat dataset -> --renumber ->
    --accumulate window -> dumps, on the CPU interpret backend."""
    from mgcfd_tpu.cli.main import main as cli_main
    from mgcfd_tpu.mesh import (write_grid_dat, write_input_dat,
                                write_mg_connectivity)
    mesh = generate_unstructured_hierarchy(7, 7, 7, 2, seed=4)
    d = tmp_path
    files, mgs = [], []
    for i, lvl in enumerate(mesh.levels):
        write_grid_dat(str(d / f"level{i}.dat"), lvl, mesh.variant,
                       write_coords=True)
        files.append(f"level{i}.dat")
        if lvl.mg_mapping is not None:
            write_mg_connectivity(str(d / f"mg{i}.dat"), lvl.mg_mapping)
            mgs.append(f"mg{i}.dat")
    write_input_dat(str(d / "input.dat"), mesh, files, mgs)
    rc = cli_main(["-i", "input.dat", "-d", str(d), "-g", "2",
                   "-o", str(d) + "/", "--dtype", "float64",
                   "--renumber", "--accumulate", "window",
                   "--plan-cache", str(d / "plans"),
                   "--output-variables"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "MG cycle 2 / 2" in out
    dumped = d / "variables.size=1x.cycles=2.level=0"
    assert dumped.exists()
    import os
    assert any(f.endswith(".npz") for f in os.listdir(d / "plans"))
