"""End-to-end solver tests: the jitted V-cycle vs the scalar oracle."""
import copy

import numpy as np
import pytest

import oracle
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.core.constants import MeshVariant
from mgcfd_tpu.mesh import generate_box_mesh, generate_multigrid_box
from mgcfd_tpu.mesh.build import apply_ewt_conditioning
from mgcfd_tpu.core.types import MultigridMesh
from mgcfd_tpu.solver import MGCFDSolver


def conditioned_copy(mesh):
    m = copy.deepcopy(mesh)
    apply_ewt_conditioning(m.levels, m.variant)
    return m


def test_single_level_matches_oracle():
    lvl = generate_box_mesh(4, 4, 4, volume_jitter=0.2, seed=3,
                            h=(0.1, 0.1, 0.1))
    mesh = MultigridMesh(levels=[lvl], variant=MeshVariant.FVCORR)
    cfg = SolverConfig(dtype="float64", include_indirect_rw=True)
    solver = MGCFDSolver(mesh, cfg)
    solver.run(cycles=5)

    want, rms = oracle.run_cycles(conditioned_copy(mesh), 5)
    np.testing.assert_allclose(solver.variables(0), want[0],
                               rtol=1e-10, atol=1e-16)
    np.testing.assert_allclose(solver.rms_history, rms, rtol=1e-8)


@pytest.mark.parametrize("variant", [MeshVariant.M6_WING,
                                     MeshVariant.FVCORR])
def test_multigrid_matches_oracle(variant):
    mesh = generate_multigrid_box(6, 6, 6, 3, h=(0.1, 0.1, 0.1),
                                  variant=variant, volume_jitter=0.2)
    cfg = SolverConfig(dtype="float64")
    solver = MGCFDSolver(mesh, cfg)
    solver.run(cycles=3)

    want, rms = oracle.run_cycles(conditioned_copy(mesh), 3)
    for l in range(3):
        np.testing.assert_allclose(solver.variables(l), want[l],
                                   rtol=1e-9, atol=1e-16)
    np.testing.assert_allclose(solver.rms_history, rms, rtol=1e-7)


def test_accumulation_modes_agree_end_to_end():
    mesh = generate_multigrid_box(4, 4, 4, 2, h=(0.1, 0.1, 0.1))
    results = []
    for mode in ("segment", "scatter"):
        cfg = SolverConfig(dtype="float64", accumulate=mode)
        s = MGCFDSolver(mesh, cfg)
        s.run(cycles=3)
        results.append(s.variables(0))
    np.testing.assert_allclose(results[0], results[1],
                               rtol=1e-11, atol=1e-15)


def test_rms_decreases_then_solver_is_stable():
    """Physics sanity signal: the per-cycle RMS must stay finite and not
    explode over a longer run (reference eyeballs this; we assert it)."""
    mesh = generate_multigrid_box(6, 6, 6, 2, h=(0.1, 0.1, 0.1))
    solver = MGCFDSolver(mesh, SolverConfig(dtype="float64"))
    solver.run(cycles=10)
    assert all(np.isfinite(solver.rms_history))
    assert solver.rms_history[-1] < 10 * max(solver.rms_history[:3])


def test_run_batched_matches_unbatched():
    """K-cycles-per-dispatch (lax.scan) must be bitwise identical to
    single-cycle dispatches, including a non-divisible tail."""
    mesh = generate_multigrid_box(5, 5, 5, 2, h=(0.1, 0.1, 0.1))
    a = MGCFDSolver(mesh, SolverConfig(dtype="float64"))
    a.run(cycles=7)
    b = MGCFDSolver(mesh, SolverConfig(dtype="float64"))
    b.run_batched(7, cycles_per_dispatch=3)
    np.testing.assert_array_equal(b.variables(0), a.variables(0))
    np.testing.assert_allclose(b.rms_history, a.rms_history, rtol=1e-12)
    assert b.completed_cycles == 7


def test_nan_guard_raises():
    lvl = generate_box_mesh(3, 3, 3)
    # poison the mesh: an enormous edge weight drives the state invalid
    lvl.edge_w = lvl.edge_w * 1e30
    mesh = MultigridMesh(levels=[lvl], variant=MeshVariant.FVCORR)
    solver = MGCFDSolver(mesh, SolverConfig(dtype="float64"))
    with pytest.raises(FloatingPointError):
        solver.run(cycles=3)


def test_flux_cripple_does_not_change_solution():
    """The crippled twin runs before the real kernel and its writes are
    reverted (euler3d:399-418): solution must be identical with it on."""
    mesh = generate_multigrid_box(4, 4, 4, 2, h=(0.1, 0.1, 0.1))
    a = MGCFDSolver(mesh, SolverConfig(dtype="float64"))
    a.run(cycles=2)
    b = MGCFDSolver(mesh, SolverConfig(dtype="float64", flux_cripple=True))
    b.run(cycles=2)
    np.testing.assert_allclose(a.variables(0), b.variables(0), rtol=0)


def test_precompute_edge_weights_matches():
    mesh = generate_multigrid_box(4, 4, 4, 2, h=(0.1, 0.1, 0.1))
    a = MGCFDSolver(mesh, SolverConfig(dtype="float64"))
    a.run(cycles=2)
    b = MGCFDSolver(mesh, SolverConfig(
        dtype="float64", flux_precompute_edge_weights=True))
    b.run(cycles=2)
    np.testing.assert_allclose(a.variables(0), b.variables(0),
                               rtol=1e-12, atol=1e-16)


@pytest.mark.slow
def test_flux_cripple_transposed_side_effect_free():
    """--flux-cripple under the transposed/window layouts runs the
    crippled twin (token-consumed) without changing the solution —
    previously the flag was silently ignored on those paths."""
    import numpy as np
    from mgcfd_tpu.mesh import generate_multigrid_box
    mesh = generate_multigrid_box(6, 6, 6, 2, h=(0.1, 0.1, 0.1))
    for acc, extra in (("shift", {"transposed": True}), ("window", {})):
        a = MGCFDSolver(mesh, SolverConfig(dtype="float64", accumulate=acc,
                                           include_indirect_rw=False,
                                           **extra))
        a.run(2)
        b = MGCFDSolver(mesh, SolverConfig(dtype="float64", accumulate=acc,
                                           include_indirect_rw=False,
                                           flux_cripple=True, **extra))
        b.run(2)
        np.testing.assert_array_equal(a.variables(0), b.variables(0))


def test_accumulate_auto_resolution():
    """accumulate='auto' (the default) resolves at solver build: segment
    on the CPU backend / float64 / flux_fission; explicit choices are
    never overridden; 'auto' never reaches the kernels."""
    from mgcfd_tpu.mesh import generate_multigrid_box
    from mgcfd_tpu.solver.solver import resolve_accumulate
    mesh = generate_multigrid_box(6, 6, 6, 2, h=(0.1, 0.1, 0.1))

    cfg = SolverConfig(dtype="float64")
    assert cfg.accumulate == "auto"
    s = MGCFDSolver(mesh, cfg)
    assert s.config.accumulate == "segment"   # CPU backend (conftest)
    s.run(1)

    cfg = SolverConfig(dtype="float32", flux_fission=True)
    resolve_accumulate(mesh, cfg)
    assert cfg.accumulate == "segment"        # the fission-honoring mode

    cfg = SolverConfig(dtype="float64", accumulate="window")
    resolve_accumulate(mesh, cfg)
    assert cfg.accumulate == "window"         # explicit wins
