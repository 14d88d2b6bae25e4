"""Pallas shift-flux kernel vs the XLA shift path (interpret mode on CPU;
compiled mode exercised on TPU by bench/tuning runs)."""
import numpy as np
import jax.numpy as jnp
import pytest

from mgcfd_tpu.mesh import generate_box_mesh
from mgcfd_tpu.ops import internal_edge_flux
from mgcfd_tpu.prep.shift import build_shift_plan, shift_flux
from mgcfd_tpu.pallas import pallas_shift_flux, pallas_shift_available

pytestmark = pytest.mark.skipif(not pallas_shift_available(),
                                reason="pallas unavailable")


def _state(n, seed=0):
    rng = np.random.default_rng(seed)
    q = np.empty((n, 5))
    q[:, 0] = 1.0 + rng.random(n)
    q[:, 1:4] = rng.standard_normal((n, 3)) * 0.3
    q[:, 4] = 2.0 + rng.random(n) + 0.5 * (q[:, 1:4] ** 2).sum(1) / q[:, 0]
    return q


def test_pallas_matches_xla_shift():
    lvl = generate_box_mesh(8, 7, 6, volume_jitter=0.2, seed=3)
    plan = build_shift_plan(lvl)
    assert plan.coverage == 1.0
    n = lvl.num_nodes
    q = _state(n)

    want = np.asarray(shift_flux(
        plan.deltas, [jnp.asarray(w) for w in plan.weights],
        (jnp.zeros(0, jnp.int32), jnp.zeros(0, jnp.int32),
         jnp.zeros((0, 3))),
        jnp.asarray(q), internal_edge_flux, n))

    pf = pallas_shift_flux(plan, n, dtype=jnp.float64, interpret=True)
    got = np.asarray(pf(jnp.asarray(q.T))).T
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)


def test_pallas_solver_end_to_end():
    from mgcfd_tpu.core.config import SolverConfig
    from mgcfd_tpu.mesh import generate_multigrid_box
    from mgcfd_tpu.solver import MGCFDSolver
    mesh = generate_multigrid_box(6, 6, 6, 2, h=(0.1, 0.1, 0.1),
                                  volume_jitter=0.2)
    a = MGCFDSolver(mesh, SolverConfig(dtype="float64"))
    a.run(cycles=3)
    b = MGCFDSolver(mesh, SolverConfig(dtype="float64",
                                       accumulate="pallas"))
    b.run(cycles=3)
    np.testing.assert_allclose(b.variables(0), a.variables(0),
                               rtol=1e-11, atol=1e-15)


def test_pallas_multi_block():
    """More nodes than one block: halo correctness across block borders."""
    lvl = generate_box_mesh(12, 8, 8, volume_jitter=0.1, seed=5)
    plan = build_shift_plan(lvl)
    n = lvl.num_nodes
    q = _state(n, seed=7)
    want = np.asarray(shift_flux(
        plan.deltas, [jnp.asarray(w) for w in plan.weights],
        (jnp.zeros(0, jnp.int32), jnp.zeros(0, jnp.int32),
         jnp.zeros((0, 3))),
        jnp.asarray(q), internal_edge_flux, n))
    # force small blocks so the grid has several steps
    from mgcfd_tpu.pallas.flux_shift import PallasShiftFlux
    pf = PallasShiftFlux(plan.deltas, plan.weights, n,
                         dtype=jnp.float64, block_lanes=128,
                         interpret=True)
    got = np.asarray(pf(jnp.asarray(q.T))).T
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)


def test_fused_stage_matches_unfused():
    """The fused RK-stage kernel (flux + boundary/wall + time_step +
    invalid count in one launch) must reproduce the separate-kernel
    pipeline exactly — including spill edges entering as a kernel input
    and the RMS history."""
    from mgcfd_tpu.core.config import SolverConfig
    from mgcfd_tpu.mesh import generate_multigrid_box
    from mgcfd_tpu.solver import MGCFDSolver
    mesh = generate_multigrid_box(10, 8, 8, 2, h=(0.1, 0.1, 0.1),
                                  volume_jitter=0.2)
    a = MGCFDSolver(mesh, SolverConfig(dtype="float64",
                                       accumulate="pallas",
                                       fuse_stage=False))
    a.run(cycles=3)
    b = MGCFDSolver(mesh, SolverConfig(dtype="float64",
                                       accumulate="pallas",
                                       fuse_stage=True))
    assert b.dmesh.levels[0].pallas_fused is not None
    b.run(cycles=3)
    np.testing.assert_allclose(b.variables(0), a.variables(0),
                               rtol=1e-12, atol=1e-16)
    np.testing.assert_allclose(b.rms_history, a.rms_history, rtol=1e-10)


def test_fused_stage_nan_guard_trips():
    """check_for_invalid_variables semantics through the fused kernel's
    in-kernel counter (validation.cpp:107-138): a poisoned state must
    raise, not silently propagate."""
    from mgcfd_tpu.core.config import SolverConfig
    from mgcfd_tpu.mesh import generate_multigrid_box
    from mgcfd_tpu.solver import MGCFDSolver
    import jax.numpy as jnp
    mesh = generate_multigrid_box(8, 6, 6, 2, h=(0.1, 0.1, 0.1))
    s = MGCFDSolver(mesh, SolverConfig(dtype="float64",
                                       accumulate="pallas"))
    v = s.state["variables"][0]
    s.state["variables"][0] = v.at[0, 3].set(-5.0)  # negative density
    with pytest.raises(FloatingPointError):
        s.run(cycles=1)


def test_indirect_rw_twin_is_side_effect_free():
    """The faithful rw twin (pallas + rolled + spill) must not perturb
    the solve: the reference discards its writes (euler3d:505), we
    token-consume them. States must match bitwise with the twin on."""
    from mgcfd_tpu.core.config import SolverConfig
    from mgcfd_tpu.mesh import generate_multigrid_box
    from mgcfd_tpu.solver import MGCFDSolver
    mesh = generate_multigrid_box(6, 6, 6, 2, h=(0.1, 0.1, 0.1),
                                  volume_jitter=0.2)
    for acc in ("pallas", "shift"):
        a = MGCFDSolver(mesh, SolverConfig(
            dtype="float64", accumulate=acc, transposed=True,
            include_indirect_rw=False))
        a.run(cycles=3)
        b = MGCFDSolver(mesh, SolverConfig(
            dtype="float64", accumulate=acc, transposed=True,
            include_indirect_rw=True))
        b.run(cycles=3)
        np.testing.assert_array_equal(a.variables(0), b.variables(0))
