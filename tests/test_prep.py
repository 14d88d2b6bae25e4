"""prep/: incidence tables and renumbering."""
import numpy as np
import pytest
import jax.numpy as jnp

import oracle
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.core.constants import far_field_state, MeshVariant
from mgcfd_tpu.core.types import MultigridMesh
from mgcfd_tpu.mesh import generate_box_mesh, generate_multigrid_box
from mgcfd_tpu.ops import (internal_edge_flux, boundary_edge_flux,
                           wall_edge_flux)
from mgcfd_tpu.prep import build_incidence, rcm_order, apply_node_order, \
    locality_stats
from mgcfd_tpu.prep.incidence import ell_accumulate
from mgcfd_tpu.solver import MGCFDSolver


def test_ell_accumulate_matches_oracle():
    lvl = generate_box_mesh(4, 4, 3, volume_jitter=0.2, seed=5)
    rng = np.random.default_rng(0)
    q = np.empty((lvl.num_nodes, 5))
    q[:, 0] = 1.0 + rng.random(lvl.num_nodes)
    q[:, 1:4] = rng.standard_normal((lvl.num_nodes, 3))
    q[:, 4] = 2.0 + rng.random(lvl.num_nodes) + \
        0.5 * (q[:, 1:4] ** 2).sum(1) / q[:, 0]
    _, ff = far_field_state()
    want = oracle.compute_fluxes(lvl, q, ff)

    t = build_incidence(lvl)
    vi = internal_edge_flux(jnp.asarray(q[lvl.edge_a]),
                            jnp.asarray(q[lvl.edge_b]),
                            jnp.asarray(lvl.edge_w))
    vb = boundary_edge_flux(jnp.asarray(q[lvl.bedge_b]),
                            jnp.asarray(lvl.bedge_w))
    vw = wall_edge_flux(jnp.asarray(q[lvl.wedge_b]),
                        jnp.asarray(lvl.wedge_w), jnp.asarray(ff))
    got = np.asarray(ell_accumulate(t, vi, vb, vw))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-13)


def test_ell_solver_end_to_end():
    mesh = generate_multigrid_box(5, 5, 5, 2, h=(0.1, 0.1, 0.1))
    a = MGCFDSolver(mesh, SolverConfig(dtype="float64"))
    a.run(cycles=3)
    b = MGCFDSolver(mesh, SolverConfig(dtype="float64", accumulate="ell"))
    b.run(cycles=3)
    np.testing.assert_allclose(b.variables(0), a.variables(0),
                               rtol=1e-11, atol=1e-15)


def test_incidence_width_and_padding():
    lvl = generate_box_mesh(3, 3, 3)
    t = build_incidence(lvl)
    # corner node: 3 internal + 3 faces = 6; interior node: 6 internal
    assert t.width == 6
    assert (t.signs[t.slots == t.stream_len] == 0).all()
    # every half-edge slot appears exactly once
    used = t.slots[t.slots < t.stream_len]
    assert used.size == t.stream_len
    assert np.unique(used).size == t.stream_len


def test_rcm_improves_locality():
    # scrambled box mesh -> RCM should restore near-band structure
    lvl = generate_box_mesh(6, 6, 6)
    rng = np.random.default_rng(3)
    perm = rng.permutation(lvl.num_nodes)
    scrambled = apply_node_order(lvl, perm)
    before = locality_stats(scrambled)["mean_span"]
    order = rcm_order(scrambled.num_nodes, scrambled.edge_a,
                      scrambled.edge_b)
    fixed = apply_node_order(scrambled, order)
    after = locality_stats(fixed)["mean_span"]
    assert after < before / 3


@pytest.mark.slow
def test_renumber_hierarchy_preserves_solution():
    """Scramble every level of a multigrid mesh, RCM the hierarchy back,
    and check the multigrid solve matches the original node-for-node."""
    from mgcfd_tpu.prep.renumber import renumber_hierarchy
    mesh = generate_multigrid_box(6, 6, 6, 2, h=(0.1, 0.1, 0.1),
                                  volume_jitter=0.2)
    ref = MGCFDSolver(mesh, SolverConfig(dtype="float64"))
    ref.run(cycles=3)

    # scramble both levels independently
    rng = np.random.default_rng(8)
    perms = [rng.permutation(l.num_nodes) for l in mesh.levels]
    invs = []
    scrambled = []
    for l, (lvl, p) in enumerate(zip(mesh.levels, perms)):
        inv = np.empty_like(p); inv[p] = np.arange(p.size)
        invs.append(inv)
        scrambled.append(apply_node_order(lvl, p))
    scrambled[0].mg_mapping = invs[1][scrambled[0].mg_mapping]
    smesh = MultigridMesh(levels=scrambled, variant=mesh.variant)

    fixed = renumber_hierarchy(smesh)
    from mgcfd_tpu.prep.shift import build_shift_plan
    # RCM restores bandedness; some spans concentrate (exact coverage is
    # mesh-dependent — the solve below is the real check)
    assert build_shift_plan(fixed.levels[0],
                            min_density=0.001).coverage > 0.0

    s = MGCFDSolver(fixed, SolverConfig(dtype="float64",
                                        accumulate="shift"))
    s.run(cycles=3)
    # map solution back to original node ids: fixed node j = scrambled
    # node order[j] = original node perms[0][order[j]]
    order0 = None
    # reconstruct by matching coordinates (deterministic, exact)
    key_fixed = fixed.levels[0].coords
    key_orig = mesh.levels[0].coords
    # build index: coord tuple -> original id
    lut = {tuple(c): i for i, c in enumerate(key_orig)}
    back = np.array([lut[tuple(c)] for c in key_fixed])
    got = np.empty_like(s.variables(0))
    got[back] = s.variables(0)
    np.testing.assert_allclose(got, ref.variables(0),
                               rtol=1e-10, atol=1e-15)


def test_apply_node_order_preserves_solution():
    lvl = generate_box_mesh(4, 4, 4, h=(0.1, 0.1, 0.1), volume_jitter=0.2)
    mesh = MultigridMesh(levels=[lvl], variant=MeshVariant.FVCORR)
    a = MGCFDSolver(mesh, SolverConfig(dtype="float64"))
    a.run(cycles=3)

    rng = np.random.default_rng(4)
    perm = rng.permutation(lvl.num_nodes)
    permuted = apply_node_order(lvl, perm)
    mesh2 = MultigridMesh(levels=[permuted], variant=MeshVariant.FVCORR)
    b = MGCFDSolver(mesh2, SolverConfig(dtype="float64"))
    b.run(cycles=3)
    # node new_i of the permuted mesh is old node perm[new_i]
    np.testing.assert_allclose(b.variables(0), a.variables(0)[perm],
                               rtol=1e-11, atol=1e-15)
