"""Kernel-level property tests: vectorised JAX ops vs the scalar oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from mgcfd_tpu.core.constants import far_field_state
from mgcfd_tpu.mesh import generate_box_mesh, generate_multigrid_box
from mgcfd_tpu.ops import (
    internal_edge_flux, boundary_edge_flux, wall_edge_flux,
    indirect_rw_edge_values, accumulate_flux,
    compute_step_factor, compute_step_factor_legacy, time_step,
    mg_restrict, prolong_residuals_interpolate,
    residual, calc_rms, invalid_variables_count,
)


def random_state(n, seed=0):
    """Physically sane random conserved states (positive rho, pe)."""
    rng = np.random.default_rng(seed)
    q = np.empty((n, 5))
    q[:, 0] = 1.0 + rng.random(n)            # density
    q[:, 1:4] = rng.standard_normal((n, 3))  # momentum
    ke = 0.5 * (q[:, 1:4] ** 2).sum(1) / q[:, 0]
    q[:, 4] = ke + 1.0 + rng.random(n)       # energy > kinetic
    return q


@pytest.fixture(scope="module")
def small_mesh():
    return generate_box_mesh(4, 3, 3, volume_jitter=0.3, seed=1)


def test_internal_flux_matches_oracle(small_mesh):
    lvl = small_mesh
    q = random_state(lvl.num_nodes, 2)
    got = np.asarray(internal_edge_flux(
        jnp.asarray(q[lvl.edge_a]), jnp.asarray(q[lvl.edge_b]),
        jnp.asarray(lvl.edge_w)))
    for i in range(lvl.num_internal_edges):
        want = oracle.internal_flux_edge(
            q[lvl.edge_a[i]], q[lvl.edge_b[i]], lvl.edge_w[i])
        np.testing.assert_allclose(got[i], want, rtol=1e-13, atol=1e-15)


def test_boundary_wall_flux_match_oracle(small_mesh):
    lvl = small_mesh
    q = random_state(lvl.num_nodes, 3)
    _, ff_flux = far_field_state()
    got_b = np.asarray(boundary_edge_flux(
        jnp.asarray(q[lvl.bedge_b]), jnp.asarray(lvl.bedge_w)))
    got_w = np.asarray(wall_edge_flux(
        jnp.asarray(q[lvl.wedge_b]), jnp.asarray(lvl.wedge_w),
        jnp.asarray(ff_flux)))
    for i in range(lvl.num_boundary_edges):
        want = oracle.boundary_flux_edge(q[lvl.bedge_b[i]], lvl.bedge_w[i])
        np.testing.assert_allclose(got_b[i], want, rtol=1e-13, atol=1e-15)
    for i in range(lvl.num_wall_edges):
        want = oracle.wall_flux_edge(q[lvl.wedge_b[i]], lvl.wedge_w[i],
                                     ff_flux)
        np.testing.assert_allclose(got_w[i], want, rtol=1e-13, atol=1e-15)


def test_far_field_matches_oracle():
    q, f = far_field_state()
    oq, of = oracle.far_field()
    np.testing.assert_allclose(q, oq, rtol=0)
    np.testing.assert_allclose(f, of, rtol=0)


@pytest.mark.parametrize("mode", ["segment", "scatter"])
def test_accumulation_strategies_agree(small_mesh, mode):
    """All accumulation strategies must agree with the oracle's scalar
    scatter loop (the reference's three-way race-avoidance strategies,
    SURVEY 2.6, collapse to this single property on TPU)."""
    lvl = small_mesh
    q = random_state(lvl.num_nodes, 4)
    _, ff_flux = far_field_state()
    want = oracle.compute_fluxes(lvl, q, ff_flux)

    val_i = internal_edge_flux(jnp.asarray(q[lvl.edge_a]),
                               jnp.asarray(q[lvl.edge_b]),
                               jnp.asarray(lvl.edge_w))
    val_b = boundary_edge_flux(jnp.asarray(q[lvl.bedge_b]),
                               jnp.asarray(lvl.bedge_w))
    val_w = wall_edge_flux(jnp.asarray(q[lvl.wedge_b]),
                           jnp.asarray(lvl.wedge_w), jnp.asarray(ff_flux))
    got = np.asarray(accumulate_flux(
        lvl.num_nodes, jnp.asarray(lvl.edge_a), jnp.asarray(lvl.edge_b),
        val_i, jnp.asarray(lvl.bedge_b), val_b,
        jnp.asarray(lvl.wedge_b), val_w, mode=mode))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-13)


def test_step_factors_match_oracle(small_mesh):
    lvl = small_mesh
    q = random_state(lvl.num_nodes, 5)
    np.testing.assert_allclose(
        np.asarray(compute_step_factor_legacy(jnp.asarray(q),
                                              jnp.asarray(lvl.volumes))),
        oracle.step_factor_legacy(q, lvl.volumes), rtol=1e-14)
    np.testing.assert_allclose(
        np.asarray(compute_step_factor(jnp.asarray(q),
                                       jnp.asarray(lvl.volumes))),
        oracle.step_factor(q, lvl.volumes), rtol=1e-14)


def test_time_step_divisors():
    """RK stage j uses divisor RK+1-j = 4,3,2 (cfd_loops.cpp:243)."""
    old = np.ones((3, 5))
    flux = np.full((3, 5), 2.0)
    sf = np.array([1.0, 2.0, 3.0])
    for j, div in [(0, 4.0), (1, 3.0), (2, 2.0)]:
        got = np.asarray(time_step(j, jnp.asarray(sf), jnp.asarray(flux),
                                   jnp.asarray(old)))
        want = old + (sf / div)[:, None] * flux
        np.testing.assert_allclose(got, want, rtol=1e-15)


def test_rms_divides_by_node_count():
    r = np.arange(10.0).reshape(2, 5)
    got = float(calc_rms(jnp.asarray(r)))
    want = np.sqrt((r * r).sum() / 2)
    np.testing.assert_allclose(got, want, rtol=1e-15)


def test_invalid_variables_count():
    q = random_state(4, 6)
    assert int(invalid_variables_count(jnp.asarray(q))) == 0
    q2 = q.copy(); q2[1, 0] = -1.0       # negative density
    assert int(invalid_variables_count(jnp.asarray(q2))) == 1
    q3 = q.copy(); q3[2, 3] = np.nan
    assert int(invalid_variables_count(jnp.asarray(q3))) == 1
    q4 = q.copy(); q4[0, 4] = -2.0       # negative energy
    assert int(invalid_variables_count(jnp.asarray(q4))) == 1


def test_mg_restrict_matches_oracle():
    mesh = generate_multigrid_box(4, 4, 4, 2, volume_jitter=0.1)
    fine, coarse = mesh.levels
    vf = random_state(fine.num_nodes, 7)
    vc = random_state(coarse.num_nodes, 8)
    got = np.asarray(mg_restrict(jnp.asarray(vf), jnp.asarray(vc),
                                 jnp.asarray(fine.mg_mapping),
                                 coarse.num_nodes))
    want = oracle.mg_restrict(vf, vc, fine.mg_mapping)
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-15)


def test_mg_restrict_partial_mapping():
    """Unmapped coarse nodes keep their previous values; a mapping shorter
    than the fine node count only transfers the covered prefix."""
    vf = random_state(6, 9)
    vc = random_state(4, 10)
    mapping = np.array([0, 0, 2], dtype=np.int64)  # covers fine nodes 0..2
    got = np.asarray(mg_restrict(jnp.asarray(vf), jnp.asarray(vc),
                                 jnp.asarray(mapping), 4))
    np.testing.assert_allclose(got[0], (vf[0] + vf[1]) / 2, rtol=1e-14)
    np.testing.assert_allclose(got[2], vf[2], rtol=1e-15)
    np.testing.assert_allclose(got[1], vc[1], rtol=0)  # untouched
    np.testing.assert_allclose(got[3], vc[3], rtol=0)


def test_prolong_matches_oracle():
    mesh = generate_multigrid_box(4, 4, 4, 2, volume_jitter=0.1)
    fine, coarse = mesh.levels
    rc = random_state(coarse.num_nodes, 11) * 1e-3
    rf = random_state(fine.num_nodes, 12) * 1e-3
    vf = random_state(fine.num_nodes, 13)
    got = np.asarray(prolong_residuals_interpolate(
        jnp.asarray(rc), jnp.asarray(rf), jnp.asarray(vf),
        jnp.asarray(fine.mg_mapping), jnp.asarray(coarse.coords),
        jnp.asarray(fine.coords), jnp.asarray(fine.edge_a),
        jnp.asarray(fine.edge_b)))
    want = oracle.prolong(rc, rf, vf, fine.mg_mapping, coarse.coords,
                          fine.coords, fine.edge_a, fine.edge_b)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)


def test_indirect_rw_values(small_mesh):
    lvl = small_mesh
    q = random_state(lvl.num_nodes, 14)
    va, vb = indirect_rw_edge_values(
        jnp.asarray(q[lvl.edge_a]), jnp.asarray(q[lvl.edge_b]),
        jnp.asarray(lvl.edge_w))
    va, vb = np.asarray(va), np.asarray(vb)
    i = 3
    a, b, e = lvl.edge_a[i], lvl.edge_b[i], lvl.edge_w[i]
    np.testing.assert_allclose(
        va[i], [q[b, 0] + e[0], q[b, 1] + e[2], q[b, 2], q[b, 3],
                q[b, 4] + e[1]])
    np.testing.assert_allclose(vb[i], q[a])
