"""Gather-transpose multigrid operators vs the scatter formulations."""
import numpy as np
import jax.numpy as jnp

import oracle
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.mesh import generate_multigrid_box
from mgcfd_tpu.ops.mg import (
    mg_restrict, mg_restrict_gather, build_restrict_children,
    prolong_residuals_interpolate, prolong_gather, build_prolong_tables)
from mgcfd_tpu.solver import MGCFDSolver


def _rand(n, seed):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, 5))


def test_restrict_gather_matches_scatter():
    mesh = generate_multigrid_box(6, 6, 6, 2, volume_jitter=0.2)
    fine, coarse = mesh.levels
    vf = _rand(fine.num_nodes, 0)
    vc = _rand(coarse.num_nodes, 1)
    want = np.asarray(mg_restrict(jnp.asarray(vf), jnp.asarray(vc),
                                  jnp.asarray(fine.mg_mapping),
                                  coarse.num_nodes))
    ch, mask, mapped = build_restrict_children(fine.mg_mapping,
                                               coarse.num_nodes)
    got = np.asarray(mg_restrict_gather(
        jnp.asarray(vf), jnp.asarray(vc), jnp.asarray(ch),
        jnp.asarray(mask), jnp.asarray(mapped)))
    np.testing.assert_allclose(got, want, rtol=1e-13, atol=1e-15)


def test_restrict_gather_partial_mapping():
    mapping = np.array([2, 2, 0], dtype=np.int64)
    vf = _rand(3, 2)
    vc = _rand(4, 3)
    ch, mask, mapped = build_restrict_children(mapping, 4)
    got = np.asarray(mg_restrict_gather(
        jnp.asarray(vf), jnp.asarray(vc), jnp.asarray(ch),
        jnp.asarray(mask), jnp.asarray(mapped)))
    np.testing.assert_allclose(got[2], (vf[0] + vf[1]) / 2, rtol=1e-14)
    np.testing.assert_allclose(got[0], vf[2], rtol=1e-15)
    np.testing.assert_allclose(got[1], vc[1], rtol=0)
    np.testing.assert_allclose(got[3], vc[3], rtol=0)


def test_prolong_gather_matches_scatter_and_oracle():
    mesh = generate_multigrid_box(6, 6, 6, 2, volume_jitter=0.2)
    fine, coarse = mesh.levels
    rc = _rand(coarse.num_nodes, 4) * 1e-3
    rf = _rand(fine.num_nodes, 5) * 1e-3
    vf = _rand(fine.num_nodes, 6)

    want = np.asarray(prolong_residuals_interpolate(
        jnp.asarray(rc), jnp.asarray(rf), jnp.asarray(vf),
        jnp.asarray(fine.mg_mapping), jnp.asarray(coarse.coords),
        jnp.asarray(fine.coords), jnp.asarray(fine.edge_a),
        jnp.asarray(fine.edge_b)))

    g = build_prolong_tables(fine.coords, coarse.coords, fine.mg_mapping,
                             fine.edge_a, fine.edge_b)
    g = {k: jnp.asarray(v) for k, v in g.items()}
    got = np.asarray(prolong_gather(jnp.asarray(rc), jnp.asarray(rf),
                                    jnp.asarray(vf), g))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-14)

    ow = oracle.prolong(rc, rf, vf, fine.mg_mapping, coarse.coords,
                        fine.coords, fine.edge_a, fine.edge_b)
    np.testing.assert_allclose(got, ow, rtol=1e-11, atol=1e-14)


def test_prolong_shift_matches_scatter():
    from mgcfd_tpu.ops.mg import build_prolong_shift, prolong_shift
    mesh = generate_multigrid_box(6, 6, 6, 2, volume_jitter=0.2)
    fine, coarse = mesh.levels
    rc = _rand(coarse.num_nodes, 7) * 1e-3
    rf = _rand(fine.num_nodes, 8) * 1e-3
    vf = _rand(fine.num_nodes, 9)
    want = np.asarray(prolong_residuals_interpolate(
        jnp.asarray(rc), jnp.asarray(rf), jnp.asarray(vf),
        jnp.asarray(fine.mg_mapping), jnp.asarray(coarse.coords),
        jnp.asarray(fine.coords), jnp.asarray(fine.edge_a),
        jnp.asarray(fine.edge_b)))

    for max_d in (16, 1):  # full coverage and forced-spill
        t = build_prolong_shift(fine.coords, coarse.coords,
                                fine.mg_mapping, fine.edge_a,
                                fine.edge_b, max_deltas=max_d)
        tj = {"per_delta": [tuple([d] + [jnp.asarray(x) for x in rest])
                            for d, *rest in t["per_delta"]],
              "spill": None if t["spill"] is None else
              {k: jnp.asarray(v) for k, v in t["spill"].items()},
              "cdiag": jnp.asarray(t["cdiag"]),
              "b1_deltas": [(d, jnp.asarray(B1))
                            for d, B1 in t["b1_deltas"]],
              "winv": jnp.asarray(t["winv"]),
              "coincident": jnp.asarray(t["coincident"]),
              "parent": jnp.asarray(t["parent"])}
        legacy = dict(tj)
        del legacy["cdiag"]   # the per-delta slice-add fallback path
        for tbl in (tj, legacy):
            got = np.asarray(prolong_shift(
                jnp.asarray(rc), jnp.asarray(rf), jnp.asarray(vf), tbl))
            np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-14)
            # transposed variant
            got_t = np.asarray(prolong_shift(
                jnp.asarray(rc), jnp.asarray(rf.T), jnp.asarray(vf.T),
                tbl, transposed=True)).T
            np.testing.assert_allclose(got_t, want, rtol=1e-11,
                                       atol=1e-14)


def test_transposed_multigrid_solver_matches():
    """Whole-cycle variable-major state across 3 levels."""
    mesh = generate_multigrid_box(8, 6, 6, 3, h=(0.1, 0.1, 0.1),
                                  volume_jitter=0.2)
    a = MGCFDSolver(mesh, SolverConfig(dtype="float64"))
    a.run(cycles=3)
    b = MGCFDSolver(mesh, SolverConfig(dtype="float64",
                                       accumulate="shift",
                                       transposed=True))
    assert b._tstate
    b.run(cycles=3)
    np.testing.assert_allclose(b.variables(0), a.variables(0),
                               rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(b.variables(2), a.variables(2),
                               rtol=1e-10, atol=1e-14)
    np.testing.assert_allclose(b.rms_history, a.rms_history, rtol=1e-8)


def test_solver_mg_gather_default_matches_scatter_mode():
    mesh = generate_multigrid_box(6, 6, 6, 3, h=(0.1, 0.1, 0.1),
                                  volume_jitter=0.2)
    a = MGCFDSolver(mesh, SolverConfig(dtype="float64", mg_gather=False))
    a.run(cycles=3)
    b = MGCFDSolver(mesh, SolverConfig(dtype="float64", mg_gather=True))
    b.run(cycles=3)
    np.testing.assert_allclose(b.variables(0), a.variables(0),
                               rtol=1e-11, atol=1e-15)
    for l in (1, 2):
        np.testing.assert_allclose(b.variables(l), a.variables(l),
                                   rtol=1e-11, atol=1e-15)


def test_transposed_parity_cycle_lowers_gather_free():
    """Regression guard for the round-1 profile finding: multi-axis
    strided jnp indexing lowers to an HLO gather (~7 GB/s on TPU, was
    30% of flagship device time). On a pure parity box hierarchy the
    transposed cycle must contain NO gather at all — parity restriction
    is lax.slice, prolongation is the dense upsample, the box mesh has
    no spill edges."""
    import jax

    mesh = generate_multigrid_box(8, 8, 8, 3, h=(0.1, 0.1, 0.1))
    s = MGCFDSolver(mesh, SolverConfig(dtype="float32", accumulate="shift",
                                       transposed=True,
                                       include_indirect_rw=False))
    from mgcfd_tpu.solver.solver import make_cycle_fn, state_is_transposed
    assert state_is_transposed(s.dmesh, s.config)
    fn = make_cycle_fn(s.dmesh, s.config)
    # reach the underlying jit to lower with the bound mesh arguments
    txt = jax.jit(lambda st: fn(st)).lower(s.state).as_text()
    assert "stablehlo.gather" not in txt
