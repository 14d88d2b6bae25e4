"""Windowed-gather flux plan + Pallas kernel (prep/window.py,
pallas/flux_window.py): the unstructured-mesh fast path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mgcfd_tpu.core.constants import far_field_state
from mgcfd_tpu.mesh.unstructured import generate_unstructured_mesh
from mgcfd_tpu.ops import internal_edge_flux
from mgcfd_tpu.prep.renumber import rcm_order, apply_node_order
from mgcfd_tpu.prep.window import (build_window_plan,
                                   reconstruct_half_edges, WIN)
from mgcfd_tpu.pallas.flux_window import PallasWindowFlux


@pytest.fixture(scope="module")
def tet_level():
    lvl = generate_unstructured_mesh(10, 10, 10, seed=3)
    return apply_node_order(lvl, rcm_order(lvl.num_nodes, lvl.edge_a,
                                           lvl.edge_b))


@pytest.fixture(scope="module")
def plan(tet_level):
    return build_window_plan(tet_level)


def test_plan_reconstruction_exact(tet_level, plan):
    """Every non-spilled edge appears in the plan exactly twice (both
    orientations) with exact weights — the full inversion oracle."""
    rec = reconstruct_half_edges(plan)
    got = {(o, g): np.array([x, y, z]) for o, g, x, y, z in rec}
    spill = set(zip(plan.spill_a.tolist(), plan.spill_b.tolist()))
    exp = {}
    for a, b, w in zip(tet_level.edge_a.tolist(),
                       tet_level.edge_b.tolist(), tet_level.edge_w):
        if (a, b) in spill:
            continue
        exp[(a, b)] = w
        exp[(b, a)] = -w
    assert set(got) == set(exp)
    for k, v in got.items():
        np.testing.assert_allclose(v, exp[k])
    assert plan.coverage > 0.99


def test_plan_constraints(plan):
    """Packing invariants the kernel relies on: per (layer, lane-column)
    each used cell row appears once per distinct neighbor; per layer each
    owner slot used at most once (owner-aligned accumulate)."""
    for wv in range(plan.n_win):
        for layer in range(int(plan.layer_count[wv])):
            w = plan.w4[wv, layer]
            live = np.abs(w[:3]).sum(axis=0) > 0     # (8, 128) slots
            for lane in range(128):
                rows = np.nonzero(live[:, lane])[0]
                rsel = plan.row_sel[wv, layer, rows, lane]
                # slots sharing a cell must want the same neighbor: the
                # (col_idx, wsel) stored at that cell must be consistent
                seen = {}
                for r, gr in zip(rows, rsel):
                    gl = plan.col_idx[wv, layer, gr, lane]
                    sv = plan.wsel[wv, layer, gr, gl]
                    key = int(gr)
                    val = (int(gl), int(sv))
                    if key in seen:
                        assert seen[key] == val
                    seen[key] = val


def test_kernel_matches_oracle_interpret(tet_level, plan):
    """Interpret-mode (CPU, f64) kernel == segment-sum oracle exactly."""
    lvl = tet_level
    N, P = lvl.num_nodes, plan.padded_nodes
    rng = np.random.default_rng(0)
    ffq, _ = far_field_state(np.float64)
    q = np.tile(ffq[:, None], (1, P))
    q[:, :N] *= (1 + 0.05 * rng.standard_normal((5, N)))
    q = jnp.asarray(q)

    wf = PallasWindowFlux(plan, N, dtype=q.dtype, interpret=True)
    got = np.asarray(wf(q))[:, :N]

    val = internal_edge_flux(q[:, lvl.edge_a].T, q[:, lvl.edge_b].T,
                             jnp.asarray(lvl.edge_w))
    acc = jax.ops.segment_sum(
        jnp.concatenate([val, -val]),
        jnp.concatenate([jnp.asarray(lvl.edge_a),
                         jnp.asarray(lvl.edge_b)]),
        num_segments=N)
    # add back spilled edges (handled by the caller's segment path)
    if plan.spill_a.shape[0]:
        sval = internal_edge_flux(q[:, plan.spill_a].T,
                                  q[:, plan.spill_b].T,
                                  jnp.asarray(plan.spill_w))
        acc = acc - jax.ops.segment_sum(
            jnp.concatenate([sval, -sval]),
            jnp.concatenate([jnp.asarray(plan.spill_a),
                             jnp.asarray(plan.spill_b)]),
            num_segments=N)
    ref = np.asarray(acc).T
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 1e-12


def test_rw_twin_traffic_shape(tet_level, plan):
    """The indirect_rw twin runs the same plan with near-zero math and
    returns finite values of the right shape."""
    lvl = tet_level
    N, P = lvl.num_nodes, plan.padded_nodes
    ffq, _ = far_field_state(np.float64)
    q = jnp.asarray(np.tile(ffq[:, None], (1, P)))
    rw = PallasWindowFlux(plan, N, dtype=q.dtype, interpret=True,
                          rw=True)
    out = np.asarray(rw(q))
    assert out.shape == (5, P)
    assert np.isfinite(out).all()


def test_plan_cache_roundtrip(tet_level, plan, tmp_path, monkeypatch):
    """cached_plan: second build loads from npz without invoking the
    builder; arrays identical; corrupt file rebuilds silently."""
    import os
    from mgcfd_tpu.prep import window as W

    calls = []

    def build():
        calls.append(1)
        return W.build_window_plan(tet_level)

    key = (tet_level.edge_a, tet_level.edge_b, tet_level.edge_w)
    p1 = W.cached_plan(str(tmp_path), "flux", key, build)
    p2 = W.cached_plan(str(tmp_path), "flux", key, build)
    assert len(calls) == 1
    for f in ("col_idx", "row_sel", "wsel", "w4", "layer_wins",
              "layer_count", "spill_a"):
        np.testing.assert_array_equal(getattr(p1, f), getattr(p2, f))
    assert (p1.n_win, p1.kw, p1.l_max) == (p2.n_win, p2.kw, p2.l_max)
    # corrupt -> silent rebuild
    files = [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
    with open(tmp_path / files[0], "wb") as f:
        f.write(b"garbage")
    p3 = W.cached_plan(str(tmp_path), "flux", key, build)
    assert len(calls) == 2
    np.testing.assert_array_equal(p1.w4, p3.w4)


def test_prolong_plan_cache_roundtrip(tmp_path):
    from mgcfd_tpu.mesh.unstructured import generate_unstructured_hierarchy
    from mgcfd_tpu.prep.renumber import renumber_hierarchy
    from mgcfd_tpu.prep import window as W

    mesh = renumber_hierarchy(
        generate_unstructured_hierarchy(7, 7, 7, 2, seed=2))
    fine, coarse = mesh.levels
    key = (fine.edge_a, fine.edge_b, fine.coords, coarse.coords,
           fine.mg_mapping)
    d1 = W.cached_plan(str(tmp_path), "prolong", key,
                       lambda: W.build_prolong_window(fine, coarse))
    d2 = W.cached_plan(str(tmp_path), "prolong", key,
                       lambda: W.build_prolong_window(fine, coarse))
    np.testing.assert_array_equal(d1["plan"].w4, d2["plan"].w4)
    np.testing.assert_array_equal(d1["dense_local"], d2["dense_local"])
    np.testing.assert_array_equal(d1["parent"], d2["parent"])
    np.testing.assert_array_equal(d1["coincident"], d2["coincident"])


def test_composed_prolong_plan():
    """The composed cross-space plan (build_prolong_window with
    num_coarse_pad) must reproduce the full interpolation average wavg
    from the coarse residuals in one kernel: EXACTLY on coincident
    nodes (which reduce to a single weight-1.0 parent half and take
    G = rc[mapping] verbatim, so approximate equality is not enough
    there), and to summation-reordering rounding elsewhere."""
    from mgcfd_tpu.mesh.unstructured import generate_unstructured_hierarchy
    from mgcfd_tpu.prep.renumber import renumber_hierarchy
    from mgcfd_tpu.prep import window as W

    mesh = renumber_hierarchy(
        generate_unstructured_hierarchy(7, 7, 7, 2, seed=3))
    fine, coarse = mesh.levels
    fp = -(-fine.num_nodes // WIN) * WIN
    cp = -(-coarse.num_nodes // WIN) * WIN
    d = W.build_prolong_window(fine, coarse, num_fine_pad=fp,
                               num_coarse_pad=cp)
    assert "cplan" in d and "plan" not in d
    ck = PallasWindowFlux(d["cplan"], fine.num_nodes, dtype=jnp.float64,
                          interpret=True, mode="wsum")
    rng = np.random.default_rng(7)
    rc = jnp.asarray(rng.standard_normal((5, cp)))
    wavg = np.asarray(ck(rc))
    # spilled halves enter via the indexed stream, additively
    if d["cspill_fine"].shape[0]:
        np.add.at(wavg.T, d["cspill_fine"],
                  d["cspill_w"][:, None]
                  * np.asarray(rc).T[d["cspill_coarse"]])
    # oracle: the uncomposed two-stage formulation on the same mesh
    du = W.build_prolong_window(fine, coarse)
    G = np.asarray(rc)[:, fine.mg_mapping]
    n = fine.num_nodes
    wk = PallasWindowFlux(du["plan"], n, dtype=jnp.float64,
                          interpret=True, mode="wsum")
    Gp = np.zeros((5, wk.padded_in))
    Gp[:, :n] = G
    acc = (du["dense_local"][None] * G
           + np.asarray(wk(jnp.asarray(Gp)))[:, :n])
    np.add.at(acc.T, du["spill_a2"],
              du["spill_B1"][:, None] * G.T[du["spill_b2"]])
    inv = 1.0 / np.where(du["wsum"] > 0, du["wsum"], 1.0)
    want = np.where(du["coincident"][None], G, acc * inv[None])
    co = du["coincident"]
    np.testing.assert_array_equal(wavg[:, :n][:, co], want[:, co])
    np.testing.assert_allclose(wavg[:, :n], want, rtol=1e-12, atol=1e-13)
    assert not np.any(wavg[:, fine.num_nodes:])


@pytest.mark.parametrize("element_blocked", [False, True])
def test_depth_bucketed_dispatch_matches(element_blocked, monkeypatch):
    """Depth-bucketed dispatch (one pallas_call per depth bucket, later
    buckets aliasing the partial output) must equal the single full-grid
    dispatch bitwise. Interpret mode never buckets by default (the CPU
    CI keeps the fori_loop), so force a 2-way split by hand. The
    element_blocked variant covers the depth-sorted-base single-scalar-
    read x map (bs[start+w]) that the capacity-scale Mosaic abort
    forced (.golden/bigwin_bisect3.py)."""
    import mgcfd_tpu.pallas.flux_window as FW
    from mgcfd_tpu.mesh.unstructured import generate_unstructured_mesh
    from mgcfd_tpu.prep.window import build_window_plan

    if element_blocked:
        monkeypatch.setattr(FW, "WHOLE_X_LIMIT_BYTES", 0)
    lvl = generate_unstructured_mesh(16, 16, 14, seed=0)
    plan = build_window_plan(lvl)
    assert plan.n_win >= 2
    N, P = lvl.num_nodes, plan.padded_nodes
    rng = np.random.default_rng(1)
    ffq, _ = far_field_state(np.float64)
    q = np.tile(ffq[:, None], (1, P))
    q[:, :N] *= (1 + 0.05 * rng.standard_normal((5, N)))
    q = jnp.asarray(q)

    single = FW.PallasWindowFlux(plan, N, dtype=q.dtype, interpret=True,
                                 bucket=False)
    want = np.asarray(single(q))
    order, _ = FW._depth_buckets(plan.layer_count)
    d = np.asarray(plan.layer_count)[np.asarray(order)]
    h = plan.n_win // 2
    for mode in ("flux", "rw"):
        k = FW.PallasWindowFlux(plan, N, dtype=q.dtype, interpret=True,
                                mode=mode, bucket=False)
        ref = np.asarray(k(q))
        k.buckets = [(0, h, int(d[h - 1])), (h, plan.n_win - h,
                                             int(d[-1]))]
        k.wmap_dev = jnp.asarray(order, jnp.int32)
        np.testing.assert_array_equal(np.asarray(k(q)), ref)
    del want


def test_depth_buckets_dp():
    """_depth_buckets: exact DP properties — covers all windows exactly
    once, bucket l_max dominates its members, deep tails split off."""
    from mgcfd_tpu.pallas.flux_window import _depth_buckets

    lc = np.asarray([25] * 280 + [28] * 12 + [44] * 2)
    order, buckets = _depth_buckets(lc)
    assert sorted(np.asarray(order).tolist()) == list(range(len(lc)))
    total = 0
    d = lc[np.asarray(order)]
    for s, c, lm in buckets:
        assert c > 0 and lm == d[s + c - 1] == d[s:s + c].max()
        total += c
    assert total == len(lc)
    # the 44-deep tail must not tax the 280 shallow windows
    assert buckets[0][2] <= 28
    # uniform depths -> one bucket
    _, b1 = _depth_buckets(np.full(300, 25))
    assert len(b1) == 1


def test_element_blocked_path_matches(tet_level, plan, monkeypatch):
    """Force the pl.Element neighborhood-blocked X path (normally only
    taken on multi-million-node meshes) and match the whole-X result."""
    import mgcfd_tpu.pallas.flux_window as FW
    N, P = tet_level.num_nodes, plan.padded_nodes
    rng = np.random.default_rng(1)
    ffq, _ = far_field_state(np.float64)
    q = np.tile(ffq[:, None], (1, P))
    q[:, :N] *= (1 + 0.05 * rng.standard_normal((5, N)))
    q = jnp.asarray(q)
    whole = np.asarray(FW.PallasWindowFlux(plan, N, dtype=q.dtype,
                                           interpret=True)(q))
    monkeypatch.setattr(FW, "WHOLE_X_LIMIT_BYTES", 0)
    blocked = np.asarray(FW.PallasWindowFlux(plan, N, dtype=q.dtype,
                                             interpret=True)(q))
    np.testing.assert_array_equal(whole, blocked)


def test_native_packer_bit_identical():
    """The C++ first-fit packer (native/window_pack.cpp) must produce
    the EXACT plan the Python reference loop produces — same layers,
    same sources, same spills (it is a port, not a reimplementation)."""
    import numpy as np
    import pytest
    import mgcfd_tpu.prep.window as W
    import mgcfd_tpu.native.loader as L
    from mgcfd_tpu.mesh.unstructured import generate_unstructured_mesh
    if not L.native_available():
        pytest.skip("native toolchain unavailable")
    lvl = generate_unstructured_mesh(10, 9, 9, seed=5, jitter=0.45)
    p1 = W.build_window_plan(lvl, l_cap=24)  # low cap: force spilling
    orig = L.pack_halfedges_native
    L.pack_halfedges_native = lambda *a, **k: None
    try:
        p2 = W.build_window_plan(lvl, l_cap=24)
    finally:
        L.pack_halfedges_native = orig
    for f in ("base_win", "own_local", "layer_count", "layer_wins",
              "wsel", "col_idx", "row_sel", "w4", "spill_a", "spill_b",
              "spill_w"):
        np.testing.assert_array_equal(getattr(p1, f), getattr(p2, f))
    assert p1.num_half_edges == p2.num_half_edges
    assert p1.num_spilled_edges == p2.num_spilled_edges


def test_window_fused_stage_matches_unfused():
    """The fused windowed RK stage (flux + boundary/wall + time_step +
    invalid count in one launch) must reproduce the separate-kernel
    window pipeline exactly on an unstructured tet hierarchy."""
    import numpy as np
    from mgcfd_tpu.core.config import SolverConfig
    from mgcfd_tpu.mesh.unstructured import generate_unstructured_hierarchy
    from mgcfd_tpu.solver import MGCFDSolver
    mesh = generate_unstructured_hierarchy(9, 8, 8, 2, seed=3)
    a = MGCFDSolver(mesh, SolverConfig(dtype="float64",
                                       accumulate="window",
                                       fuse_stage=False))
    a.run(cycles=3)
    b = MGCFDSolver(mesh, SolverConfig(dtype="float64",
                                       accumulate="window",
                                       fuse_window_stage=True))
    assert b.dmesh.levels[0].window_fused is not None
    b.run(cycles=3)
    np.testing.assert_allclose(b.variables(0), a.variables(0),
                               rtol=1e-12, atol=1e-16)
    np.testing.assert_allclose(b.rms_history, a.rms_history, rtol=1e-10)


def test_window_fused_nan_guard_trips():
    """validation.cpp:107-138 semantics through the fused window
    kernel's in-kernel counter."""
    import numpy as np
    import pytest
    from mgcfd_tpu.core.config import SolverConfig
    from mgcfd_tpu.mesh import generate_multigrid_box
    from mgcfd_tpu.solver import MGCFDSolver
    mesh = generate_multigrid_box(8, 6, 6, 2, h=(0.1, 0.1, 0.1))
    s = MGCFDSolver(mesh, SolverConfig(dtype="float64",
                                       accumulate="window",
                                       fuse_window_stage=True))
    v = s.state["variables"][0]
    s.state["variables"][0] = v.at[0, 3].set(-5.0)
    with pytest.raises(FloatingPointError):
        s.run(cycles=1)


def test_tile_order_equivalence():
    """window_tile_order=True (internal tile-interleaved node order,
    linear-layout plans, reshape-only kernel I/O) must reproduce the
    caller-order solver bitwise at the external interface."""
    import numpy as np
    from mgcfd_tpu.core.config import SolverConfig
    from mgcfd_tpu.mesh.unstructured import generate_unstructured_hierarchy
    from mgcfd_tpu.prep.renumber import renumber_hierarchy
    from mgcfd_tpu.solver import MGCFDSolver
    mesh = renumber_hierarchy(
        generate_unstructured_hierarchy(9, 8, 8, 2, seed=3))
    a = MGCFDSolver(mesh, SolverConfig(dtype="float64",
                                       accumulate="window",
                                       window_tile_order=False))
    a.run(cycles=3)
    b = MGCFDSolver(mesh, SolverConfig(dtype="float64",
                                       accumulate="window",
                                       window_tile_order=True))
    assert b.dmesh.node_orders is not None
    assert b.dmesh.levels[0].window_flux.plan.linear_layout == 1
    b.run(cycles=3)
    np.testing.assert_allclose(b.variables(0), a.variables(0),
                               rtol=1e-12, atol=1e-16)
    np.testing.assert_allclose(b.variables(1), a.variables(1),
                               rtol=1e-12, atol=1e-16)
    np.testing.assert_allclose(b.rms_history, a.rms_history, rtol=1e-10)
    np.testing.assert_allclose(b.step_factors(0), a.step_factors(0),
                               rtol=1e-12)


@pytest.mark.slow
def test_tile_order_checkpoint_roundtrip(tmp_path):
    """Checkpoints stay external-order: save from a tile-interleaved
    solver, resume into a caller-order solver, identical trajectories."""
    import numpy as np
    from mgcfd_tpu.core.config import SolverConfig
    from mgcfd_tpu.mesh import generate_multigrid_box
    from mgcfd_tpu.solver import MGCFDSolver
    mesh = generate_multigrid_box(10, 8, 8, 2, h=(0.1, 0.1, 0.1),
                                  volume_jitter=0.2)
    ck = str(tmp_path)
    a = MGCFDSolver(mesh, SolverConfig(dtype="float64",
                                       accumulate="window",
                                       checkpoint_dir=ck,
                                       checkpoint_every=2))
    a.run(cycles=2)
    b = MGCFDSolver(mesh, SolverConfig(dtype="float64",
                                       accumulate="window",
                                       window_tile_order=False,
                                       checkpoint_dir=ck, resume=True))
    assert b.completed_cycles == 2
    a.run(cycles=2)
    b.run(cycles=2)
    np.testing.assert_allclose(b.variables(0), a.variables(0),
                               rtol=1e-12, atol=1e-16)


def test_linear_layout_element_blocked_matches_oracle():
    """linear-layout plan (tile-interleaved ids) in BOTH whole-X and
    pl.Element-blocked modes == segment-sum oracle (the capacity-point
    configuration)."""
    import mgcfd_tpu.pallas.flux_window as FW
    from mgcfd_tpu.prep.renumber import (rcm_order, apply_node_order,
                                         tile_interleave_order)
    lvl = generate_unstructured_mesh(10, 10, 10, seed=7)
    lvl = apply_node_order(lvl, rcm_order(lvl.num_nodes, lvl.edge_a,
                                          lvl.edge_b))
    lvl = apply_node_order(lvl, tile_interleave_order(lvl.num_nodes))
    plan = build_window_plan(lvl, node_map="linear")
    assert plan.linear_layout == 1
    N, P = lvl.num_nodes, plan.padded_nodes
    rng = np.random.default_rng(2)
    ffq, _ = far_field_state(np.float64)
    q = np.tile(ffq[:, None], (1, P))
    q[:, :N] *= (1 + 0.05 * rng.standard_normal((5, N)))
    q = jnp.asarray(q)

    val = internal_edge_flux(q[:, lvl.edge_a].T, q[:, lvl.edge_b].T,
                             jnp.asarray(lvl.edge_w))
    acc = jax.ops.segment_sum(
        jnp.concatenate([val, -val]),
        jnp.concatenate([jnp.asarray(lvl.edge_a),
                         jnp.asarray(lvl.edge_b)]),
        num_segments=N)
    if plan.spill_a.shape[0]:
        sval = internal_edge_flux(q[:, plan.spill_a].T,
                                  q[:, plan.spill_b].T,
                                  jnp.asarray(plan.spill_w))
        acc = acc - jax.ops.segment_sum(
            jnp.concatenate([sval, -sval]),
            jnp.concatenate([jnp.asarray(plan.spill_a),
                             jnp.asarray(plan.spill_b)]),
            num_segments=N)
    ref = np.asarray(acc).T

    got = np.asarray(FW.PallasWindowFlux(plan, N, dtype=q.dtype,
                                         interpret=True)(q))[:, :N]
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 1e-12
    old = FW.WHOLE_X_LIMIT_BYTES
    FW.WHOLE_X_LIMIT_BYTES = 0
    try:
        blocked = np.asarray(FW.PallasWindowFlux(
            plan, N, dtype=q.dtype, interpret=True)(q))[:, :N]
    finally:
        FW.WHOLE_X_LIMIT_BYTES = old
    np.testing.assert_array_equal(got, blocked)
