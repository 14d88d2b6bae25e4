"""CLI driver, instrumented monitoring and golden validation utilities."""
import os

import numpy as np
import pytest

from mgcfd_tpu.cli.main import main as cli_main
from mgcfd_tpu.core.config import SolverConfig
from mgcfd_tpu.core.constants import MeshVariant
from mgcfd_tpu.mesh import (generate_multigrid_box, write_grid_dat,
                            write_input_dat, write_mg_connectivity)
from mgcfd_tpu.monitor import InstrumentedSolver
from mgcfd_tpu.solver import MGCFDSolver
from mgcfd_tpu.validate.golden import (identify_differences, dump_variables,
                                       read_solution, ValidationError)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("ds")
    mesh = generate_multigrid_box(5, 5, 5, 2, h=(0.1, 0.1, 0.1))
    files, mgs = [], []
    for i, lvl in enumerate(mesh.levels):
        write_grid_dat(str(d / f"level{i}.dat"), lvl, mesh.variant)
        files.append(f"level{i}.dat")
        if lvl.mg_mapping is not None:
            write_mg_connectivity(str(d / f"mg{i}.dat"), lvl.mg_mapping)
            mgs.append(f"mg{i}.dat")
    write_input_dat(str(d / "input.dat"), mesh, files, mgs)
    return d, mesh


def test_event_selection_p_flag(dataset, tmp_path, capsys):
    """-p events.conf selects the XLACosts.csv rows (the reference's
    configurable-PAPI-counters contract, papi_funcs.cpp:95-253 /
    io_enhanced.cpp:582-627): chosen events appear, unchosen don't,
    unknown names warn and are skipped."""
    d, mesh = dataset
    conf = tmp_path / "events.conf"
    conf.write_text("# comment\nXLA_TRANSCENDENTALS_ESTIMATE\n"
                    "CALLS\nPAPI_TOT_BOGUS\n")
    rc = cli_main(["-i", "input.dat", "-d", str(d), "-g", "2",
                   "-o", str(tmp_path) + "/", "--dtype", "float64",
                   "--monitor", "instrumented", "-p", str(conf)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "PAPI_TOT_BOGUS" in out and "not supported" in out
    txt = (tmp_path / "XLACosts.csv").read_text()
    assert "XLA_TRANSCENDENTALS_ESTIMATE" in txt
    assert "CALLS" in txt
    assert "XLA_FLOPS_ESTIMATE" not in txt
    # the transcendental row is live: flux does sqrt chains
    row = [l for l in txt.splitlines()
           if "XLA_TRANSCENDENTALS_ESTIMATE" in l][0]
    ncols = txt.splitlines()[0].split(",").index("flux0")
    assert float(row.split(",")[ncols]) > 0


def test_cli_runs_and_dumps(dataset, tmp_path, capsys):
    d, mesh = dataset
    rc = cli_main(["-i", "input.dat", "-d", str(d), "-g", "3",
                   "-o", str(tmp_path) + "/", "--output-variables",
                   "--dtype", "float64"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "MG cycle 3 / 3" in out
    dumped = tmp_path / "variables.size=1x.cycles=3.level=0"
    assert dumped.exists()
    vals = read_solution(str(dumped), mesh.levels[0].num_nodes)
    assert np.isfinite(vals).all()


def test_cli_validation_pass_and_fail(dataset, tmp_path, capsys):
    d, mesh = dataset
    # produce a solution file from a run, then validate against it
    # (a dump IS a usable golden state: io.cpp:224 == io_enhanced.cpp:849)
    rc = cli_main(["-i", "input.dat", "-d", str(d), "-g", "2",
                   "-o", str(d) + "/", "--output-variables",
                   "--dtype", "float64"])
    assert rc == 0
    sol = d / "solution.variables.size=1x.cycles=2.level=0"
    os.rename(str(d / "variables.size=1x.cycles=2.level=0"), str(sol))
    rc = cli_main(["-i", "input.dat", "-d", str(d), "-g", "2", "-v",
                   "--dtype", "float64"])
    assert rc == 0
    assert "PASS: variables[] validated successfully" in \
        capsys.readouterr().out
    # corrupt the solution -> reference ergonomics (validation.cpp:
    # 188-196): print the offending value, exit EXIT_FAILURE cleanly
    vals = read_solution(str(sol), mesh.levels[0].num_nodes)
    vals[0, 0] *= 1.001
    dump_variables(str(sol), vals)
    rc = cli_main(["-i", "input.dat", "-d", str(d), "-g", "2", "-v",
                   "--dtype", "float64"])
    assert rc == 1
    assert "Validation of variables[] failed" in capsys.readouterr().out
    os.remove(str(sol))


def test_cli_config_file(dataset, tmp_path, capsys):
    d, mesh = dataset
    conf = tmp_path / "run.conf"
    conf.write_text(
        f"# comment line\ninput_file = input.dat\n"
        f"input_file_directory = {d}\ncycles = 2\ndtype = float64\n")
    rc = cli_main(["-c", str(conf)])
    assert rc == 0
    assert "MG cycle 2 / 2" in capsys.readouterr().out


def test_cli_synthetic(capsys):
    rc = cli_main(["--synthetic", "5,5,5,2", "-g", "2",
                   "--dtype", "float64"])
    assert rc == 0


def test_instrumented_matches_fused(dataset, tmp_path):
    _, mesh = dataset
    fused = MGCFDSolver(mesh, SolverConfig(dtype="float64",
                                           include_indirect_rw=False))
    fused.run(cycles=3)
    inst = InstrumentedSolver(mesh, SolverConfig(
        dtype="float64", include_indirect_rw=True))
    inst.run(cycles=3)
    np.testing.assert_allclose(inst.variables(0),
                               fused.variables(0), rtol=1e-11, atol=1e-15)
    # stats recorded for every kernel x level with the right counts
    st = inst.stats
    lvl0 = mesh.levels[0]
    assert st.iters[("flux", 0)] == 3 * 3 * lvl0.num_internal_edges
    assert st.iters[("compute_step", 0)] == 3 * lvl0.num_nodes
    assert st.iters[("restrict", 0)] == 3 * lvl0.num_nodes
    assert st.times[("flux", 0)] > 0
    p1, p2, p3 = inst.write_reports(str(tmp_path) + "/")
    header = open(p1).read().splitlines()[0]
    for col in ("Size,", "Mesh,", "MG cycles,", "flux0,", "prolong1,",
                "Total,"):
        assert col in header
    rows = open(p2).read().splitlines()
    assert len(rows) == 2
    # XLACosts.csv: flop/byte estimate rows plus the call-count row
    cost_rows = open(p3).read().splitlines()
    assert len(cost_rows) == 4
    assert "XLA_FLOPS_ESTIMATE" in cost_rows[1]
    assert "XLA_BYTES_ACCESSED_ESTIMATE" in cost_rows[2]
    assert "CALLS" in cost_rows[3]


def test_instrumented_fission_matches(dataset):
    _, mesh = dataset
    a = InstrumentedSolver(mesh, SolverConfig(dtype="float64"))
    a.run(cycles=2)
    b = InstrumentedSolver(mesh, SolverConfig(dtype="float64",
                                              flux_fission=True))
    b.run(cycles=2)
    np.testing.assert_allclose(a.variables(0), b.variables(0),
                               rtol=1e-12, atol=1e-15)
    assert b.stats.iters[("update", 0)] > 0


def test_instrumented_attributes_production_paths(dataset):
    """Times.csv must attribute the configuration users actually run:
    under --transposed the instrumented kernels are the variable-major
    shift/rolled dispatch (t_compute_fluxes) and the gather/structured
    MG transfers — bitwise-matching the fused transposed solver."""
    _, mesh = dataset
    cfg = SolverConfig(dtype="float64", accumulate="shift",
                       transposed=True, include_indirect_rw=True)
    fused = MGCFDSolver(mesh, cfg)
    fused.run(cycles=3)
    inst = InstrumentedSolver(mesh, cfg)
    assert inst.tstate
    inst.run(cycles=3)
    np.testing.assert_allclose(inst.variables(0), fused.variables(0),
                               rtol=1e-12, atol=1e-16)
    assert inst.stats.times[("flux", 0)] > 0
    assert inst.stats.times[("indirect_rw", 0)] > 0
    # cost rows exist for the MG transfers too (captured example args)
    inst.record_costs()
    assert ("restrict", 0) in inst.stats.flops
    assert ("prolong", 0) in inst.stats.flops


def test_identify_differences_tolerances():
    master = np.array([[1.0, 1e-20, -2.0, 0.5, 3.0]])
    ok = master * (1 + 5e-10)
    assert identify_differences(ok, master, MeshVariant.M6_WING) == 0
    bad = master.copy(); bad[0, 0] += 1e-7
    assert identify_differences(bad, master, MeshVariant.M6_WING,
                                raise_on_fail=False) == 1
    # fvcorr's relaxed absolute floor forgives small absolute noise
    noisy = master.copy(); noisy[0, 1] += 5e-16
    assert identify_differences(noisy, master, MeshVariant.FVCORR,
                                raise_on_fail=False) == 0
    assert identify_differences(noisy, master, MeshVariant.M6_WING,
                                raise_on_fail=False) == 1


def test_cli_validation_checks_all_levels(dataset, tmp_path, capsys):
    """-v runs the NaN/invalid scan on EVERY level before the finest-
    level solution compare (euler3d:704-710)."""
    d, mesh = dataset
    rc = cli_main(["-i", "input.dat", "-d", str(d), "-g", "2",
                   "-o", str(d) + "/", "--output-variables",
                   "--dtype", "float64"])
    assert rc == 0
    sol = d / "solution.variables.size=1x.cycles=2.level=0"
    os.rename(str(d / "variables.size=1x.cycles=2.level=0"), str(sol))
    rc = cli_main(["-i", "input.dat", "-d", str(d), "-g", "2", "-v",
                   "--dtype", "float64"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "NaN check passed" in out
    os.remove(str(sol))


def test_instrumented_window_mode(dataset):
    """Instrumented timing over the windowed-gather dispatch (interpret
    mode on CPU): production-path attribution extends to accumulate=
    'window', including the windowed MG transfers."""
    _, mesh = dataset
    cfg = SolverConfig(dtype="float64", accumulate="window",
                       include_indirect_rw=False)
    fused = MGCFDSolver(mesh, cfg)
    fused.run(cycles=2)
    inst = InstrumentedSolver(mesh, cfg)
    assert inst.tstate
    inst.run(cycles=2)
    np.testing.assert_allclose(inst.variables(0), fused.variables(0),
                               rtol=1e-12, atol=1e-16)
    assert inst.stats.times[("flux", 0)] > 0
    assert inst.stats.times[("restrict", 0)] > 0
    assert inst.stats.times[("prolong", 0)] > 0


def test_measure_ops_flag(dataset, tmp_path):
    """--measure-ops captures a real profiler trace after the run and
    lands MEASURED per-kernel device time beside the XLACosts estimates
    (XPROF_DEVICE_TIME_US / XPROF_OCCURRENCES rows) — the measured half
    of the reference's PAPI contract (papi_funcs.cpp:256-323), which
    recorded hardware counts, not compiler estimates."""
    d, mesh = dataset
    rc = cli_main(["-i", "input.dat", "-d", str(d), "-g", "2",
                   "-o", str(tmp_path) + "/", "--dtype", "float64",
                   "--monitor", "instrumented", "--measure-ops"])
    assert rc == 0
    costs = open(tmp_path / "XLACosts.csv").read().splitlines()
    header = costs[0].split(",")
    ev_col = header.index("Event")
    flux0_col = header.index("flux0")
    ts0_col = header.index("time_step0")
    rows = {r.split(",")[ev_col]: r.split(",") for r in costs[1:]}
    assert "XPROF_DEVICE_TIME_US" in rows
    assert "XPROF_OCCURRENCES" in rows
    # measured time is a real positive number for the hot kernel...
    assert float(rows["XPROF_DEVICE_TIME_US"][flux0_col]) > 0
    # ...and occurrences equal the traced cycle's actual dispatch
    # counts (1 cycle x RK stages for flux/time_step)
    from mgcfd_tpu.core.constants import RK
    assert float(rows["XPROF_OCCURRENCES"][flux0_col]) == RK
    assert float(rows["XPROF_OCCURRENCES"][ts0_col]) == RK
    # estimates still present beside the measured rows
    assert "XLA_FLOPS_ESTIMATE" in rows


def test_measure_ops_production_fused(dataset, tmp_path, capsys):
    """--measure-ops with the DEFAULT fused monitor (VERDICT r04 #4):
    per-op device time inside the one-jit production cycle is attributed
    to (kernel, level) through the solver's named scopes joined with the
    compiled HLO's op_name metadata — no --monitor instrumented needed.
    flux/restrict/prolong rows per level must come out measured."""
    d, mesh = dataset
    rc = cli_main(["-i", "input.dat", "-d", str(d), "-g", "2",
                   "-o", str(tmp_path) + "/", "--dtype", "float64",
                   "--measure-ops"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Measured device time captured" in out
    costs = open(tmp_path / "XLACosts.csv").read().splitlines()
    header = costs[0].split(",")
    ev_col = header.index("Event")
    rows = {r.split(",")[ev_col]: r.split(",") for r in costs[1:]}
    assert "XPROF_DEVICE_TIME_US" in rows
    t = rows["XPROF_DEVICE_TIME_US"]
    for col in ("flux0", "flux1", "restrict0", "prolong0",
                "compute_step0"):
        assert float(t[header.index(col)]) > 0, col


def test_production_kernel_times_direct(dataset):
    """measure_production on a bare MGCFDSolver: the (kernel, level)
    keys cover both levels and the attributed share of the traced cycle
    is the bulk of it (the un-scoped remainder is MG plumbing)."""
    from mgcfd_tpu.monitor.opstats import measure_production

    _, mesh = dataset
    s = MGCFDSolver(mesh, SolverConfig(dtype="float64"))
    s.run(cycles=1)
    m = measure_production(s, cycles=1)
    kernels = {k for k, _ in m}
    levels = {l for _, l in m}
    assert {"flux", "time_step", "compute_step", "restrict",
            "prolong"} <= kernels
    assert levels == {0, 1}
    assert all(v["time_us"] > 0 for v in m.values())


def test_compile_cache_flag(dataset, tmp_path):
    """--compile-cache DIR turns on JAX's persistent compilation cache
    (utils/compilecache.py): the run succeeds and the directory gains
    cache entries. The reference pays compile cost once at `make`; this
    is the jit-era equivalent (cold tunnel compiles cost minutes at
    capacity scale, BASELINE.md)."""
    import jax

    d, _ = dataset
    cache = tmp_path / "xlacache"
    try:
        rc = cli_main(["-i", "input.dat", "-d", str(d), "-g", "1",
                       "-o", str(tmp_path) + "/", "--dtype", "float64",
                       "--compile-cache", str(cache)])
        assert rc == 0
        assert cache.is_dir() and any(cache.iterdir())
    finally:
        from mgcfd_tpu.utils.compilecache import disable_compile_cache
        disable_compile_cache()


def test_compile_cache_config_key(dataset, tmp_path):
    """`compile_cache = DIR` in a config file (relative paths resolve
    against the config file's directory, like the reference's
    input_file_directory rule, config.cpp:196-216)."""
    import jax

    d, _ = dataset
    conf = tmp_path / "run.conf"
    conf.write_text(f"input_file = input.dat\n"
                    f"input_file_directory = {d}\n"
                    f"cycles = 1\n"
                    f"compile_cache = xcache\n")
    try:
        rc = cli_main(["-c", str(conf), "-o", str(tmp_path) + "/",
                       "--dtype", "float64"])
        assert rc == 0
        cache = tmp_path / "xcache"
        assert cache.is_dir() and any(cache.iterdir())
    finally:
        from mgcfd_tpu.utils.compilecache import disable_compile_cache
        disable_compile_cache()
