"""Measured per-kernel device time from a real profiler trace.

XLACosts.csv carries *static compiler estimates* (XLA cost analysis);
the reference's PAPI.csv carries *measured* hardware counts
(/root/reference/src/Monitoring/papi_funcs.cpp:256-323). This module
closes the measured half of that contract (VERDICT r03 #5): capture one
`jax.profiler.trace` of instrumented cycles, parse the xplane protobuf,
and attribute device self-time back to (kernel, level) through each
instrumented kernel's named jit module (`jit_k_<kernel>_l<level>`,
monitor/instrument._bind).

Works on both backends this repo runs on:
  - TPU: device planes (`/device:TPU:*`) carry per-op events whose
    `hlo_module` stat names the executable.
  - CPU (the CI backend): the `/host:CPU` plane carries the same
    per-op events with `hlo_module` stats (thunk-pool lines for big
    executables, the calling thread's line for inlined tiny ones).
Self-time uses interval nesting within each line (a parent op's time
excludes its children), so `while` wrappers and thunk-executor spans
don't double-count.
"""
from __future__ import annotations

import glob
import os
import re
import tempfile
from collections import defaultdict


def _iter_xplanes(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    for path in sorted(glob.glob(os.path.join(trace_dir, "**",
                                              "*.xplane.pb"),
                                 recursive=True)):
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        yield from xs.planes


def _line_self_times(line, stat_names, stat_meta):
    """[(module_name, self_time_ps)] for one XLine, computing SELF time
    by interval nesting: each event's duration minus its children's.
    Events without an hlo_module stat attribute to None."""
    evs = []
    for ev in line.events:
        module = None
        for st in ev.stats:
            if stat_names.get(st.metadata_id) == "hlo_module":
                ref = st.ref_value or st.uint64_value
                md = stat_meta.get(ref)
                module = md.name if md is not None else None
                break
        evs.append((ev.offset_ps, ev.offset_ps + ev.duration_ps, module))
    # sort by start asc, end desc: parents come before their children
    evs.sort(key=lambda t: (t[0], -t[1]))
    # self time = duration minus DIRECT children's durations (skipping
    # grandchildren avoids double subtraction); lines are a few
    # thousand events, the inner scan touches each event once per level
    out = []
    n = len(evs)
    for i, (s, e, m) in enumerate(evs):
        child = 0
        j = i + 1
        while j < n and evs[j][0] < e:
            if evs[j][1] <= e:
                # direct-or-deeper descendant; to avoid double
                # subtraction only count DIRECT children: skip any
                # event nested inside a previous child
                cs, ce, _ = evs[j]
                child += ce - cs
                k = j + 1
                while k < n and evs[k][0] < ce:
                    k += 1
                j = k
                continue
            j += 1
        out.append((m, max(0, (e - s) - child)))
    return out


def module_device_times(trace_dir: str) -> dict:
    """{module_name: {"time_us": float, "occurrences": int}} summed over
    every device-op line in the trace (see module docstring for which
    planes qualify per backend). Occurrences = number of distinct
    (program_id, run_id) executions observed for the module."""
    agg = defaultdict(lambda: {"time_us": 0.0, "occurrences": 0})
    runs = defaultdict(set)
    for plane in _iter_xplanes(trace_dir):
        is_dev = plane.name.startswith("/device:")
        is_cpu_xla = plane.name == "/host:CPU"
        if not (is_dev or is_cpu_xla):
            continue
        stat_names = {k: v.name for k, v in plane.stat_metadata.items()}
        stat_meta = dict(plane.stat_metadata.items())
        if is_dev:
            # TPU device planes carry an "XLA Modules" line whose events
            # ARE module executions, named "jit_<fn>(program_id)", with
            # the device time in duration_ps or a device_duration_ps
            # stat — exactly the per-kernel granularity we attribute.
            for line in plane.lines:
                if line.name != "XLA Modules":
                    continue
                ev_meta = dict(plane.event_metadata.items())
                for ev in line.events:
                    name = ev_meta[ev.metadata_id].name \
                        if ev.metadata_id in ev_meta else ""
                    module = name.split("(")[0]
                    if not module:
                        continue
                    dur = ev.duration_ps
                    if not dur:
                        for st in ev.stats:
                            if stat_names.get(st.metadata_id) == \
                                    "device_duration_ps":
                                dur = st.uint64_value or st.int64_value
                                break
                    agg[module]["time_us"] += dur / 1e6
                    agg[module]["occurrences"] += 1
            continue
        # NO line filter: XLA:CPU runs big executables on the thunk
        # pool lines but INLINES tiny ones on the calling (python)
        # thread's line; only events carrying an hlo_module stat are
        # execution events, so module attribution is the filter.
        for line in plane.lines:
            for module, self_ps in _line_self_times(line, stat_names,
                                                    stat_meta):
                if module is None:
                    continue
                agg[module]["time_us"] += self_ps / 1e6
            for ev in line.events:
                module = run_id = program_id = None
                for st in ev.stats:
                    nm = stat_names.get(st.metadata_id)
                    if nm == "hlo_module":
                        md = stat_meta.get(st.ref_value
                                           or st.uint64_value)
                        module = md.name if md is not None else None
                    elif nm == "run_id":
                        run_id = st.uint64_value or st.int64_value
                    elif nm == "program_id":
                        program_id = st.uint64_value or st.int64_value
                if module is not None:
                    runs[module].add((program_id, run_id))
    for module, rset in runs.items():
        agg[module]["occurrences"] = len(rset)
    return dict(agg)


_MODULE_RE = re.compile(r"^jit_k_(?P<kernel>.+)_l(?P<level>\d+)$")


def kernel_device_times(trace_dir: str) -> dict:
    """{(kernel, level): {"time_us", "occurrences"}} for the
    instrumented solver's named kernel modules (everything else in the
    trace — init, host work, un-named modules — is dropped)."""
    out = {}
    for module, rec in module_device_times(trace_dir).items():
        m = _MODULE_RE.match(module)
        if m:
            out[(m.group("kernel"), int(m.group("level")))] = rec
    return out


# ---------------------------------------------------------------------------
# Production (one-jit fused cycle) attribution — VERDICT r04 #4
#
# The production program is ONE jit per cycle (or per K-cycle scan), so
# module names carry no kernel structure. Attribution instead rides the
# named scopes the solver stamps into every op's HLO metadata
# (solver._kscope -> op_name="jit(run)/.../k_<kernel>_l<level>/...");
# the trace's per-op events are joined back through the compiled HLO
# text. Works on both backends:
#   - TPU: the device plane's "XLA Ops" line events are per-op
#     executions named by the full HLO instruction text.
#   - CPU (CI): per-op events named by the HLO instruction, with
#     hlo_op/hlo_module stats; self-time by interval nesting.
# ---------------------------------------------------------------------------

_SCOPE_TAG_RE = re.compile(r"k_[A-Za-z0-9_]+_l\d+")


def hlo_op_scopes(hlo_text: str) -> dict:
    """{instruction_name: "k_<kernel>_l<level>"} from the optimized HLO's
    op_name metadata (the deepest scope tag wins — scopes nest). Fusions
    inherit the representative op's metadata, which XLA draws from the
    fused computation; ops whose op_name carries no scope tag (MG-level
    state plumbing, RMS, scan bookkeeping) stay unattributed."""
    out = {}
    for m in re.finditer(
            r"%?([A-Za-z0-9_.\-]+) = [^\n]*?op_name=\"([^\"]*)\"",
            hlo_text):
        tags = _SCOPE_TAG_RE.findall(m.group(2))
        if tags:
            out[m.group(1)] = tags[-1]
    return out


def scoped_device_times(trace_dir: str, scope_map: dict) -> dict:
    """{scope_tag: {"time_us", "occurrences"}} summing per-op device time
    over every plane (see module comment for the per-backend event
    sources). Only instructions present in `scope_map` contribute, which
    also filters out other modules' ops."""
    agg = defaultdict(lambda: {"time_us": 0.0, "occurrences": 0})
    for plane in _iter_xplanes(trace_dir):
        stat_names = {k: v.name for k, v in plane.stat_metadata.items()}
        ev_meta = dict(plane.event_metadata.items())
        if plane.name.startswith("/device:"):
            for line in plane.lines:
                # "XLA Ops" only: the Async line re-reports copy spans
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = ev_meta[ev.metadata_id].name \
                        if ev.metadata_id in ev_meta else ""
                    if name.startswith("%"):
                        name = name[1:]
                    instr = name.split(" ", 1)[0]
                    scope = scope_map.get(instr)
                    if scope is None:
                        continue
                    dur = ev.duration_ps
                    if not dur:
                        for st in ev.stats:
                            if stat_names.get(st.metadata_id) == \
                                    "device_duration_ps":
                                dur = st.uint64_value or st.int64_value
                                break
                    agg[scope]["time_us"] += dur / 1e6
                    agg[scope]["occurrences"] += 1
        elif plane.name == "/host:CPU":
            for line in plane.lines:
                # self-time by nesting, attributed by instruction name
                # (only execution events carry an hlo_op stat; wrapper
                # thunk spans without one are skipped by the map lookup)
                evs = []
                for ev in line.events:
                    nm = ev_meta[ev.metadata_id].name \
                        if ev.metadata_id in ev_meta else ""
                    evs.append((ev.offset_ps,
                                ev.offset_ps + ev.duration_ps,
                                scope_map.get(nm)))
                evs.sort(key=lambda t: (t[0], -t[1]))
                n = len(evs)
                for i, (s, e, scope) in enumerate(evs):
                    if scope is None or e <= s:
                        continue
                    child = 0
                    j = i + 1
                    while j < n and evs[j][0] < e:
                        if evs[j][1] <= e:
                            cs, ce, _ = evs[j]
                            child += ce - cs
                            k = j + 1
                            while k < n and evs[k][0] < ce:
                                k += 1
                            j = k
                            continue
                        j += 1
                    agg[scope]["time_us"] += max(0, (e - s) - child) / 1e6
                    agg[scope]["occurrences"] += 1
    return dict(agg)


_TAG_RE = re.compile(r"^k_(?P<kernel>.+)_l(?P<level>\d+)$")


def production_kernel_times(trace_dir: str, hlo_text: str) -> dict:
    """{(kernel, level): {"time_us", "occurrences"}} for a production
    (fused one-jit) program: join the trace's per-op device times with
    the compiled HLO's named-scope metadata."""
    scoped = scoped_device_times(trace_dir, hlo_op_scopes(hlo_text))
    out = {}
    for tag, rec in scoped.items():
        m = _TAG_RE.match(tag)
        if m:
            out[(m.group("kernel"), int(m.group("level")))] = rec
    return out


def measure_production(solver, cycles: int = 1,
                       trace_dir: str | None = None) -> dict:
    """--measure-ops for the PRODUCTION solver (default fused monitor,
    MGCFDSolver or ShardedSolver): capture `cycles` traced cycles and
    attribute per-op device self-time to (kernel, level) through the
    compiled cycle's named scopes. In fused-stage mode the whole RK
    stage (flux + boundary/wall + time_step + invalid count — one
    kernel launch) lands on the flux row. The solver must have run at
    least one cycle already (compiles must not land inside the trace);
    advances solver state."""
    import jax

    hlo_text = solver._cycle.lower(solver.state).compile().as_text()
    d = trace_dir or tempfile.mkdtemp(prefix="mgcfd_opstats_")
    with jax.profiler.trace(d):
        solver.run(cycles)
        jax.block_until_ready(jax.tree_util.tree_leaves(solver.state)[0])
    return production_kernel_times(d, hlo_text)


def measure_instrumented(solver, cycles: int = 1,
                         trace_dir: str | None = None) -> dict:
    """Run `cycles` extra instrumented cycles under jax.profiler.trace
    and fold measured per-kernel device time into the solver's stats
    (cost_details keys `measured_device_time_us` /
    `measured_occurrences`, reported by monitor/events.py as
    XPROF_DEVICE_TIME_US / XPROF_OCCURRENCES rows of XLACosts.csv).
    The solver must have run at least one cycle already (compiles must
    not land inside the trace). Advances solver state (same contract as
    --profile-dir's extra profiled cycle)."""
    import jax

    d = trace_dir or tempfile.mkdtemp(prefix="mgcfd_opstats_")
    rec, solver._recording = solver._recording, False
    try:
        with jax.profiler.trace(d):
            # warmup=False: everything is compiled already, and run()'s
            # default untimed warmup cycle would inflate the trace
            solver.run(cycles, warmup=False)
            jax.block_until_ready(solver.state_vars[0])
    finally:
        solver._recording = rec
    measured = kernel_device_times(d)
    for kl, v in measured.items():
        det = solver.stats.cost_details.setdefault(kl, {})
        det["measured_device_time_us"] = v["time_us"]
        det["measured_occurrences"] = float(v["occurrences"])
    solver.stats.measured = measured
    return measured
