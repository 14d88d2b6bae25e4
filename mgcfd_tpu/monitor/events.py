"""Configurable cost/profiler event selection — the PAPI-config analogue.

The reference selects which hardware counters to record per run through
`-p papi.conf`, a text file of event names with '#' comments
(read_papi_config, /root/reference/src/Base/io_enhanced.cpp:582-627;
event-set assembly papi_funcs.cpp:95-253, where unknown events warn and
are skipped). TPU user code has no PAPI; the counter source here is
XLA's per-kernel cost analysis, and `-p events.conf` selects which of
its estimates become rows of XLACosts.csv.
"""
from __future__ import annotations

# event name -> key into jax's compiled cost_analysis() dict
# (None = synthesized, not a cost-analysis key)
SUPPORTED_EVENTS = {
    "XLA_FLOPS_ESTIMATE": "flops",
    "XLA_BYTES_ACCESSED_ESTIMATE": "bytes accessed",
    "XLA_TRANSCENDENTALS_ESTIMATE": "transcendentals",
    "XLA_OPTIMAL_SECONDS_ESTIMATE": "optimal_seconds",
    "CALLS": None,
    # MEASURED (not estimated) rows, sourced from a real profiler trace
    # by --measure-ops (monitor/opstats.py) — the measured half of the
    # PAPI contract (papi_funcs.cpp:256-323). Zero unless that run mode
    # captured a trace.
    "XPROF_DEVICE_TIME_US": "measured_device_time_us",
    "XPROF_OCCURRENCES": "measured_occurrences",
}

DEFAULT_EVENTS = ["XLA_FLOPS_ESTIMATE", "XLA_BYTES_ACCESSED_ESTIMATE",
                  "CALLS"]


def read_event_config(path: str) -> list[str]:
    """Parse an event-selection file: one event name per line, '#'
    comments and blank lines skipped; unsupported names warn and are
    dropped (the reference's failed-PAPI-event behavior). An empty or
    unreadable file falls back to the defaults."""
    events = []
    try:
        with open(path) as f:
            for raw in f:
                name = raw.strip()
                if not name or name.startswith("#"):
                    continue
                if name not in SUPPORTED_EVENTS:
                    print(f"WARNING: event '{name}' is not supported "
                          f"(known: {', '.join(SUPPORTED_EVENTS)}); "
                          f"ignoring")
                    continue
                events.append(name)
    except OSError as e:
        print(f"WARNING: could not read event config {path}: {e}; "
              f"using defaults")
        return list(DEFAULT_EVENTS)
    return events or list(DEFAULT_EVENTS)


def selected_events(config) -> list[str]:
    if config.event_config_file:
        return read_event_config(config.event_config_file)
    return list(DEFAULT_EVENTS)


def event_rows(config, stats) -> list:
    """[(event_name, {(kernel, level): value})] for write_costs_csv,
    from the run's recorded cost details + call counts. When a
    --measure-ops trace was captured, its measured rows are always
    included (capturing the trace IS the opt-in)."""
    names = selected_events(config)
    if getattr(stats, "measured", None):
        for extra in ("XPROF_DEVICE_TIME_US", "XPROF_OCCURRENCES"):
            if extra not in names:
                names.append(extra)
    rows = []
    for name in names:
        key = SUPPORTED_EVENTS[name]
        if name == "CALLS":
            rows.append((name, dict(stats.calls)))
        else:
            rows.append((name, {kl: d.get(key, 0.0)
                                for kl, d in stats.cost_details.items()}))
    return rows
