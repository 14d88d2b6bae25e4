"""Per-op device-time breakdown of the sharded P=1 cycle on the real
chip (diagnosis of the 97 ms/cycle vs 3.1 ms single-chip gap)."""
import sys
import tempfile
from collections import defaultdict

from mgcfd_tpu.utils.compilecache import enable_compile_cache

enable_compile_cache(".golden/xlacache")

import jax  # noqa: E402

from mgcfd_tpu.bench import flagship_mesh                # noqa: E402
from mgcfd_tpu.core.config import SolverConfig           # noqa: E402
from mgcfd_tpu.parallel import ShardedSolver             # noqa: E402

mesh = flagship_mesh()
sh = ShardedSolver(mesh, SolverConfig(
    dtype="float32", accumulate="window", include_indirect_rw=False,
    num_partitions=1, plan_cache_dir=".golden/benchmesh/plans"))
sh.run(1)

d = tempfile.mkdtemp(prefix="sp1diag_")
with jax.profiler.trace(d):
    sh.run(2)
    jax.block_until_ready(jax.tree_util.tree_leaves(sh.state)[0])

from mgcfd_tpu.monitor.opstats import _iter_xplanes      # noqa: E402

agg = defaultdict(lambda: [0.0, 0])
for plane in _iter_xplanes(d):
    if not plane.name.startswith("/device:"):
        continue
    stat_names = {k: v.name for k, v in plane.stat_metadata.items()}
    ev_meta = dict(plane.event_metadata.items())
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = ev_meta[ev.metadata_id].name \
                if ev.metadata_id in ev_meta else ""
            if name.startswith("%"):
                name = name[1:]
            instr = name.split(" ", 1)[0]
            # group: strip trailing .N
            grp = instr.rsplit(".", 1)[0] if instr.rsplit(".", 1)[-1].isdigit() else instr
            dur = ev.duration_ps
            if not dur:
                for st in ev.stats:
                    if stat_names.get(st.metadata_id) == "device_duration_ps":
                        dur = st.uint64_value or st.int64_value
                        break
            agg[grp][0] += dur / 1e6
            agg[grp][1] += 1
rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
tot = sum(v[0] for _, v in rows)
print(f"# total device {tot / 1e3:.2f} ms over 2 cycles", file=sys.stderr)
for name, (us, n) in rows[:25]:
    print(f"{us / 2:10.1f} us/cycle  x{n:5d}  {name[:70]}")
