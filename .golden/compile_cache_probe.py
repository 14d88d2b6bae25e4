"""Does JAX's persistent compilation cache work through the axon
backend? Cold capacity-scale compiles cost ~1988 s through the tunnel
(BASELINE.md) — if the cache hits, every process after the first pays
seconds. Run twice (alone on the chip):
  PYTHONPATH=/root/repo:/root/.axon_site python .golden/compile_cache_probe.py
First run prints compile_s ~tens of seconds, second should be ~0-2 s.
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.golden/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np

from mgcfd_tpu.pallas.flux_window import PallasWindowFlux
from mgcfd_tpu.prep.window import build_window_plan


class _Lvl:
    pass


rng = np.random.default_rng(0)
N = 4096
E = 20000
a = rng.integers(0, N, E).astype(np.int32)
b = (a + 1 + rng.integers(0, N - 2, E).astype(np.int32)) % N
lvl = _Lvl()
lvl.num_nodes = N
lvl.edge_a = a
lvl.edge_b = b
lvl.edge_w = rng.normal(0, 1e-3, (E, 3))

plan = build_window_plan(lvl)
wf = PallasWindowFlux(plan, N, dtype=jnp.float32)
q = jnp.asarray(rng.normal(1, 0.01, (5, wf.padded_in)) + 2, jnp.float32)
f = jax.jit(lambda q: wf(q))
t0 = time.perf_counter()
out = jax.block_until_ready(f(q))
print(f"compile+first-run: {time.perf_counter() - t0:.2f} s")
t0 = time.perf_counter()
jax.block_until_ready(f(q))
print(f"steady: {time.perf_counter() - t0:.4f} s")
