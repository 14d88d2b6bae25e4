"""Persistent XLA compilation cache.

The reference binary pays its compile cost at build time (`make`); this
framework pays it at first jit, and through the axon tunnel a cold
capacity-scale compile costs minutes (BASELINE.md: 386 s flagship-tet /
1988 s capacity-tet first compile). JAX's persistent compilation cache
turns every compile after the first into a disk read keyed by the HLO
fingerprint + platform + compiler flags, so repeat runs of the same
configuration (sweeps, resumed jobs, CI) start in seconds.

Enabled by `--compile-cache DIR` (cli/main.py), `compile_cache = DIR` in
a config file, or MGCFD_COMPILE_CACHE in the environment (bench.py).
"""
from __future__ import annotations

import os


def enable_compile_cache(cache_dir: str) -> str:
    """Point JAX's persistent compilation cache at `cache_dir`.

    Must run before the first jit compile to be effective for that
    compile (later is harmless — subsequent compiles still hit).
    Returns the absolute cache directory.
    """
    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything: the default 1 s floor would skip the many small
    # per-level kernels whose compiles still add up through the tunnel,
    # and the default min-entry-size floor skips tiny executables.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir
