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


def _reset_jax_cache_singleton() -> None:
    """Drop JAX's in-process cache object so the next compile re-opens
    the cache at the currently configured directory.

    JAX lazily builds one process-wide cache handle the first time the
    persistent cache is touched; merely updating
    `jax_compilation_cache_dir` afterwards does NOT re-point that handle,
    so a second directory would silently never receive entries."""
    try:
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()
    except Exception:
        # Private API; if it moves, the first-enable path still works.
        pass


def enable_compile_cache(cache_dir: str) -> str:
    """Point JAX's persistent compilation cache at `cache_dir`.

    Must run before the first jit compile to be effective for that
    compile (later is harmless — subsequent compiles still hit).
    Idempotent, including across directory changes within one process
    (the in-process cache handle is reset when the directory differs).
    Returns the absolute cache directory.
    """
    cache_dir = os.path.abspath(os.path.expanduser(cache_dir))
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    if jax.config.jax_compilation_cache_dir != cache_dir:
        _reset_jax_cache_singleton()
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything: the default 1 s floor would skip the many small
    # per-level kernels whose compiles still add up through the tunnel,
    # and the default min-entry-size floor skips tiny executables.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return cache_dir


def disable_compile_cache() -> None:
    """Turn the persistent compilation cache back off (restore JAX
    defaults). Lets one process run a cached job followed by an
    intentionally-cold one (e.g. cold-compile measurement sweeps)."""
    import jax

    if jax.config.jax_compilation_cache_dir is not None:
        _reset_jax_cache_singleton()
    jax.config.update("jax_compilation_cache_dir", None)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
