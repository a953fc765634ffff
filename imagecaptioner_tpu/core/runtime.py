"""Process-level runtime knobs (compile cache, profiling hooks)."""

from __future__ import annotations

import os


def enable_compile_cache(path: str = None) -> None:
    """Persistent XLA compilation cache — first compiles through the remote
    tunnel take minutes; cached reloads take seconds.  Call before the first
    jit execution."""
    import jax

    cache = path or os.environ.get("IC_JAX_CACHE", "/tmp/ic_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the knobs


def profile_trace(log_dir: str = "/tmp/ic_profile"):
    """Context manager around jax.profiler for step tracing (SURVEY §5.1)."""
    import jax

    return jax.profiler.trace(log_dir)
