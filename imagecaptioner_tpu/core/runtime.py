"""Process-level runtime knobs (compile cache, profiling hooks)."""

from __future__ import annotations

import os


def enable_compile_cache(path: str = None) -> None:
    """Persistent XLA compilation cache — first compiles through the remote
    tunnel take minutes; cached reloads take seconds.  Call before the first
    jit execution."""
    import jax

    if path is None:
        if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
            # CPU-backend process: use the machine-keyed CPU cache, never the
            # TPU tool cache (mixed AOT entries risk SIGILL on load)
            cache = cpu_cache_dir()
        else:
            cache = os.environ.get("IC_JAX_CACHE", "/tmp/ic_jax_cache")
    else:
        cache = path
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the knobs


def host_cpu_tag() -> str:
    """Short stable hash of this host's CPU feature flags.

    XLA:CPU AOT cache entries bake in the compile host's feature set; loading
    them on a host without e.g. AMX can abort with SIGILL (the
    ``cpu_aot_loader`` warning).  This container migrates between hosts, so
    anything persisting a CPU-backend compile cache must key the directory by
    this tag."""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(flags.encode()).hexdigest()[:10]
    except OSError:
        pass
    return hashlib.sha1(platform.processor().encode()).hexdigest()[:10]


def cpu_cache_dir(base: str = None) -> str:
    """Machine-keyed compile-cache dir for CPU-backend processes
    (tests, the multichip dryrun, benchmark config #1)."""
    base = base or os.environ.get("IC_JAX_CACHE_CPU", "/tmp/ic_jax_cache_cpu")
    return f"{base}-{host_cpu_tag()}"


def profile_trace(log_dir: str = "/tmp/ic_profile"):
    """Context manager around jax.profiler for step tracing (SURVEY §5.1)."""
    import jax

    return jax.profiler.trace(log_dir)
