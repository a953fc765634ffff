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


def host_cpu_tag(axon_loaded=None) -> str:
    """Short stable hash of this host's CPU model + feature flags.

    XLA:CPU AOT cache entries bake in the compile host's feature set; loading
    them on a host without e.g. AMX can abort with SIGILL (the
    ``cpu_aot_loader`` warning).  This container migrates between hosts, so
    anything persisting a CPU-backend compile cache must key the directory by
    this tag.  The key includes the MODEL NAME, not just the CPUID flags:
    XLA's target preferences (``prefer-no-scatter``/``prefer-no-gather``)
    follow the CPU model, so two hosts with identical flags can still write
    mutually unloadable AOT entries (observed r3: same-flag hosts tripping
    the cpu_aot_loader mismatch inside one tag dir).

    The key ALSO includes the boot id: observed a third mismatch where model
    name and cpuinfo flags were byte-identical across the migration and only
    XLA's internal target features differed — nothing in /proc/cpuinfo can
    distinguish such hosts, so the tag treats every boot as a new machine.
    Costs a cold cache after each container migration/restart (exactly when
    the corruption appears); stale tags from earlier boots are pruned by
    :func:`cpu_cache_dir`.

    AND the key includes whether the axon TPU plugin is loaded in this
    process: measured WITHIN one boot (r3) that axon-registered processes
    emitted XLA:CPU AOT entries with ``+prefer-no-scatter/+prefer-no-gather``
    target features while clean-CPU processes emitted without them.
    CORRECTION (r3, later boot): on some hosts clean processes ALSO emit
    the ``prefer-no-*`` tuning preferences (they follow the CPU model), and
    the loader's feature check compares against raw CPUID flags which never
    contain tuning preferences — so the ``cpu_aot_loader`` E-warning fires
    on EVERY load there, even for a clean->clean round trip, and is NOT
    diagnostic of population mixing.  Measured benign: results correct and
    the warm run still 2.6x faster (2.42 -> 0.93 s), i.e. XLA warns and
    recovers.  The axon/clean split stays as cheap insurance (a genuinely
    mixed dir was observed to kill worker processes before the boot-id
    keying existed), but the boot-id key is the load-bearing protection.

    ``axon_loaded``: None (default) detects from ``sys.modules``;
    :func:`cpu_cache_dir` passes explicit values to enumerate this boot's
    valid tags for pruning."""
    import hashlib
    import platform
    import sys

    if axon_loaded is None:
        axon_loaded = any(m == "axon" or m.startswith("axon.")
                          for m in sys.modules)
    axon = "axon" if axon_loaded else "clean"
    model, flags, boot = "", "", ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not model and line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                elif not flags and line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                if model and flags:
                    break
    except OSError:
        pass
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            boot = f.read().strip()
    except OSError:
        pass
    key = (f"{model}|{flags}|{boot}|{axon}" if (model or flags)
           else f"{platform.processor()}|{boot}|{axon}")
    return hashlib.sha1(key.encode()).hexdigest()[:10]


def cpu_cache_dir(base: str = None) -> str:
    """Machine-keyed compile-cache dir for CPU-backend processes
    (tests, the multichip dryrun, benchmark config #1).  Prunes tag dirs
    from earlier boots — their AOT entries can never be valid again and a
    stale load risks SIGILL (see :func:`host_cpu_tag`)."""
    base = base or os.environ.get("IC_JAX_CACHE_CPU", "/tmp/ic_jax_cache_cpu")
    tag = host_cpu_tag()
    import glob
    import re
    import shutil

    # this boot has TWO valid tags (axon-loaded and clean processes write
    # incompatible AOT code, see host_cpu_tag) — never prune either
    live = {host_cpu_tag(axon_loaded=True), host_cpu_tag(axon_loaded=False)}
    for stale in glob.glob(f"{base}-*"):
        suffix = stale[len(base) + 1:]
        # only directories matching the tag format this function generates —
        # a user-set base may have unrelated '{base}-*' siblings
        if suffix not in live and re.fullmatch(r"[0-9a-f]{10}", suffix):
            shutil.rmtree(stale, ignore_errors=True)
    return f"{base}-{tag}"


def profile_trace(log_dir: str = "/tmp/ic_profile"):
    """Context manager around jax.profiler for step tracing (SURVEY §5.1)."""
    import jax

    return jax.profiler.trace(log_dir)
