"""core/runtime: machine-keyed CPU compile-cache dir.

XLA:CPU AOT cache entries bake in the compile host's feature set; a cache
dir shared across container hosts can SIGILL on load (cpu_aot_loader
warning).  cpu_cache_dir() keys the dir by the host CPU flags.
"""

from imagecaptioner_tpu.core.runtime import cpu_cache_dir, host_cpu_tag


def test_host_cpu_tag_stable_and_short():
    a, b = host_cpu_tag(), host_cpu_tag()
    assert a == b
    assert len(a) == 10 and a.isalnum()


def test_cpu_cache_dir_is_machine_keyed(monkeypatch, tmp_path):
    monkeypatch.delenv("IC_JAX_CACHE_CPU", raising=False)
    d = cpu_cache_dir()
    assert d.startswith("/tmp/ic_jax_cache_cpu-")
    assert d.endswith(host_cpu_tag())
    base = str(tmp_path / "cache")
    assert cpu_cache_dir(base) == f"{base}-{host_cpu_tag()}"
    monkeypatch.setenv("IC_JAX_CACHE_CPU", str(tmp_path / "envbase"))
    assert cpu_cache_dir() == f"{tmp_path}/envbase-{host_cpu_tag()}"


def test_axon_and_clean_processes_get_distinct_tags():
    """axon-registered and clean-CPU processes emit incompatible XLA:CPU
    AOT code (prefer-no-* target features) — they must not share a dir."""
    a = host_cpu_tag(axon_loaded=True)
    c = host_cpu_tag(axon_loaded=False)
    assert a != c
    assert host_cpu_tag() in (a, c)


def test_cpu_cache_dir_spares_both_same_boot_tags(tmp_path):
    import os

    base = str(tmp_path / "cache")
    other = (host_cpu_tag(axon_loaded=True)
             if host_cpu_tag() == host_cpu_tag(axon_loaded=False)
             else host_cpu_tag(axon_loaded=False))
    os.makedirs(f"{base}-{other}")
    cpu_cache_dir(base)
    assert os.path.isdir(f"{base}-{other}")


def test_cpu_cache_dir_prunes_stale_boot_tags(tmp_path):
    """Tag dirs from earlier boots are unloadable AOT garbage (SIGILL risk,
    observed 3x this round) — cpu_cache_dir deletes them."""
    import os

    base = str(tmp_path / "cache")
    stale = f"{base}-deadbeef00"
    os.makedirs(stale)
    open(f"{stale}/entry", "w").write("x")
    # non-tag-shaped siblings of a user-set base must never be touched
    unrelated = f"{base}-backup"
    os.makedirs(unrelated)
    d = cpu_cache_dir(base)
    assert not os.path.exists(stale)
    assert os.path.isdir(unrelated)
    assert d == f"{base}-{host_cpu_tag()}"
    # the live tag dir (if present) is never pruned
    os.makedirs(d)
    assert os.path.isdir(cpu_cache_dir(base))
    assert os.path.isdir(d)
