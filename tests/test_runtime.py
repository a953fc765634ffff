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


def test_cpu_cache_dir_is_machine_keyed(monkeypatch):
    monkeypatch.delenv("IC_JAX_CACHE_CPU", raising=False)
    d = cpu_cache_dir()
    assert d.startswith("/tmp/ic_jax_cache_cpu-")
    assert d.endswith(host_cpu_tag())
    assert cpu_cache_dir("/x/y") == f"/x/y-{host_cpu_tag()}"
    monkeypatch.setenv("IC_JAX_CACHE_CPU", "/env/base")
    assert cpu_cache_dir() == f"/env/base-{host_cpu_tag()}"
