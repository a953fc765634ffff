"""Test configuration: force an 8-device virtual CPU mesh.

The axon sitecustomize registers a TPU backend before conftest runs;
``jax.config.update`` still works because no backend has initialised yet.
Set IC_TPU_TESTS=1 to run the suite on real TPU hardware instead.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if os.environ.get("IC_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-dominated, this makes
# repeat runs several times faster.  The CPU suite uses its OWN cache dir —
# sharing one with TPU-platform processes produced AOT entries whose CPU
# feature sets mismatch this host (the cpu_aot_loader warning), which can
# abort with SIGILL on load — and the dir is keyed by the host's CPU flags
# because the container migrates between hosts (core/runtime.cpu_cache_dir).
from imagecaptioner_tpu.core.runtime import cpu_cache_dir  # noqa: E402

_cache_dir = os.environ.get("IC_JAX_CACHE_TESTS") or cpu_cache_dir()
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
