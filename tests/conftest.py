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

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
