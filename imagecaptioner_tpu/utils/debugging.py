"""Debugging / sanitizer hooks (SURVEY §5.2).

The reference's closest analogues are defensive precision pinning and
dimension-mismatch raises; the TPU-native equivalents are jit-time checks:

  * ``enable_nan_checks()`` — global ``jax_debug_nans`` (re-runs the failing
    op eagerly and raises at the NaN source).
  * ``assert_shape`` / ``assert_dtype`` — trace-time structural assertions
    (zero runtime cost; failures raise during tracing with the offending
    path).
  * ``check_finite`` — optional runtime guard via ``jax.debug`` callbacks.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def enable_nan_checks(on: bool = True) -> None:
    jax.config.update("jax_debug_nans", on)


def assert_shape(x: jnp.ndarray, shape: Sequence[int], name: str = "array"):
    """Trace-time shape check; ``None`` entries are wildcards."""
    if len(x.shape) != len(shape) or any(
            s is not None and s != xs for s, xs in zip(shape, x.shape)):
        raise AssertionError(
            f"{name}: expected shape {tuple(shape)}, got {x.shape}")


def assert_dtype(x: jnp.ndarray, dtype, name: str = "array"):
    if x.dtype != jnp.dtype(dtype):
        raise AssertionError(f"{name}: expected dtype {dtype}, got {x.dtype}")


def check_finite(x: jnp.ndarray, name: str = "array") -> jnp.ndarray:
    """Runtime finite-check inside jit (debug builds only — adds a reduce)."""

    def _cb(ok):
        if not ok:
            raise FloatingPointError(f"non-finite values in {name}")

    ok = jnp.isfinite(x.astype(jnp.float32)).all()
    jax.debug.callback(_cb, ok)
    return x
