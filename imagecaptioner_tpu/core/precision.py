"""Precision policy: native bf16 on TPU replaces torch.amp autocast+GradScaler.

The reference runs fp16 autocast with a GradScaler and forces the teacher to
fp32 (SURVEY §2.9 N5; distillation_utils.py:274-286).  On TPU, bfloat16 has
the same exponent range as fp32, so no loss scaling is needed: parameters and
optimizer state stay fp32, activations/matmuls ride bf16, and losses /
softmax / argmax are computed in fp32.  Parity tests pin compute to fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast floating-point leaves of a pytree to ``dtype`` (ints untouched)."""

    def _cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(_cast, tree)


def bf16_compute(tree):
    return cast_floating(tree, jnp.bfloat16)


def f32(tree):
    return cast_floating(tree, jnp.float32)
