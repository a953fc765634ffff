"""FeatureProjector: teacher -> student feature space
(distillation_utils.py:203-340).

Feature-dim projection = Linear + ReLU + Dropout(0.1) + LayerNorm when dims
differ; sequence alignment 197 -> 49/64 via AdaptiveAvgPool1d, realised here
as a static (out, in) averaging matmul (MXU-friendly, core/modules.py).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from imagecaptioner_tpu.core import modules as M

Params = Dict


def feature_projector_init(
    key, teacher_dim: int, student_dim: int, *,
    teacher_seq_len: int = 197, student_seq_len: int = 64,
) -> Params:
    p: Params = {}
    if teacher_dim != student_dim:
        p["feature_projection"] = {
            "fc": M.linear_init(key, teacher_dim, student_dim),
            "ln": M.layer_norm_init(student_dim),
        }
    return p


def feature_projector_apply(
    p: Params, features: jnp.ndarray, *,
    teacher_seq_len: int = 197, student_seq_len: int = 64,
    train: bool = False, rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """(B, teacher_seq_len, teacher_dim) -> (B, student_seq_len, student_dim)."""
    x = features
    if "feature_projection" in p:
        x = jax.nn.relu(M.dense(p["feature_projection"]["fc"], x))
        x = M.dropout(rng, x, 0.1, train)
        x = M.layer_norm(p["feature_projection"]["ln"], x)
    if teacher_seq_len != student_seq_len:
        x = jnp.transpose(x, (0, 2, 1))            # (B, D, L_t)
        x = M.adaptive_avg_pool1d(x, student_seq_len)
        x = jnp.transpose(x, (0, 2, 1))
    return x


def create_feature_projectors(
    key, *, teacher_embed: int, student_embed: int, student_hidden: int,
    student_seq_len: int = 49, teacher_seq_len: int = 197,
) -> Tuple[Params, Dict]:
    """Returns (params, meta).  The 'hidden' projector is created and
    checkpointed but never applied — a reference quirk preserved for schema
    parity (distillation_utils.py:332-338, SURVEY §2.6)."""
    k1, k2 = jax.random.split(key)
    params = {
        "encoder": feature_projector_init(
            k1, teacher_embed, student_embed,
            teacher_seq_len=teacher_seq_len, student_seq_len=student_seq_len),
        "hidden": feature_projector_init(
            k2, teacher_embed, student_hidden,
            teacher_seq_len=teacher_seq_len, student_seq_len=teacher_seq_len),
    }
    meta = {"teacher_seq_len": teacher_seq_len,
            "student_seq_len": student_seq_len}
    return params, meta
