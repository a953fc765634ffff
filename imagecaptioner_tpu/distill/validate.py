"""Pre-flight distillation setup validation (distillation_utils.py:343-394).

Runs one real teacher + student forward on a sample batch, builds projectors,
projects teacher features, evaluates the loss once, and prints shapes and
components — the same runtime self-test the reference performs before
training starts.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from imagecaptioner_tpu.core.config import DistillConfig, StudentConfig, TeacherConfig
from imagecaptioner_tpu.distill.losses import distillation_loss
from imagecaptioner_tpu.distill.projector import (
    create_feature_projectors, feature_projector_apply)
from imagecaptioner_tpu.distill.wrapper import teacher_forward_for_kd
from imagecaptioner_tpu.models import student as SM


def validate_distillation_setup(
    teacher_params: Dict, teacher_cfg: TeacherConfig,
    student_params: Dict, student_state: Dict, student_cfg: StudentConfig,
    sample_batch: Tuple[jnp.ndarray, jnp.ndarray], *,
    key=None, verbose: bool = True,
) -> Tuple[Dict, DistillConfig]:
    """Returns (projector_params, DistillConfig()) after one full dry run."""
    if key is None:
        key = jax.random.PRNGKey(0)
    images, captions = sample_batch

    teacher_outputs = teacher_forward_for_kd(
        teacher_params, images, captions, teacher_cfg)
    (s_logits, s_feats, s_hiddens, _), _ = SM.student_apply(
        student_params, student_state, images, captions, student_cfg,
        train=False)
    student_outputs = {
        "logits": s_logits, "encoder_features": s_feats,
        "hidden_states": s_hiddens,
    }
    if verbose:
        print(f"Teacher logits shape: {teacher_outputs['logits'].shape}")
        print(f"Student logits shape: {s_logits.shape}")
        print(f"Teacher encoder features shape: "
              f"{teacher_outputs['encoder_features'].shape}")
        print(f"Student encoder features shape: {s_feats.shape}")

    projectors, meta = create_feature_projectors(
        key, teacher_embed=teacher_cfg.embed_size,
        student_embed=student_cfg.embed_size,
        student_hidden=student_cfg.hidden_size,
        student_seq_len=student_cfg.feature_tokens,
        teacher_seq_len=teacher_cfg.num_tokens)
    projected = feature_projector_apply(
        projectors["encoder"], teacher_outputs["encoder_features"],
        teacher_seq_len=meta["teacher_seq_len"],
        student_seq_len=meta["student_seq_len"])
    if verbose:
        print(f"Projected teacher features shape: {projected.shape}")

    teacher_outputs = dict(teacher_outputs, encoder_features=projected)
    cfg = DistillConfig()
    total, loss_dict = distillation_loss(
        student_outputs, teacher_outputs, captions, cfg)
    if verbose:
        print("Distillation loss validation successful!")
        print("Loss components:",
              {k: float(v) for k, v in loss_dict.items()})
    return projectors, cfg
