"""Teacher forward for KD (TeacherWrapper, distillation_utils.py:255-292).

Differences from the reference, with identical outputs:
  * single encoder pass — the reference re-ran ``encoder.forward_features``
    to tap features, doubling encoder FLOPs per KD step (:278-283); here the
    decoder consumes the same memory that is returned as the feature tap.
  * no parameter freezing needed — the caller simply never differentiates
    through this function (``jax.lax.stop_gradient`` + no grad wrt teacher).

Outputs are fp32 (the reference forces fp32 teacher outputs under AMP,
:284-286) and ``hidden_states`` is None (:291) — which keeps gamma (hidden
KD) structurally dead in every real training run, as in the reference.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from imagecaptioner_tpu.core.config import TeacherConfig
from imagecaptioner_tpu.models import teacher as TM


def teacher_forward_for_kd(
    params: Dict, images: jnp.ndarray, captions: jnp.ndarray,
    cfg: TeacherConfig, *, compute_dtype=jnp.float32,
) -> Dict:
    """Returns {'logits' (T,B,V) fp32, 'encoder_features' (B,197,E) fp32,
    'hidden_states': None} — no gradients flow to the teacher.

    ``compute_dtype``: dtype the frozen teacher RUNS in.  float32 (default)
    reproduces the reference's AMP discipline — the teacher stays full
    precision while the student autocasts (distillation_utils.py:274-286).
    bfloat16 is a flagged TPU deviation (KDTrainConfig.teacher_bf16): the
    teacher is inference-only, so running it at MXU-native bf16 (outputs
    still cast to fp32 for the losses) halves its share of the KD step."""
    if compute_dtype != jnp.float32:
        from imagecaptioner_tpu.core import precision as P

        params = P.bf16_compute(params)
    memory = TM.encode_image(params, images.astype(compute_dtype), cfg,
                             train=False)
    logits = TM.teacher_apply(params, None, captions, cfg, train=False,
                              memory=memory)
    return {
        "logits": jax.lax.stop_gradient(logits.astype(jnp.float32)),
        "encoder_features": jax.lax.stop_gradient(memory.astype(jnp.float32)),
        "hidden_states": None,
    }
