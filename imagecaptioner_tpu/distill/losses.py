"""Distillation losses (distillation_utils.py:8-200 and the optimized variant
train_student_kd_optimized.py:34-128) as pure jitted functions.

Static-shape discipline: captions are padded to a fixed T, but the reference
computes its losses over dynamic per-batch max length.  Every normalizer here
therefore masks to ``valid_steps = max(lengths) - 1`` (the teacher-forcing
length) so loss *values* match the reference batch-for-batch:

  * KL `batchmean` divides by valid_steps * B — the reference counts in-range
    PAD rows in the normalizer (SURVEY §7 'ragged captions'), reproduced.
  * CE uses ignore_index=0 (PAD) semantics: mean over non-PAD targets only.
  * With default weights the CE coefficient (1-a-b-g) is exactly 0 — the
    reference quirk is preserved, not fixed (SURVEY §7 'faithful quirks').
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from imagecaptioner_tpu.core.config import DistillConfig, OptimizedDistillConfig


def _step_mask(T: int, B: int, lengths: Optional[jnp.ndarray]) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(T, B) float mask of steps < valid_steps, and valid_steps scalar."""
    if lengths is None:
        return jnp.ones((T, B), jnp.float32), jnp.float32(T)
    valid_steps = jnp.maximum(jnp.max(lengths) - 1, 1).astype(jnp.float32)
    steps = jnp.arange(T, dtype=jnp.float32)[:, None]
    return (steps < valid_steps).astype(jnp.float32) * jnp.ones((1, B)), valid_steps


def cross_entropy_ignore_pad(logits: jnp.ndarray, targets: jnp.ndarray
                             ) -> jnp.ndarray:
    """nn.CrossEntropyLoss(ignore_index=0) over (T, B, V) logits / (T, B)
    targets: mean over non-PAD positions."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # one-hot contraction, not take_along_axis: XLA lowers a last-axis gather
    # row-at-a-time on TPU (CLAUDE.md; same pathology as the beam KV reorder)
    # while the masked sum fuses into the softmax.  Bit-exact: every non-
    # selected product is exactly 0.0 and x + 0.0 == x.
    one_hot = jax.nn.one_hot(targets, logits.shape[-1], dtype=logp.dtype)
    nll = -jnp.sum(logp * one_hot, axis=-1)
    mask = (targets != 0).astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def token_level_distillation(
    student_logits: jnp.ndarray, teacher_logits: jnp.ndarray,
    temperature: float, lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """KL(log_softmax(s/T) || softmax(t/T)) * T^2, batchmean
    (distillation_utils.py:30-54)."""
    T, B, V = student_logits.shape
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / temperature, -1)
    t = jax.nn.softmax(teacher_logits.astype(jnp.float32) / temperature, -1)
    # torch F.kl_div(input=s, target=t): sum t * (log t - s)
    kl = jnp.sum(t * (jnp.where(t > 0, jnp.log(jnp.maximum(t, 1e-38)), 0.0) - s),
                 axis=-1)  # (T, B)
    mask, valid_steps = _step_mask(T, B, lengths)
    return jnp.sum(kl * mask) / (valid_steps * B) * (temperature ** 2)


def encoder_feature_distillation(student_features: jnp.ndarray,
                                 teacher_features: jnp.ndarray) -> jnp.ndarray:
    """0.6 * MSE(global-mean) + 0.4 * MSE(attention-weighted), where the
    attention weights are softmax over per-token feature sums
    (distillation_utils.py:56-94)."""
    sf = student_features.astype(jnp.float32)
    tf = teacher_features.astype(jnp.float32)
    global_loss = jnp.mean(jnp.square(jnp.mean(sf, 1) - jnp.mean(tf, 1)))
    s_attn = jax.nn.softmax(jnp.sum(sf, -1), axis=1)
    t_attn = jax.nn.softmax(jnp.sum(tf, -1), axis=1)
    s_w = jnp.sum(sf * s_attn[..., None], axis=1)
    t_w = jnp.sum(tf * t_attn[..., None], axis=1)
    attention_loss = jnp.mean(jnp.square(s_w - t_w))
    return 0.6 * global_loss + 0.4 * attention_loss


def decoder_hidden_state_distillation(
    student_hiddens: Optional[jnp.ndarray],
    teacher_hiddens: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """Per-step 0.7*MSE + 0.3*(1-cos), mean over steps
    (distillation_utils.py:96-136).  Returns 0 when either side is None —
    which is every real run (TeacherWrapper yields hidden_states=None)."""
    if student_hiddens is None or teacher_hiddens is None:
        return jnp.float32(0.0)
    T = min(student_hiddens.shape[0], teacher_hiddens.shape[0])
    s = student_hiddens[:T].astype(jnp.float32)
    t = teacher_hiddens[:T].astype(jnp.float32)
    mse = jnp.mean(jnp.square(s - t), axis=(1, 2))
    cos = jnp.sum(s * t, -1) / jnp.maximum(
        jnp.linalg.norm(s, axis=-1) * jnp.linalg.norm(t, axis=-1), 1e-8)
    cos_loss = jnp.mean(1.0 - cos, axis=1)
    return jnp.mean(0.7 * mse + 0.3 * cos_loss)


def distillation_loss(
    student_outputs: Dict, teacher_outputs: Dict, targets: jnp.ndarray,
    cfg: DistillConfig, lengths: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """DistillationLoss.forward (distillation_utils.py:138-200)."""
    ce = cross_entropy_ignore_pad(student_outputs["logits"], targets)
    token_kd = token_level_distillation(
        student_outputs["logits"], teacher_outputs["logits"],
        cfg.temperature, lengths)
    feature_kd = jnp.float32(0.0)
    if ("encoder_features" in student_outputs
            and "encoder_features" in teacher_outputs):
        feature_kd = encoder_feature_distillation(
            student_outputs["encoder_features"],
            teacher_outputs["encoder_features"])
    hidden_kd = decoder_hidden_state_distillation(
        student_outputs.get("hidden_states"),
        teacher_outputs.get("hidden_states"))
    total = ((1.0 - cfg.alpha - cfg.beta - cfg.gamma) * ce
             + cfg.alpha * token_kd + cfg.beta * feature_kd
             + cfg.gamma * hidden_kd)
    return total, {
        "total_loss": total, "ce_loss": ce, "token_kd_loss": token_kd,
        "feature_kd_loss": feature_kd, "hidden_kd_loss": hidden_kd,
    }


# ---------------------------------------------------------------------------
# Optimized variant (train_student_kd_optimized.py:34-128)
# ---------------------------------------------------------------------------


def focal_loss(logits_flat: jnp.ndarray, targets_flat: jnp.ndarray,
               alpha: float, gamma: float,
               mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """focal = a * (1-pt)^g * ce, mean — NO pad-ignore, like the reference
    (:52-57 uses CrossEntropyLoss(reduction='none') without ignore_index)."""
    logp = jax.nn.log_softmax(logits_flat.astype(jnp.float32), -1)
    # one-hot contraction (TPU-fast), not a last-axis gather — see
    # cross_entropy_ignore_pad
    one_hot = jax.nn.one_hot(targets_flat, logits_flat.shape[-1],
                             dtype=logp.dtype)
    ce = -jnp.sum(logp * one_hot, axis=-1)
    pt = jnp.exp(-ce)
    fl = alpha * (1.0 - pt) ** gamma * ce
    if mask is None:
        return jnp.mean(fl)
    return jnp.sum(fl * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def optimized_distillation_loss(
    student_outputs: Dict, teacher_outputs: Dict, targets: jnp.ndarray,
    cfg: OptimizedDistillConfig, epoch: int,
    lengths: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Warmup-adaptive weights + (soft-CE KD, focal hard loss, cosine feature
    loss).  ``epoch`` drives the warmup schedule (:63-67)."""
    warmup = jnp.minimum(1.0, jnp.float32(epoch) / cfg.warmup_epochs)
    cur_alpha = cfg.alpha * warmup + (1.0 - warmup) * 0.9
    cur_beta = cfg.beta * warmup
    cur_gamma = cfg.gamma * warmup

    T, B, V = student_outputs["logits"].shape
    s_flat = student_outputs["logits"].reshape(-1, V).astype(jnp.float32)
    t_flat = teacher_outputs["logits"].reshape(-1, V).astype(jnp.float32)
    tg_flat = targets.reshape(-1)
    mask2d, valid_steps = _step_mask(T, B, lengths)
    mask = mask2d.reshape(-1)

    t_probs = jax.nn.softmax(t_flat / cfg.temperature, -1)
    s_logp = jax.nn.log_softmax(s_flat / cfg.temperature, -1)
    kd_rows = -jnp.sum(t_probs * s_logp, axis=-1)
    kd = jnp.sum(kd_rows * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    kd = kd * (cfg.temperature ** 2)

    hard = focal_loss(s_flat, tg_flat, cfg.focal_alpha, cfg.focal_gamma, mask)
    token_loss = cur_alpha * kd + (1.0 - cur_alpha) * hard

    feature_loss = jnp.float32(0.0)
    if ("encoder_features" in student_outputs
            and "encoder_features" in teacher_outputs):
        sf = student_outputs["encoder_features"].astype(jnp.float32)
        tf = teacher_outputs["encoder_features"].astype(jnp.float32)
        sn = sf / jnp.maximum(jnp.linalg.norm(sf, axis=-1, keepdims=True), 1e-12)
        tn = tf / jnp.maximum(jnp.linalg.norm(tf, axis=-1, keepdims=True), 1e-12)
        feature_loss = 1.0 - jnp.mean(jnp.sum(sn * tn, -1))

    hidden_loss = jnp.float32(0.0)
    sh = student_outputs.get("hidden_states")
    th = teacher_outputs.get("hidden_states")
    if sh is not None and th is not None and rng is not None:
        # reference uses *random* attention weights (:106) — structurally dead
        # in real runs (teacher hiddens None) but reproduced for parity
        w = jax.nn.softmax(jax.random.normal(rng, sh.shape[:2]), axis=0)
        ws = jnp.sum(sh.astype(jnp.float32) * w[..., None], 0)
        wt = jnp.sum(th.astype(jnp.float32) * w[..., None], 0)
        hidden_loss = jnp.mean(jnp.square(ws - wt))

    total = token_loss + cur_beta * feature_loss + cur_gamma * hidden_loss
    return total, {
        "total_loss": total, "token_kd_loss": token_loss,
        "feature_kd_loss": feature_loss, "hidden_kd_loss": hidden_loss,
        "kd_loss": kd, "hard_loss": hard, "ce_loss": hard,
    }
