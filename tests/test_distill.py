"""Distillation losses vs torch oracles implementing the reference math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from imagecaptioner_tpu.core.config import (
    DistillConfig, OptimizedDistillConfig, TeacherConfig,
    compact_student_config)
from imagecaptioner_tpu.distill import losses as DL
from imagecaptioner_tpu.distill.projector import (
    create_feature_projectors, feature_projector_apply, feature_projector_init)
from imagecaptioner_tpu.distill.validate import validate_distillation_setup
from imagecaptioner_tpu.distill.wrapper import teacher_forward_for_kd
from imagecaptioner_tpu.models import student as SM
from imagecaptioner_tpu.models import teacher as TM

T_, B_, V_ = 7, 4, 30


def _rand(shape, seed):
    return torch.from_numpy(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32))


def j(t):
    return jnp.asarray(np.array(t.detach().numpy(), copy=True))


def test_cross_entropy_ignore_pad_matches_torch():
    logits = _rand((T_, B_, V_), 0)
    targets = torch.from_numpy(
        np.random.default_rng(1).integers(0, V_, (T_, B_)))
    targets[-2:, :] = 0  # PAD rows
    ce_t = torch.nn.CrossEntropyLoss(ignore_index=0)(
        logits.view(-1, V_), targets.view(-1))
    ce_j = DL.cross_entropy_ignore_pad(j(logits), j(targets))
    np.testing.assert_allclose(float(ce_j), float(ce_t), rtol=1e-5)


def test_token_kd_matches_torch_batchmean():
    s = _rand((T_, B_, V_), 2)
    t = _rand((T_, B_, V_), 3)
    temp = 4.0
    kd_t = F.kl_div(F.log_softmax(s.view(-1, V_) / temp, 1),
                    F.softmax(t.view(-1, V_) / temp, 1),
                    reduction="batchmean") * temp ** 2
    kd_j = DL.token_level_distillation(j(s), j(t), temp)
    np.testing.assert_allclose(float(kd_j), float(kd_t), rtol=1e-4)


def test_token_kd_dynamic_length_normalizer():
    """With lengths given, normalizer = (max(len)-1) * B like a reference
    batch padded to its own max length."""
    s = _rand((T_, B_, V_), 4)
    t = _rand((T_, B_, V_), 5)
    lengths = jnp.array([5, 3, 4, 5])  # batch max 5 -> 4 teacher-forcing steps
    kd_full = DL.token_level_distillation(j(s)[:4], j(t)[:4], 4.0)
    kd_masked = DL.token_level_distillation(j(s), j(t), 4.0, lengths)
    np.testing.assert_allclose(float(kd_masked), float(kd_full), rtol=1e-5)


def test_feature_kd_matches_torch():
    s = _rand((B_, 49, 16), 6)
    t = _rand((B_, 49, 16), 7)
    g = F.mse_loss(s.mean(1), t.mean(1))
    sa = F.softmax(s.sum(-1), dim=1)
    ta = F.softmax(t.sum(-1), dim=1)
    aw = F.mse_loss((s * sa.unsqueeze(-1)).sum(1), (t * ta.unsqueeze(-1)).sum(1))
    ref = 0.6 * g + 0.4 * aw
    got = DL.encoder_feature_distillation(j(s), j(t))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_hidden_kd_matches_torch():
    s = _rand((T_, B_, 12), 8)
    t = _rand((T_ + 2, B_, 12), 9)  # longer teacher -> truncation
    losses = []
    for step in range(T_):
        mse = F.mse_loss(s[step], t[step])
        cos = torch.nn.CosineEmbeddingLoss()(s[step], t[step], torch.ones(B_))
        losses.append(0.7 * mse + 0.3 * cos)
    ref = torch.stack(losses).mean()
    got = DL.decoder_hidden_state_distillation(j(s), j(t))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    assert float(DL.decoder_hidden_state_distillation(j(s), None)) == 0.0


def test_total_loss_default_ce_weight_zero():
    """(1-a-b-g)=0 quirk: CE computed but contributes nothing."""
    cfg = DistillConfig()
    s_out = {"logits": j(_rand((T_, B_, V_), 10)),
             "encoder_features": j(_rand((B_, 49, 16), 11))}
    t_out = {"logits": j(_rand((T_, B_, V_), 12)),
             "encoder_features": j(_rand((B_, 49, 16), 13)),
             "hidden_states": None}
    targets = jnp.asarray(np.random.default_rng(14).integers(0, V_, (T_, B_)))
    total, d = DL.distillation_loss(s_out, t_out, targets, cfg)
    expected = (cfg.alpha * d["token_kd_loss"] + cfg.beta * d["feature_kd_loss"]
                + cfg.gamma * d["hidden_kd_loss"])
    np.testing.assert_allclose(float(total), float(expected), rtol=1e-6)
    assert float(d["ce_loss"]) > 0  # still computed


def test_focal_loss_matches_torch():
    logits = _rand((T_ * B_, V_), 15)
    targets = torch.from_numpy(
        np.random.default_rng(16).integers(0, V_, (T_ * B_,)))
    ce = torch.nn.CrossEntropyLoss(reduction="none")(logits, targets)
    pt = torch.exp(-ce)
    ref = (0.25 * (1 - pt) ** 2.0 * ce).mean()
    got = DL.focal_loss(j(logits), j(targets), 0.25, 2.0)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_optimized_loss_matches_torch_oracle():
    cfg = OptimizedDistillConfig()
    s = _rand((T_, B_, V_), 17)
    t = _rand((T_, B_, V_), 18)
    sf = _rand((B_, 49, 16), 19)
    tf = _rand((B_, 49, 16), 20)
    targets = torch.from_numpy(np.random.default_rng(21).integers(0, V_, (T_, B_)))
    epoch = 1  # warmup factor 1/3

    warm = min(1.0, epoch / cfg.warmup_epochs)
    ca = cfg.alpha * warm + (1 - warm) * 0.9
    tp = F.softmax(t.view(-1, V_) / cfg.temperature, -1)
    sl = F.log_softmax(s.view(-1, V_) / cfg.temperature, -1)
    kd = -(tp * sl).sum(-1).mean() * cfg.temperature ** 2
    ce = torch.nn.CrossEntropyLoss(reduction="none")(s.view(-1, V_), targets.view(-1))
    focal = (cfg.focal_alpha * (1 - torch.exp(-ce)) ** cfg.focal_gamma * ce).mean()
    token = ca * kd + (1 - ca) * focal
    sn = F.normalize(sf, p=2, dim=-1)
    tn = F.normalize(tf, p=2, dim=-1)
    feat = 1 - (sn * tn).sum(-1).mean()
    ref_total = token + (cfg.beta * warm) * feat

    s_out = {"logits": j(s), "encoder_features": j(sf), "hidden_states": None}
    t_out = {"logits": j(t), "encoder_features": j(tf), "hidden_states": None}
    total, d = DL.optimized_distillation_loss(s_out, t_out, j(targets), cfg, epoch)
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-4)
    np.testing.assert_allclose(float(d["kd_loss"]), float(kd), rtol=1e-4)


def test_feature_projector_shapes_and_torch_pool():
    key = jax.random.PRNGKey(0)
    p = feature_projector_init(key, 384, 256)
    x = _rand((2, 197, 384), 22)
    out = feature_projector_apply(p, j(x), teacher_seq_len=197, student_seq_len=64)
    assert out.shape == (2, 64, 256)
    # identity projection (dims equal) reduces to torch AdaptiveAvgPool1d
    p_id = feature_projector_init(key, 256, 256)
    assert p_id == {}
    x2 = _rand((2, 197, 256), 23)
    out2 = feature_projector_apply(p_id, j(x2), teacher_seq_len=197,
                                   student_seq_len=49)
    ref = F.adaptive_avg_pool1d(x2.transpose(1, 2), 49).transpose(1, 2)
    np.testing.assert_allclose(np.asarray(out2), ref.numpy(), atol=1e-5)


def test_teacher_wrapper_and_validate_pipeline():
    t_cfg = TeacherConfig(vocab_size=V_, embed_size=32, num_heads=4,
                          num_decoder_layers=2, dropout=0.0, encoder_dim=24,
                          encoder_depth=2, encoder_heads=3, image_size=32,
                          patch_size=16)
    s_cfg = compact_student_config(V_, embed_size=16, hidden_size=16,
                                   dropout=0.0, image_size=224)
    t_p = TM.teacher_init(jax.random.PRNGKey(0), t_cfg)
    s_p, s_s = SM.student_init(jax.random.PRNGKey(1), s_cfg)
    images_t = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 32, 32))
    images_s = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 224, 224))
    captions = jax.random.randint(jax.random.PRNGKey(4), (5, 2), 1, V_)

    out = teacher_forward_for_kd(t_p, images_t, captions, t_cfg)
    assert out["logits"].shape == (5, 2, V_)
    assert out["encoder_features"].shape == (2, t_cfg.num_tokens, 32)
    assert out["hidden_states"] is None
    assert out["logits"].dtype == jnp.float32

    # validate pipeline end-to-end (teacher images reused at teacher size)
    class FakeBatch(tuple):
        pass

    # teacher and student consume the same images in the real pipeline; here
    # run validate with student-sized images through a student-sized teacher
    t_cfg2 = TeacherConfig(vocab_size=V_, embed_size=32, num_heads=4,
                           num_decoder_layers=2, dropout=0.0, encoder_dim=24,
                           encoder_depth=2, encoder_heads=3, image_size=224,
                           patch_size=16)
    t_p2 = TM.teacher_init(jax.random.PRNGKey(5), t_cfg2)
    projectors, cfg = validate_distillation_setup(
        t_p2, t_cfg2, s_p, s_s, s_cfg, (images_s, captions), verbose=False)
    assert "encoder" in projectors and "hidden" in projectors
    assert isinstance(cfg, DistillConfig)

    projected = feature_projector_apply(
        projectors["encoder"], out["encoder_features"],
        teacher_seq_len=t_cfg.num_tokens, student_seq_len=49)
    assert projected.shape == (2, 49, 16)
