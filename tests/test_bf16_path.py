"""bf16 compute-path coverage: fp32 params x bf16 activations must work
through every model and the full KD train step (the production TPU policy)."""

import jax
import jax.numpy as jnp
import numpy as np

from imagecaptioner_tpu.core.config import (
    DistillConfig, KDTrainConfig, TeacherConfig, compact_student_config,
    full_student_config)
from imagecaptioner_tpu.distill.projector import create_feature_projectors
from imagecaptioner_tpu.models import student as SM
from imagecaptioner_tpu.models import teacher as TM
from imagecaptioner_tpu.train import optim as O, steps


def test_student_forward_bf16_activations():
    cfg = full_student_config(40, embed_size=16, hidden_size=24, dropout=0.0)
    p, s = SM.student_init(jax.random.PRNGKey(0), cfg)  # fp32 params
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64),
                               jnp.bfloat16)
    captions = jax.random.randint(jax.random.PRNGKey(2), (5, 2), 0, 40)
    (logits, feats, hiddens, attns), _ = SM.student_apply(
        p, s, images, captions, cfg)
    assert jnp.isfinite(logits.astype(jnp.float32)).all()


def test_teacher_forward_bf16_activations():
    cfg = TeacherConfig(vocab_size=40, embed_size=32, num_heads=4,
                        num_decoder_layers=2, dropout=0.0, encoder_dim=24,
                        encoder_depth=2, encoder_heads=3, image_size=32,
                        patch_size=16)
    p = TM.teacher_init(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 32, 32),
                               jnp.bfloat16)
    captions = jax.random.randint(jax.random.PRNGKey(2), (5, 2), 0, 40)
    logits = TM.teacher_apply(p, images, captions, cfg)
    assert jnp.isfinite(logits.astype(jnp.float32)).all()


def test_kd_train_step_bf16_compute():
    """The exact production configuration: compute_dtype=bf16."""
    img = 32
    t_cfg = TeacherConfig(vocab_size=40, embed_size=32, num_heads=4,
                          num_decoder_layers=1, dropout=0.0, encoder_dim=24,
                          encoder_depth=1, encoder_heads=3, image_size=img,
                          patch_size=16)
    s_cfg = compact_student_config(40, embed_size=16, hidden_size=16,
                                   dropout=0.0, image_size=img)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    teacher_params = TM.teacher_init(k1, t_cfg)
    s_params, s_state = SM.student_init(k2, s_cfg)
    projectors, _ = create_feature_projectors(
        k3, teacher_embed=32, student_embed=16, student_hidden=16,
        student_seq_len=49, teacher_seq_len=t_cfg.num_tokens)
    params = {"student": s_params, "projectors": projectors}
    state = steps.TrainState(params, O.adamw_init(params), s_state)
    step = steps.make_kd_train_step(
        t_cfg, s_cfg, DistillConfig(),
        KDTrainConfig(batch_size=4, accumulation_steps=1),
        compute_dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.integers(0, 255, (1, 4, img, img, 3), dtype=np.uint8),
        "captions": rng.integers(1, 40, (1, 6, 4)).astype(np.int32),
        "lengths": np.full((1, 4), 6, np.int32),
    }
    state2, metrics = step(state, teacher_params, batch, jnp.float32(0.0),
                           jnp.int32(0), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    # params remain fp32 (policy: fp32 master weights)
    assert all(x.dtype == jnp.float32
               for x in jax.tree.leaves(state2.params)
               if jnp.issubdtype(x.dtype, jnp.floating))


def test_kd_train_step_teacher_bf16():
    """Flagged deviation knob: frozen teacher forward in bf16.  The step must
    run, produce a finite loss CLOSE to the fp32-teacher step's (KD targets
    only shift by bf16 rounding), and keep fp32 master weights."""
    img = 32
    t_cfg = TeacherConfig(vocab_size=40, embed_size=32, num_heads=4,
                          num_decoder_layers=1, dropout=0.0, encoder_dim=24,
                          encoder_depth=1, encoder_heads=3, image_size=img,
                          patch_size=16)
    s_cfg = compact_student_config(40, embed_size=16, hidden_size=16,
                                   dropout=0.0, image_size=img)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    teacher_params = TM.teacher_init(k1, t_cfg)
    s_params, s_state = SM.student_init(k2, s_cfg)
    projectors, _ = create_feature_projectors(
        k3, teacher_embed=32, student_embed=16, student_hidden=16,
        student_seq_len=49, teacher_seq_len=t_cfg.num_tokens)
    rng = np.random.default_rng(0)
    batch = {
        "images": rng.integers(0, 255, (1, 4, img, img, 3), dtype=np.uint8),
        "captions": rng.integers(1, 40, (1, 6, 4)).astype(np.int32),
        "lengths": np.full((1, 4), 6, np.int32),
    }

    losses = {}
    for name, teacher_bf16 in (("f32", False), ("bf16", True)):
        params = {"student": jax.tree.map(jnp.copy, s_params),
                  "projectors": jax.tree.map(jnp.copy, projectors)}
        state = steps.TrainState(params, O.adamw_init(params),
                                 jax.tree.map(jnp.copy, s_state))
        step = steps.make_kd_train_step(
            t_cfg, s_cfg, DistillConfig(),
            KDTrainConfig(batch_size=4, accumulation_steps=1,
                          teacher_bf16=teacher_bf16),
            compute_dtype=jnp.bfloat16)
        state2, metrics = step(state, teacher_params, batch,
                               jnp.float32(0.0), jnp.int32(0),
                               jax.random.PRNGKey(1))
        losses[name] = float(metrics["total_loss"])
        assert np.isfinite(losses[name])
        assert all(x.dtype == jnp.float32
                   for x in jax.tree.leaves(state2.params)
                   if jnp.issubdtype(x.dtype, jnp.floating))
    assert abs(losses["bf16"] - losses["f32"]) < 0.05 * (
        1.0 + abs(losses["f32"]))
