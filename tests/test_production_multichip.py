"""Production-dims multichip KD step (VERDICT r2 missing #5).

The driver's dryrun (__graft_entry__.dryrun_multichip) validates the DP x TP
x SP wiring at toy dims; this test steps the PRODUCTION models — the 512/8/4
teacher (ViT-S/16, 197 tokens, head dim 64) and the 256/512 full student
(ResNet-50, 49 tokens) — through one full KD train step on the 8-device
virtual mesh with the same real shardings, proving TP/SP sharding at real
shapes compiles and executes.

Reference being scaled: the KD step of src/train_student_kd.py:251-303,
which is single-GPU only.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def test_production_dims_kd_step_dp_tp_sp():
    from imagecaptioner_tpu.core import mesh as MS
    from imagecaptioner_tpu.core.config import (
        DistillConfig, KDTrainConfig, TeacherConfig, full_student_config)
    from imagecaptioner_tpu.distill.projector import create_feature_projectors
    from imagecaptioner_tpu.models import student as SM
    from imagecaptioner_tpu.models import teacher as TM
    from imagecaptioner_tpu.parallel import sp, tp
    from imagecaptioner_tpu.train import optim as O, steps

    # PRODUCTION architecture dims (train_teacher.py:58-61 / SURVEY §2.2-2.3)
    t_cfg = TeacherConfig(vocab_size=2994)          # 512/8/4, 197 tokens
    s_cfg = full_student_config(2994)               # 256/512/2, 49 tokens
    assert t_cfg.embed_size == 512 and t_cfg.num_heads == 8
    assert t_cfg.num_tokens == 197
    assert s_cfg.hidden_size == 512

    mesh = MS.create_mesh(jax.devices()[:8], shape=(4, 2))
    B, A, T = 8, 1, 24                              # global batch over data=4
    tr = KDTrainConfig(batch_size=B, accumulation_steps=A, num_epochs=1)

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    teacher_params = TM.teacher_init(k1, t_cfg)
    s_params, s_state = SM.student_init(k2, s_cfg)
    projectors, _ = create_feature_projectors(
        k3, teacher_embed=512, student_embed=256, student_hidden=512,
        student_seq_len=49, teacher_seq_len=197)
    params = {"student": s_params, "projectors": projectors}
    state = steps.TrainState(params, O.adamw_init(params), s_state)

    state = MS.replicate(mesh, state)
    teacher_params = tp.place_teacher_tp(mesh, teacher_params, t_cfg)

    rng = np.random.default_rng(0)
    batch = {
        "images": jax.device_put(
            rng.integers(0, 255, (A, B, 224, 224, 3), dtype=np.uint8),
            NamedSharding(mesh, P(None, "data"))),
        "captions": jax.device_put(
            rng.integers(1, 2994, (A, T, B)).astype(np.int32),
            NamedSharding(mesh, P(None, None, "data"))),
        "lengths": jax.device_put(
            np.full((A, B), T, np.int32),
            NamedSharding(mesh, P(None, "data"))),
    }

    train_step = steps.make_kd_train_step(
        t_cfg, s_cfg, DistillConfig(), tr, compute_dtype=jnp.float32)
    # the step DONATES its input state — snapshot before stepping
    old = np.asarray(jax.tree.leaves(state.params["student"])[0])
    with mesh, sp.sequence_sharding(mesh, axis="model"):
        new_state, metrics = train_step(
            state, teacher_params, batch, jnp.float32(0.0), jnp.int32(0),
            jax.random.PRNGKey(1))
        jax.block_until_ready(metrics["total_loss"])

    loss = float(metrics["total_loss"])
    assert np.isfinite(loss), f"non-finite loss {loss}"
    # the step actually updated the student
    new = jax.tree.leaves(new_state.params["student"])[0]
    assert not np.allclose(old, np.asarray(new))
