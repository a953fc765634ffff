"""Data-parallel correctness on the 8-device CPU mesh: the sharded jitted
step must produce the same loss and parameter updates as unsharded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from imagecaptioner_tpu.core import mesh as MS
from imagecaptioner_tpu.core.config import (
    DistillConfig, KDTrainConfig, TeacherConfig, compact_student_config)
from imagecaptioner_tpu.distill.projector import create_feature_projectors
from imagecaptioner_tpu.models import student as SM
from imagecaptioner_tpu.models import teacher as TM
from imagecaptioner_tpu.train import optim as O, steps

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def _setup(variant="compact"):
    img = 32
    t_cfg = TeacherConfig(vocab_size=40, embed_size=32, num_heads=4,
                          num_decoder_layers=1, dropout=0.0, encoder_dim=24,
                          encoder_depth=1, encoder_heads=3, image_size=img,
                          patch_size=16)
    if variant == "enhanced":
        from imagecaptioner_tpu.core.config import enhanced_student_config

        s_cfg = enhanced_student_config(40, embed_size=16, hidden_size=16,
                                        num_layers=2, dropout=0.0,
                                        image_size=img)
    else:
        s_cfg = compact_student_config(40, embed_size=16, hidden_size=16,
                                       dropout=0.0, image_size=img)
    tr = KDTrainConfig(batch_size=16, accumulation_steps=1, num_epochs=1)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    teacher_params = TM.teacher_init(k1, t_cfg)
    s_params, s_state = SM.student_init(k2, s_cfg)
    projectors, _ = create_feature_projectors(
        k3, teacher_embed=t_cfg.embed_size, student_embed=s_cfg.embed_size,
        student_hidden=s_cfg.hidden_size, student_seq_len=s_cfg.feature_tokens,
        teacher_seq_len=t_cfg.num_tokens)
    params = {"student": s_params, "projectors": projectors}
    state = steps.TrainState(params, O.adamw_init(params), s_state)
    # no-augmentation config so sharded/unsharded see identical pixels
    from imagecaptioner_tpu.data.transforms import AugmentConfig

    step = steps.make_kd_train_step(
        t_cfg, s_cfg, DistillConfig(), tr, aug=AugmentConfig(),
        compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    B, T = 16, 8
    batch = {
        "images": rng.integers(0, 255, (1, B, img, img, 3), dtype=np.uint8),
        "captions": rng.integers(1, 40, (1, T, B)).astype(np.int32),
        "lengths": np.full((1, B), T, np.int32),
    }
    return t_cfg, s_cfg, teacher_params, state, step, batch


@pytest.mark.parametrize("variant", ["compact", "enhanced"])
def test_dp_step_matches_single_device(variant):
    t_cfg, s_cfg, teacher_params, state, step, batch = _setup(variant)
    rng = jax.random.PRNGKey(5)

    # single-device (replicated inputs)
    new_state_1, metrics_1 = step(state, teacher_params, batch,
                                  jnp.float32(0.0), jnp.int32(0), rng)
    loss_1 = float(metrics_1["total_loss"])

    # fresh state (donated buffers), sharded over 8-device mesh
    t_cfg2, s_cfg2, teacher_params2, state2, step2, batch2 = _setup(variant)
    mesh = MS.create_mesh()
    state2 = MS.replicate(mesh, state2)
    teacher_params2 = MS.replicate(mesh, teacher_params2)
    sharded = {
        "images": jax.device_put(batch2["images"],
                                 NamedSharding(mesh, P(None, "data"))),
        "captions": jax.device_put(batch2["captions"],
                                   NamedSharding(mesh, P(None, None, "data"))),
        "lengths": jax.device_put(batch2["lengths"],
                                  NamedSharding(mesh, P(None, "data"))),
    }
    new_state_8, metrics_8 = step2(state2, teacher_params2, sharded,
                                   jnp.float32(0.0), jnp.int32(0), rng)
    loss_8 = float(metrics_8["total_loss"])

    assert abs(loss_1 - loss_8) < 1e-4, (loss_1, loss_8)
    # parameter updates identical (DP grads reduce to the same mean)
    l1 = jax.tree.leaves(new_state_1.params)
    l8 = jax.tree.leaves(new_state_8.params)
    worst = max(float(jnp.max(jnp.abs(a - jax.device_get(b))))
                for a, b in zip(l1, l8))
    assert worst < 1e-4, worst


def test_shard_helpers_specs():
    mesh = MS.create_mesh()
    x = np.zeros((16, 4, 4, 3), np.float32)
    sx = MS.shard_batch(mesh, x)
    assert sx.sharding.spec == P("data", None, None, None)
    tm = MS.shard_time_major(mesh, np.zeros((10, 16), np.int32))
    assert tm.sharding.spec == P(None, "data")


def test_teacher_tensor_parallel_matches_replicated():
    """TP over the 'model' axis is a config, not a rewrite: placing the
    teacher params with Megatron-style shardings and jitting the unchanged
    forward must reproduce the replicated logits (XLA inserts collectives)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from imagecaptioner_tpu.core import mesh as MS
    from imagecaptioner_tpu.core.config import TeacherConfig
    from imagecaptioner_tpu.models import teacher as TM
    from imagecaptioner_tpu.parallel import tp

    cfg = TeacherConfig(vocab_size=64, embed_size=32, num_heads=4,
                        num_decoder_layers=2, dropout=0.0, encoder_dim=24,
                        encoder_depth=2, encoder_heads=3, image_size=32,
                        patch_size=16)
    params = TM.teacher_init(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))
    captions = jax.random.randint(jax.random.PRNGKey(2), (6, 4), 0, 64)

    ref = jax.jit(lambda p: TM.teacher_apply(p, images, captions, cfg))(
        params)

    mesh = MS.create_mesh(jax.devices()[:4], shape=(2, 2))
    tp_params = tp.place_teacher_tp(mesh, params, cfg)
    # batch over 'data', params over 'model' — dp x tp jointly
    img_s = jax.device_put(images, NamedSharding(mesh, P("data")))
    cap_s = jax.device_put(captions, NamedSharding(mesh, P(None, "data")))
    out = jax.jit(lambda p, i, c: TM.teacher_apply(p, i, c, cfg))(
        tp_params, img_s, cap_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_teacher_sequence_parallel_matches_replicated():
    """SP policy: constraining the ViT patch-token axis and the caption time
    axis onto the 'model' mesh axis must reproduce the replicated logits
    (GSPMD inserts the all-gathers global attention needs)."""
    import jax.numpy as jnp

    from imagecaptioner_tpu.core import mesh as MS
    from imagecaptioner_tpu.core.config import TeacherConfig
    from imagecaptioner_tpu.models import teacher as TM
    from imagecaptioner_tpu.parallel import sp

    cfg = TeacherConfig(vocab_size=64, embed_size=32, num_heads=4,
                        num_decoder_layers=2, dropout=0.0, encoder_dim=24,
                        encoder_depth=2, encoder_heads=3, image_size=32,
                        patch_size=16)
    params = TM.teacher_init(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))
    captions = jax.random.randint(jax.random.PRNGKey(2), (6, 4), 0, 64)

    ref = jax.jit(lambda p: TM.teacher_apply(p, images, captions, cfg))(
        params)

    mesh = MS.create_mesh(jax.devices()[:4], shape=(2, 2))
    with sp.sequence_sharding(mesh, axis="model"):
        assert sp.active()
        out = jax.jit(
            lambda p, i, c: TM.teacher_apply(p, i, c, cfg))(
                MS.replicate(mesh, params), images, captions)
    assert not sp.active()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_teacher_dp_tp_sp_combined():
    """All three axes at once on a (2, 2) mesh: batch over 'data', params
    over 'model' (TP), token axes constrained over 'model' (SP)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from imagecaptioner_tpu.core import mesh as MS
    from imagecaptioner_tpu.core.config import TeacherConfig
    from imagecaptioner_tpu.models import teacher as TM
    from imagecaptioner_tpu.parallel import sp, tp

    cfg = TeacherConfig(vocab_size=64, embed_size=32, num_heads=4,
                        num_decoder_layers=2, dropout=0.0, encoder_dim=24,
                        encoder_depth=2, encoder_heads=3, image_size=32,
                        patch_size=16)
    params = TM.teacher_init(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 32, 32))
    captions = jax.random.randint(jax.random.PRNGKey(2), (6, 4), 0, 64)
    ref = jax.jit(lambda p: TM.teacher_apply(p, images, captions, cfg))(
        params)

    mesh = MS.create_mesh(jax.devices()[:4], shape=(2, 2))
    tp_params = tp.place_teacher_tp(mesh, params, cfg)
    img_s = jax.device_put(images, NamedSharding(mesh, P("data")))
    cap_s = jax.device_put(captions, NamedSharding(mesh, P(None, "data")))
    with sp.sequence_sharding(mesh, axis="model"):
        out = jax.jit(lambda p, i, c: TM.teacher_apply(p, i, c, cfg))(
            tp_params, img_s, cap_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_sequence_sharding_rekeys_jit_cache():
    """ADVICE r2: the SP policy is read at trace time, so jit caches must be
    KEYED on it — a step first traced outside sequence_sharding() must
    re-trace (and pick up the constraints) when first called inside, and the
    constrained trace must not leak back outside.  sequence_sharding enters
    jax.set_mesh, whose context mesh is part of the jit cache key."""
    import jax.numpy as jnp

    from imagecaptioner_tpu.core import mesh as MS
    from imagecaptioner_tpu.parallel import sp

    mesh = MS.create_mesh(jax.devices()[:4], shape=(2, 2))
    traced_policies = []

    @jax.jit
    def step(x):
        traced_policies.append(sp.active())
        return sp.shard_seq(x * 2.0, 1)

    x = jnp.ones((2, 4, 8))
    step(x)  # traced OUTSIDE the policy
    assert traced_policies == [False]
    with sp.sequence_sharding(mesh, axis="model"):
        out_in = step(x)  # must RE-trace, now seeing the policy
    assert traced_policies == [False, True]
    out_after = step(x)  # back outside: reuses the unconstrained trace
    assert traced_policies == [False, True]
    np.testing.assert_allclose(np.asarray(out_in), np.asarray(out_after))


def test_maybe_mesh_refuses_disabled_dp_multiprocess(monkeypatch):
    """ADVICE r2: data_parallel=False in a multi-process run must refuse
    (independent per-process training silently diverges) even though the
    enabled=False early return used to bypass the guard."""
    import pytest

    from imagecaptioner_tpu.train import common

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="data parallelism"):
        common.maybe_mesh(16, enabled=False)


def test_dp_beam_serving_matches_single():
    """DP-sharded beam serving (eval/serving.py) is token-identical to the
    single-device packed search: captioning is per-image independent, so
    GSPMD partitioning over the data axis must not change anything."""
    from imagecaptioner_tpu.eval import serving as SV
    from imagecaptioner_tpu.ops import decode as D

    img = 32
    cfg = TeacherConfig(vocab_size=40, embed_size=32, num_heads=4,
                        num_decoder_layers=2, dropout=0.0, encoder_dim=24,
                        encoder_depth=1, encoder_heads=3, image_size=img,
                        patch_size=16)
    p = TM.teacher_init(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 3, img, img))

    mesh = MS.create_mesh(shape=(8, 1))
    fn = SV.make_dp_beam_captioner(p, cfg, mesh, max_length=8, beam_size=3)
    seqs_dp, scores_dp, lens_dp = jax.device_get(fn(images))

    memory = TM.encode_image(p, images, cfg)
    seqs, scores, lens = jax.device_get(D.beam_search_teacher_packed(
        p, memory, cfg, max_length=8, beam_size=3))
    np.testing.assert_array_equal(np.asarray(seqs_dp), np.asarray(seqs))
    np.testing.assert_allclose(np.asarray(scores_dp), np.asarray(scores),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(lens_dp), np.asarray(lens))


def test_dp_pipelined_beam_serving_matches_single():
    """DP pipelined beam serving (shard_map per-device decode packs,
    eval/serving.make_dp_beam_captioner(pipelined_pack=...)) is
    token-identical to the single-device packed search."""
    from imagecaptioner_tpu.eval import serving as SV
    from imagecaptioner_tpu.ops import decode as D

    img = 32
    cfg = TeacherConfig(vocab_size=40, embed_size=32, num_heads=4,
                        num_decoder_layers=2, dropout=0.0, encoder_dim=24,
                        encoder_depth=1, encoder_heads=3, image_size=img,
                        patch_size=16)
    p = TM.teacher_init(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (32, 3, img, img))

    mesh = MS.create_mesh(shape=(8, 1))  # 4 images/shard = 2 packs of 2
    fn = SV.make_dp_beam_captioner(p, cfg, mesh, max_length=8, beam_size=3,
                                   pipelined_pack=2)
    seqs_dp, scores_dp, lens_dp = jax.device_get(fn(images))

    memory = TM.encode_image(p, images, cfg)
    seqs, scores, lens = jax.device_get(D.beam_search_teacher_packed(
        p, memory, cfg, max_length=8, beam_size=3))
    np.testing.assert_array_equal(np.asarray(seqs_dp), np.asarray(seqs))
    np.testing.assert_allclose(np.asarray(scores_dp), np.asarray(scores),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(lens_dp), np.asarray(lens))
    with pytest.raises(ValueError, match="pack"):
        fn(images[:24])  # 24 % (8*2) != 0


def test_dp_greedy_serving_matches_single():
    from imagecaptioner_tpu.eval import serving as SV
    from imagecaptioner_tpu.ops import decode as D

    cfg = compact_student_config(40, embed_size=16, hidden_size=16,
                                 dropout=0.0)
    p, s = SM.student_init(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 224, 224))

    mesh = MS.create_mesh(shape=(8, 1))
    fn = SV.make_dp_greedy_captioner(p, s, cfg, mesh, max_length=8)
    toks_dp = np.asarray(jax.device_get(fn(images)))

    _, refined, _ = SM.encode_image(p, s, images, cfg, train=False)
    toks = np.asarray(jax.device_get(D.greedy_decode_student(
        p, refined, cfg, max_length=8)))
    np.testing.assert_array_equal(toks_dp, toks)
