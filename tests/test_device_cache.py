"""Device-resident dataset (data/device_cache.py) + chained device-data
train step (train/steps.make_device_data_step).

Contract: batches gathered in-graph from the HBM-resident rows are
IDENTICAL to what the host BatchLoader + accumulation stacking would have
produced for the same indices, and the chained step is step-for-step
equal to feeding the underlying train step directly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from imagecaptioner_tpu.data.dataset import CaptionDataset
from imagecaptioner_tpu.data.device_cache import DeviceDataset, gather_batch
from imagecaptioner_tpu.data.loader import BatchLoader
from imagecaptioner_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("devcache_synth")
    make_synthetic_dataset(str(root), n_images=24, captions_per_image=2,
                           image_size=64, seed=0)
    ds = CaptionDataset(str(root), f"{root}/captions_clean.csv",
                        freq_threshold=1, image_size=64)
    return ds


def test_rows_match_dataset(synth):
    dd = DeviceDataset(synth, max_caption_len=16)
    assert dd.n == len(synth)
    imgs = np.asarray(dd.arrays["images"])
    caps = np.asarray(dd.arrays["captions"])
    lens = np.asarray(dd.arrays["lengths"])
    for i in (0, 7, len(synth) - 1):
        np.testing.assert_array_equal(imgs[i], synth.load_image(i))
        t = synth.encode_caption(i)[:16]
        assert list(caps[i, : len(t)]) == t
        assert (caps[i, len(t):] == 0).all()
        assert lens[i] == len(t)


def test_budget_refusal(synth):
    with pytest.raises(ValueError, match="budget"):
        DeviceDataset(synth, max_caption_len=16, byte_budget=1024)


def test_epoch_indices_semantics(synth):
    dd = DeviceDataset(synth, max_caption_len=16)
    dd.seed(3)
    # reference batch cap: asking for 32 yields 16-wide batches
    idx = dd.epoch_indices(batch_size=32, accumulation_steps=2)
    n_batches = len(synth) // 16
    assert idx.shape == (n_batches // 2, 2, 16)
    flat = idx.reshape(-1)
    assert len(set(flat.tolist())) == len(flat)  # no repeats within epoch
    # deterministic under the same seed, different across epochs
    dd.seed(3)
    idx2 = dd.epoch_indices(batch_size=32, accumulation_steps=2)
    np.testing.assert_array_equal(idx, idx2)
    idx3 = dd.epoch_indices(batch_size=32, accumulation_steps=2)
    assert not np.array_equal(idx, idx3)
    with pytest.raises(ValueError, match="drop_last"):
        dd.epoch_indices(batch_size=8, drop_last=False)


def test_gather_matches_host_loader(synth):
    dd = DeviceDataset(synth, max_caption_len=16)
    loader = BatchLoader(synth, batch_size=8, max_caption_len=16,
                         shuffle=False, batch_size_cap=16, num_workers=1)
    idxs = np.arange(16).reshape(2, 8).astype(np.int32)  # (A=2, B=8)
    host = [loader._make_batch(idxs[a]) for a in range(2)]
    stacked = {k: np.stack([b[k] for b in host]) for k in host[0]}
    dev = jax.device_get(gather_batch(dd.arrays, jnp.asarray(idxs)))
    np.testing.assert_array_equal(dev["images"], stacked["images"])
    np.testing.assert_array_equal(dev["captions"], stacked["captions"])
    np.testing.assert_array_equal(dev["lengths"], stacked["lengths"])


def test_chained_step_matches_direct(synth):
    """make_device_data_step(K) == K direct train_step calls with the same
    batches, schedule points, and (identically split) rng keys."""
    from imagecaptioner_tpu.core.config import (DistillConfig, KDTrainConfig,
                                                TeacherConfig,
                                                full_student_config)
    from imagecaptioner_tpu.distill.projector import create_feature_projectors
    from imagecaptioner_tpu.models import student as SM
    from imagecaptioner_tpu.models import teacher as TM
    from imagecaptioner_tpu.train import optim as O, steps

    V = len(synth.vocab)
    t_cfg = TeacherConfig(vocab_size=V, embed_size=32, num_heads=4,
                          num_decoder_layers=2, dropout=0.0, encoder_dim=24,
                          encoder_depth=2, encoder_heads=3, image_size=64,
                          patch_size=16)
    s_cfg = full_student_config(V, embed_size=16, hidden_size=16,
                                dropout=0.0, image_size=64)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    tp = TM.teacher_init(k1, t_cfg)
    sp, ss = SM.student_init(k2, s_cfg)
    proj, _ = create_feature_projectors(
        k3, teacher_embed=32, student_embed=16, student_hidden=16,
        student_seq_len=s_cfg.feature_tokens, teacher_seq_len=t_cfg.num_tokens)
    tr = KDTrainConfig(batch_size=4, accumulation_steps=1)
    train_step = steps.make_kd_train_step(t_cfg, s_cfg, DistillConfig(), tr,
                                          compute_dtype=jnp.float32)
    params = {"student": sp, "projectors": proj}

    dd = DeviceDataset(synth, max_caption_len=16)
    K = 2
    idx_k = jnp.asarray(
        np.arange(K * 4, dtype=np.int32).reshape(K, 1, 4))
    rng = jax.random.PRNGKey(7)
    sched0, dsched = jnp.float32(0.25), jnp.float32(0.125)

    def fresh_state():
        p = jax.tree.map(jnp.copy, params)
        return steps.TrainState(p, O.adamw_init(p),
                                jax.tree.map(jnp.copy, ss))

    chained = steps.make_device_data_step(train_step, K)
    st_c, ms = chained(fresh_state(), tp, dd.arrays, idx_k, sched0, dsched,
                       jnp.int32(0), rng)

    st_d = fresh_state()
    keys = jax.random.split(rng, K)
    direct = []
    for i in range(K):
        batch = jax.device_get(gather_batch(dd.arrays, idx_k[i]))
        st_d, m = train_step(st_d, tp, batch,
                             sched0 + dsched * jnp.float32(i),
                             jnp.int32(0), keys[i])
        direct.append(jax.device_get(m))

    ms = jax.device_get(ms)
    for i in range(K):
        for k in ("total_loss", "ce_loss", "token_kd_loss", "grad_norm"):
            np.testing.assert_allclose(ms[k][i], direct[i][k],
                                       rtol=2e-5, atol=2e-6)
    for a, b in zip(jax.tree.leaves(st_c.params),
                    jax.tree.leaves(st_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_chained_step_dp_matches_single_device(synth):
    """The device-resident pipeline composes with data parallelism: the same
    chained steps over an 8-device DP mesh (rows replicated, batch
    constrained over 'data') produce the same losses and parameters as the
    single-device path."""
    from imagecaptioner_tpu.core import mesh as MS
    from imagecaptioner_tpu.core.config import (DistillConfig, KDTrainConfig,
                                                TeacherConfig,
                                                full_student_config)
    from imagecaptioner_tpu.distill.projector import create_feature_projectors
    from imagecaptioner_tpu.models import student as SM
    from imagecaptioner_tpu.models import teacher as TM
    from imagecaptioner_tpu.train import optim as O, steps

    if len(jax.devices()) < 2:
        pytest.skip("needs the multi-device CPU mesh")

    V = len(synth.vocab)
    t_cfg = TeacherConfig(vocab_size=V, embed_size=32, num_heads=4,
                          num_decoder_layers=2, dropout=0.0, encoder_dim=24,
                          encoder_depth=2, encoder_heads=3, image_size=64,
                          patch_size=16)
    s_cfg = full_student_config(V, embed_size=16, hidden_size=16,
                                dropout=0.0, image_size=64)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    tp = TM.teacher_init(k1, t_cfg)
    sp, ss = SM.student_init(k2, s_cfg)
    proj, _ = create_feature_projectors(
        k3, teacher_embed=32, student_embed=16, student_hidden=16,
        student_seq_len=s_cfg.feature_tokens, teacher_seq_len=t_cfg.num_tokens)
    tr = KDTrainConfig(batch_size=8, accumulation_steps=1)
    train_step = steps.make_kd_train_step(t_cfg, s_cfg, DistillConfig(), tr,
                                          compute_dtype=jnp.float32)
    params = {"student": sp, "projectors": proj}
    K = 2
    idx_k = jnp.asarray(np.arange(K * 8, dtype=np.int32).reshape(K, 1, 8))
    rng = jax.random.PRNGKey(7)
    sched0, dsched = jnp.float32(0.25), jnp.float32(0.125)

    def fresh_state():
        p = jax.tree.map(jnp.copy, params)
        return steps.TrainState(p, O.adamw_init(p),
                                jax.tree.map(jnp.copy, ss))

    dd1 = DeviceDataset(synth, max_caption_len=16)
    st1, ms1 = steps.make_device_data_step(train_step, K)(
        fresh_state(), tp, dd1.arrays, idx_k, sched0, dsched,
        jnp.int32(0), rng)
    ms1 = jax.device_get(ms1)

    mesh = MS.create_mesh()
    dd8 = DeviceDataset(synth, max_caption_len=16, mesh=mesh)
    # replicated rows really are replicated over every device
    assert dd8.arrays["images"].sharding.is_fully_replicated
    st8 = steps.TrainState(MS.replicate(mesh, fresh_state().params),
                           MS.replicate(mesh, O.adamw_init(params)),
                           MS.replicate(mesh, ss))
    tp8 = MS.replicate(mesh, tp)
    st8, ms8 = steps.make_device_data_step(train_step, K, mesh)(
        st8, tp8, dd8.arrays, idx_k, sched0, dsched, jnp.int32(0), rng)
    ms8 = jax.device_get(ms8)

    # DP gradients psum in a different reduction order than the single-device
    # sum; the reassociation noise compounds through the optimizer into the
    # step-2 gradients (measured ~1.6e-4 relative on the losses, ~2.6e-3 on
    # the far more sensitive global grad norm)
    for k in ("total_loss", "ce_loss", "token_kd_loss"):
        np.testing.assert_allclose(ms8[k], ms1[k], rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(ms8["grad_norm"], ms1["grad_norm"],
                               rtol=1e-2, atol=1e-5)
    # param atol ~ half an adam step: adam divides by sqrt(nu), so elements
    # with near-zero gradients turn reduction-order noise into an O(lr)
    # update difference (observed 7.6e-5 abs on ~3e-4 params after 2 steps)
    for a, b in zip(jax.tree.leaves(st8.params), jax.tree.leaves(st1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1.5e-4)


def test_flatten_step_metrics():
    from imagecaptioner_tpu.train import common

    flat = common.flatten_step_metrics([
        {"a": np.asarray([1.0, 2.0]), "b": np.asarray([3.0, 4.0])},
        {"a": np.float32(5.0), "b": np.float32(6.0)},
    ])
    assert [float(m["a"]) for m in flat] == [1.0, 2.0, 5.0]
    assert [float(m["b"]) for m in flat] == [3.0, 4.0, 6.0]
