"""Student assemblies: shapes, contract, param counts vs torchvision-known totals."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecaptioner_tpu.core import modules as M
from imagecaptioner_tpu.core.config import compact_student_config, full_student_config
from imagecaptioner_tpu.models import mobilenet, resnet, student


@pytest.fixture(scope="module")
def tiny_images():
    return jax.random.normal(jax.random.PRNGKey(0), (2, 3, 224, 224))


def test_resnet50_shapes_and_param_count(tiny_images):
    p, s = resnet.resnet50_init(jax.random.PRNGKey(0))
    # torchvision resnet50 = 25,557,032 params incl. fc(2049000) -> headless 23,508,032
    assert M.tree_size(p) + sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(s)) - M.tree_size(s) == M.tree_size(p)
    assert M.tree_size(p) == 23_508_032
    out, new_s = resnet.resnet50_apply(p, s, tiny_images, train=False)
    assert out.shape == (2, 2048, 7, 7)
    # train mode updates BN stats
    _, new_s2 = resnet.resnet50_apply(p, s, tiny_images, train=True)
    assert float(jnp.abs(new_s2["bn1"]["running_mean"]
                         - s["bn1"]["running_mean"]).max()) > 0


def test_mobilenet_v2_shapes_and_param_count(tiny_images):
    p, s = mobilenet.mobilenet_v2_init(jax.random.PRNGKey(0))
    # torchvision mobilenet_v2 = 3,504,872 incl. classifier(1281000) -> features 2,223,872
    assert M.tree_size(p) == 2_223_872
    out, _ = mobilenet.mobilenet_v2_apply(p, s, tiny_images, train=False)
    assert out.shape == (2, 1280, 7, 7)


def test_full_student_contract(tiny_images):
    cfg = full_student_config(vocab_size=100)
    p, s = student.student_init(jax.random.PRNGKey(0), cfg)
    captions = jax.random.randint(jax.random.PRNGKey(1), (6, 2), 0, 100)
    (logits, enc_feats, hiddens, attns), new_s = student.student_apply(
        p, s, tiny_images, captions, cfg, train=False)
    assert logits.shape == (6, 2, 100)
    assert enc_feats.shape == (2, 49, cfg.embed_size)
    assert hiddens.shape == (6, 2, cfg.hidden_size)
    assert attns.shape == (6, 2, 49)
    assert jnp.isfinite(logits).all()


def test_full_student_kd_taps_unrefined_features(tiny_images):
    """encoder_features must be PRE-refinement (student_model.py:301-312)."""
    cfg = full_student_config(vocab_size=50)
    p, s = student.student_init(jax.random.PRNGKey(0), cfg)
    captions = jnp.zeros((3, 2), jnp.int32)
    (_, enc_feats, _, _), _ = student.student_apply(
        p, s, tiny_images, captions, cfg, train=False)
    raw, refined, _ = student.encode_image(p, s, tiny_images, cfg, train=False)
    np.testing.assert_allclose(np.asarray(enc_feats), np.asarray(raw), atol=1e-6)
    assert np.abs(np.asarray(refined) - np.asarray(raw)).max() > 1e-3


def test_compact_student_contract(tiny_images):
    cfg = compact_student_config(vocab_size=80)
    p, s = student.student_init(jax.random.PRNGKey(0), cfg)
    captions = jax.random.randint(jax.random.PRNGKey(1), (5, 2), 0, 80)
    (logits, enc_feats, hiddens, attns), _ = student.student_apply(
        p, s, tiny_images, captions, cfg, train=False)
    assert logits.shape == (5, 2, 80)
    assert enc_feats.shape == (2, 49, cfg.embed_size)
    assert hiddens.shape == (5, 2, cfg.hidden_size)


def test_student_params_roughly_8m():
    """README claims ~8M for the full student with vocab ~3000."""
    cfg = full_student_config(vocab_size=2994)
    p, _ = student.student_init(jax.random.PRNGKey(0), cfg)
    n = student.count_parameters(p)
    assert 20e6 < n < 32e6  # ResNet-50 backbone dominates (23.5M)
    # decoder-only (what the README's 8M likely counts minus backbone)
    n_dec = M.tree_size(p["decoder"])
    assert 1e6 < n_dec < 8e6


def test_trainable_mask_freezes_backbone_prefix():
    cfg = compact_student_config(vocab_size=60)
    p, _ = student.student_init(jax.random.PRNGKey(0), cfg)
    mask = student.student_trainable_mask(p, cfg)
    feats = mask["encoder"]["backbone"]["features"]
    assert not any(jax.tree.leaves(feats[0]))
    assert not any(jax.tree.leaves(feats[9]))
    assert all(jax.tree.leaves(feats[10]))
    assert all(jax.tree.leaves(mask["decoder"]))


def test_decoder_step_matches_apply_compact(tiny_images):
    cfg = compact_student_config(vocab_size=40)
    p, s = student.student_init(jax.random.PRNGKey(0), cfg)
    captions = jax.random.randint(jax.random.PRNGKey(2), (4, 2), 0, 40)
    (logits, _, _, _), _ = student.student_apply(
        p, s, tiny_images, captions, cfg, train=False)
    from imagecaptioner_tpu.models import lstm as L
    _, refined, _ = student.encode_image(p, s, tiny_images, cfg, train=False)
    hc = L.init_hidden(cfg.num_layers, 2, cfg.hidden_size)
    for t in range(4):
        emb = M.embedding(p["decoder"]["embedding"], captions[t])
        step_logits, hc, _ = student.decoder_step(p, emb, hc, refined, cfg)
        np.testing.assert_allclose(np.asarray(step_logits), np.asarray(logits[t]),
                                   atol=1e-4, rtol=1e-4)
