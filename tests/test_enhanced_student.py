"""Enhanced student: EfficientNet-B3 backbone + gated/highway LSTM decoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecaptioner_tpu.core import modules as M
from imagecaptioner_tpu.core.config import enhanced_student_config
from imagecaptioner_tpu.models import efficientnet as EN
from imagecaptioner_tpu.models import student as SM
from imagecaptioner_tpu.models import student_enhanced as SE
from imagecaptioner_tpu.ops import decode as D

V = 60


def test_efficientnet_b3_shapes_and_param_count():
    p, s = EN.efficientnet_b3_init(jax.random.PRNGKey(0))
    # torchvision efficientnet_b3 = 12,233,232 incl. classifier
    # (1536*1000+1000 = 1,537,000) -> features = 10,696,232
    n = M.tree_size(p)
    assert n == 10_696_232, n
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 224, 224))
    out, _ = EN.efficientnet_b3_apply(p, s, x, train=False)
    assert out.shape == (1, 1536, 7, 7)


def test_efficientnet_trainable_mask():
    p, _ = EN.efficientnet_b3_init(jax.random.PRNGKey(0))
    mask = EN.efficientnet_b3_trainable_mask(p)
    assert not any(jax.tree.leaves(mask["stem"]))
    assert not any(jax.tree.leaves(mask["stages"][0]))
    assert all(jax.tree.leaves(mask["stages"][5]))
    assert all(jax.tree.leaves(mask["head"]))


@pytest.fixture(scope="module")
def tiny_enhanced():
    cfg = enhanced_student_config(V, embed_size=32, hidden_size=48,
                                  num_layers=2, dropout=0.0)
    p, s = SM.student_init(jax.random.PRNGKey(0), cfg)
    images = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 224, 224))
    return cfg, p, s, images


def test_enhanced_contract(tiny_enhanced):
    cfg, p, s, images = tiny_enhanced
    captions = jax.random.randint(jax.random.PRNGKey(2), (5, 2), 0, V)
    (logits, feats, hiddens, attns), new_s = SM.student_apply(
        p, s, images, captions, cfg, train=False)
    assert logits.shape == (5, 2, V)
    assert feats.shape == (2, 64, cfg.embed_size)   # 8x8 tokens, compressed
    assert hiddens.shape == (5, 2, cfg.hidden_size)
    assert attns.shape == (5, 2, 64)
    assert jnp.isfinite(logits).all()


def test_enhanced_kd_tap_is_compressed(tiny_enhanced):
    """encoder_features = feature_compressor(refined) (:440-445)."""
    cfg, p, s, images = tiny_enhanced
    captions = jnp.zeros((3, 2), jnp.int32)
    (_, feats, _, _), _ = SM.student_apply(p, s, images, captions, cfg)
    refined, compressed, _ = SE.enhanced_encode(p, s, images, cfg)
    np.testing.assert_allclose(np.asarray(feats), np.asarray(compressed),
                               atol=1e-6)
    assert np.abs(np.asarray(refined) - np.asarray(compressed)).max() > 1e-4


def test_enhanced_greedy_decode_with_positions(tiny_enhanced):
    cfg, p, s, images = tiny_enhanced
    _, refined, _ = SM.encode_image(p, s, images, cfg, train=False)
    toks = D.greedy_decode_student(p, refined, cfg, max_length=8)
    assert toks.shape == (2, 8)

    # stepwise oracle with per-step positional encoding
    from imagecaptioner_tpu.data.vocabulary import END, PAD, START
    from imagecaptioner_tpu.models import lstm as L

    for b in range(2):
        hc = L.init_hidden(cfg.num_layers, 1, cfg.hidden_size)
        tok = jnp.array([START], jnp.int32)
        expected = []
        fb = refined[b:b + 1]
        for t in range(8):
            emb = M.embedding(p["decoder"]["embedding"], tok)
            emb = emb + p["decoder"]["pos_encoding"][:, t, :]
            logits, hc, _ = SM.decoder_step(p, emb, hc, fb, cfg)
            nxt = int(jnp.argmax(logits.astype(jnp.float32), -1)[0])
            if nxt == END:
                break
            expected.append(nxt)
            tok = jnp.array([nxt], jnp.int32)
        got = [int(t) for t in np.asarray(toks[b]) if t != PAD]
        assert got == expected


def test_enhanced_step_matches_apply(tiny_enhanced):
    cfg, p, s, images = tiny_enhanced
    captions = jax.random.randint(jax.random.PRNGKey(3), (4, 2), 0, V)
    (logits, _, _, _), _ = SM.student_apply(p, s, images, captions, cfg)
    _, refined, _ = SM.encode_image(p, s, images, cfg)
    from imagecaptioner_tpu.models import lstm as L

    hc = L.init_hidden(cfg.num_layers, 2, cfg.hidden_size)
    for t in range(4):
        emb = M.embedding(p["decoder"]["embedding"], captions[t])
        emb = emb + p["decoder"]["pos_encoding"][0, t]
        step_logits, hc, _ = SM.decoder_step(p, emb, hc, refined, cfg)
        np.testing.assert_allclose(np.asarray(step_logits),
                                   np.asarray(logits[t]), atol=1e-4,
                                   rtol=1e-3)


def test_enhanced_production_param_count():
    cfg = enhanced_student_config(2994)
    p, _ = SM.student_init(jax.random.PRNGKey(0), cfg)
    n = M.tree_size(p)
    # OPTIMIZATION_GUIDE claims 12-15M but the architecture it describes is
    # bigger: backbone 10.7M + 3x768 LSTM stack ~13M + refinement/gates.
    # The torch reference would weigh the same; the claim is loose.
    assert 25e6 < n < 40e6, n
