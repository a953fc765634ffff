"""Enhanced CNN-LSTM student (student_model_enhanced.py semantics).

EfficientNet-B3 encoder with a spatial-attention gate and 8x8=64 tokens,
2-layer CrossAttentionRefinement with learned positions + global context,
3-layer LSTMCell stack with per-layer LayerNorm/Dropout, gated word/context
fusion, highway output gate, and a feature_compressor whose output is the KD
tap (student_model_enhanced.py:412-445 — note: unlike the other students, the
KD features here are compressed *refined* features).

Reference bugs fixed (the model is advertised but never trained — SURVEY §2.5
— and cannot run as shipped):
  * ``enhanced_attention`` constructs a fresh untrained ``nn.Linear`` inside
    forward when hidden != embed (:279-282) -> a learned ``query_projection``.
  * the highway gate mixes (B, hidden) with (B, embed) which broadcast-crashes
    at the 768/384 defaults (:356-359) -> a learned context->hidden projection.
  * the EfficientNet wrapper keeps avgpool, collapsing features to 1x1
    (:25) -> real (B, 1536, 7, 7) features (models/efficientnet.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from imagecaptioner_tpu.core import modules as M
from imagecaptioner_tpu.core.config import StudentConfig
from imagecaptioner_tpu.models import efficientnet as EN
from imagecaptioner_tpu.models import lstm as L

Params = Dict
MAX_POS = 50  # learned sequence positions (:194)


# ---------------------------------------------------------------------------
# Encoder (:10-98)
# ---------------------------------------------------------------------------


def enhanced_encoder_init(key, cfg: StudentConfig) -> Tuple[Params, Params]:
    ks = jax.random.split(key, 5)
    backbone_p, backbone_s = EN.efficientnet_b3_init(ks[0])
    feature_dim = EN.OUT_CHANNELS
    p = {
        "backbone": backbone_p,
        "spatial_attention": {
            "conv1": M.conv2d_init(ks[1], feature_dim, feature_dim // 8, 1),
            "conv2": M.conv2d_init(ks[2], feature_dim // 8, 1, 1),
        },
        "projection": {
            "fc1": M.linear_init(ks[3], feature_dim, cfg.embed_size * 2),
            "fc2": M.linear_init(ks[4], cfg.embed_size * 2, cfg.embed_size),
            "ln": M.layer_norm_init(cfg.embed_size),
        },
    }
    return p, {"backbone": backbone_s}


def enhanced_encoder_apply(p, s, images, cfg: StudentConfig, *, train=False,
                           rng=None) -> Tuple[jnp.ndarray, Params]:
    feats, new_bs = EN.efficientnet_b3_apply(p["backbone"], s["backbone"],
                                             images, train=train)
    x = jnp.transpose(feats, (0, 2, 3, 1))  # NHWC
    attn = jax.nn.gelu(M.conv2d(p["spatial_attention"]["conv1"], x),
                       approximate=False)
    attn = jax.nn.sigmoid(M.conv2d(p["spatial_attention"]["conv2"], attn))
    x = x * attn
    x = M.adaptive_avg_pool2d(x, (8, 8))
    b = x.shape[0]
    x = x.reshape(b, 64, EN.OUT_CHANNELS)
    h = jax.nn.gelu(M.dense(p["projection"]["fc1"], x), approximate=False)
    h = M.dropout(rng, h, 0.1, train)
    h = M.dense(p["projection"]["fc2"], h)
    h = M.layer_norm(p["projection"]["ln"], h)
    return h, {"backbone": new_bs}


# ---------------------------------------------------------------------------
# CrossAttentionRefinement (:101-174)
# ---------------------------------------------------------------------------


def cross_refinement_init(key, embed_size: int, num_layers: int = 2) -> Params:
    ks = jax.random.split(key, 3 * num_layers + 3)
    p: Params = {
        "pos_encoding": 0.02 * jax.random.normal(ks[0], (1, 64, embed_size)),
        "layers": [],
        "global_context": {
            "fc1": M.linear_init(ks[1], embed_size, embed_size),
            "fc2": M.linear_init(ks[2], embed_size, embed_size),
        },
    }
    for i in range(num_layers):
        k0, k1, k2 = ks[3 + 3 * i: 6 + 3 * i]
        p["layers"].append({
            "attention": M.mha_init(k0, embed_size),
            "ffn": {"fc1": M.linear_init(k1, embed_size, embed_size * 4),
                    "fc2": M.linear_init(k2, embed_size * 4, embed_size)},
            "norm1": M.layer_norm_init(embed_size),
            "norm2": M.layer_norm_init(embed_size),
        })
    return p


def cross_refinement_apply(p, feats, *, num_heads=8, train=False, rng=None):
    x = feats + p["pos_encoding"].astype(feats.dtype)
    keys = M.split_rngs(rng, 2 * len(p["layers"]))
    for i, lp in enumerate(p["layers"]):
        attn, _ = M.multi_head_attention(
            lp["attention"], x, x, x, num_heads=num_heads, dropout_rate=0.1,
            train=train, rng=keys[2 * i])
        x = M.layer_norm(lp["norm1"], x + attn)
        h = jax.nn.gelu(M.dense(lp["ffn"]["fc1"], x), approximate=False)
        h = M.dropout(keys[2 * i + 1], h, 0.1, train)
        h = M.dense(lp["ffn"]["fc2"], h)
        x = M.layer_norm(lp["norm2"], x + h)
    # global context branch (:141-147,171-172)
    g = jnp.mean(x, axis=1)  # AdaptiveAvgPool1d(1) over tokens
    g = jax.nn.gelu(M.dense(p["global_context"]["fc1"], g), approximate=False)
    g = M.dense(p["global_context"]["fc2"], g)
    return x + g[:, None, :]


# ---------------------------------------------------------------------------
# Enhanced decoder (:177-371)
# ---------------------------------------------------------------------------


def enhanced_decoder_init(key, cfg: StudentConfig) -> Params:
    ks = jax.random.split(key, 10)
    e, h, v = cfg.embed_size, cfg.hidden_size, cfg.vocab_size
    p: Params = {
        "embedding": M.embedding_init(ks[0], v, e),
        "pos_encoding": 0.02 * jax.random.normal(ks[1], (1, MAX_POS, e)),
        "image_attention": M.mha_init(ks[2], e),
        "query_projection": M.linear_init(ks[3], h, e),  # bug fix (:279-282)
        "attention_gate": M.linear_init(ks[4], 2 * e, e),
        "lstm": L.lstm_stack_init(ks[5], e, h, cfg.num_layers),
        "lstm_norms": [M.layer_norm_init(h) for _ in range(cfg.num_layers)],
        "highway_gate": M.linear_init(ks[6], h + e, h),
        "highway_context_projection": M.linear_init(ks[7], e, h),  # bug fix
        "output_projection": {
            "fc1": M.linear_init(ks[8], h, e),
            "fc2": M.linear_init(ks[9], e, v),
        },
    }
    return p


def _enhanced_attention(p, h_top, feats, *, train=False, rng=None):
    """MHA image attention with the fixed learned query projection."""
    q = M.dense(p["query_projection"], h_top)[:, None, :]  # (B, 1, E)
    ctx, w = M.multi_head_attention(
        p["image_attention"], q, feats, feats, num_heads=8, dropout_rate=0.1,
        train=train, rng=rng, need_weights=True)
    return ctx[:, 0, :], w[:, 0, :]


def enhanced_decoder_step(p, word_emb, hc, feats, cfg: StudentConfig, *,
                          train=False, rng=None):
    """One recurrence step -> (h_top, enhanced_hidden, new_hc, attn_w)."""
    h, c = hc
    r = M.split_rngs(rng, 1 + cfg.num_layers)
    context, attn_w = _enhanced_attention(p, h[-1], feats, train=train,
                                          rng=r[0])
    gate = jax.nn.sigmoid(M.dense(
        p["attention_gate"], jnp.concatenate([word_emb, context], -1)))
    fused = gate * word_emb + (1.0 - gate) * context

    new_h, new_c = [], []
    inp = fused
    for li in range(cfg.num_layers):
        hi, ci = L.lstm_cell(p["lstm"][li], inp, h[li], c[li])
        hi = M.layer_norm(p["lstm_norms"][li], hi)
        hi = M.dropout(r[1 + li], hi, cfg.dropout, train)
        new_h.append(hi)
        new_c.append(ci)
        inp = hi
    h_top = new_h[-1]
    ctx_h = M.dense(p["highway_context_projection"], context)
    hw_gate = jax.nn.sigmoid(M.dense(
        p["highway_gate"], jnp.concatenate([h_top, context], -1)))
    enhanced_hidden = hw_gate * h_top + (1.0 - hw_gate) * ctx_h
    return h_top, enhanced_hidden, (jnp.stack(new_h), jnp.stack(new_c)), attn_w


def enhanced_output_projection(p, enhanced_hidden, cfg: StudentConfig, *,
                               train=False, rng=None):
    x = jax.nn.gelu(M.dense(p["output_projection"]["fc1"], enhanced_hidden),
                    approximate=False)
    x = M.dropout(rng, x, cfg.dropout, train)
    return M.dense(p["output_projection"]["fc2"], x)


def enhanced_decoder_apply(p, image_features, captions, cfg: StudentConfig, *,
                           train=False, rng=None, hidden=None,
                           _skip_pallas=False):
    T, B = captions.shape
    if (cfg.decoder_impl == "pallas" and not _skip_pallas and hidden is None
            and cfg.num_layers == 3 and cfg.embed_size % 8 == 0):
        from imagecaptioner_tpu.ops.pallas_enhanced import (
            pallas_enhanced_decoder_scan_train)

        return pallas_enhanced_decoder_scan_train(
            p, image_features, captions, cfg, train=train, rng=rng)
    if hidden is None:
        hidden = L.init_hidden(cfg.num_layers, B, cfg.hidden_size,
                               image_features.dtype)
    emb = M.embedding(p["embedding"], captions.T).astype(image_features.dtype)
    pos_len = min(T, MAX_POS)
    emb = emb.at[:, :pos_len, :].add(
        p["pos_encoding"][:, :pos_len, :].astype(emb.dtype))
    emb = jnp.transpose(emb, (1, 0, 2))  # (T, B, E)

    base_rng = rng if rng is not None else jax.random.PRNGKey(0)

    def scan_fn(carry, xs):
        emb_t, t = xs
        step_rng = jax.random.fold_in(base_rng, t) if train else None
        h_top, enh, hc_new, attn_w = enhanced_decoder_step(
            p, emb_t, carry, image_features, cfg, train=train, rng=step_rng)
        return hc_new, (h_top, enh, attn_w)

    _, (h_tops, enh, attns) = jax.lax.scan(
        scan_fn, hidden, (emb, jnp.arange(T)))
    proj_rng = jax.random.fold_in(base_rng, T) if train else None
    logits = enhanced_output_projection(p, enh, cfg, train=train,
                                        rng=proj_rng)
    return logits, h_tops, attns


# ---------------------------------------------------------------------------
# Full assembly (:374-445)
# ---------------------------------------------------------------------------


def enhanced_student_init(key, cfg: StudentConfig) -> Tuple[Params, Params]:
    ks = jax.random.split(key, 5)
    enc_p, enc_s = enhanced_encoder_init(ks[0], cfg)
    p: Params = {
        "encoder": enc_p,
        "decoder": enhanced_decoder_init(ks[1], cfg),
        "feature_compressor": {
            "fc1": M.linear_init(ks[2], cfg.embed_size, cfg.embed_size // 2),
            "fc2": M.linear_init(ks[3], cfg.embed_size // 2, cfg.embed_size),
        },
    }
    if cfg.use_attention_refinement:
        p["attention_refinement"] = cross_refinement_init(ks[4], cfg.embed_size)
    return p, enc_s


def enhanced_encode(p, s, images, cfg: StudentConfig, *, train=False, rng=None):
    """Returns (refined_features, compressed_features_for_KD, new_state)."""
    r1, r2 = M.split_rngs(rng, 2)
    raw, new_s = enhanced_encoder_apply(p["encoder"], s, images, cfg,
                                        train=train, rng=r1)
    refined = raw
    if cfg.use_attention_refinement and "attention_refinement" in p:
        refined = cross_refinement_apply(p["attention_refinement"], raw,
                                         train=train, rng=r2)
    c = jax.nn.gelu(M.dense(p["feature_compressor"]["fc1"], refined),
                    approximate=False)
    compressed = M.dense(p["feature_compressor"]["fc2"], c)
    return refined, compressed, new_s


def enhanced_student_apply(p, s, images, captions, cfg: StudentConfig, *,
                           train=False, rng=None):
    """Reference 4-tuple; note encoder_features = COMPRESSED refined features
    (:440-445), unlike the full/compact students."""
    r_enc, r_dec = M.split_rngs(rng, 2)
    refined, compressed, new_s = enhanced_encode(p, s, images, cfg,
                                                 train=train, rng=r_enc)
    logits, h_tops, attns = enhanced_decoder_apply(
        p["decoder"], refined, captions, cfg, train=train, rng=r_dec)
    return (logits, compressed, h_tops, attns), new_s


def enhanced_student_trainable_mask(p: Params, cfg: StudentConfig) -> Params:
    mask = jax.tree.map(lambda _: True, p)
    mask["encoder"]["backbone"] = EN.efficientnet_b3_trainable_mask(
        p["encoder"]["backbone"])
    return mask
