"""CNN-LSTM captioning students (full ResNet-50 and compact MobileNetV2).

Reproduces ``CaptioningStudent`` (student_model.py:259-312) and
``CompactCaptioningStudent`` (student_model_compact.py:194-256): encoder ->
optional attention refinement -> LSTM decoder, returning the 4-tuple contract
``(logits (T,B,V), encoder_features (B,L,E), hidden_states (T,B,H),
attention_weights (T,B,L))`` — the KD loss taps the *unrefined* encoder
features (student_model.py:301-312), preserved here.

Models are (init, apply) pairs over parameter/state pytrees; the greedy
caption loop lives in ops/decode.py as a jitted `lax.scan` (no host
round-trips, SURVEY §3.4).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from imagecaptioner_tpu.core import modules as M
from imagecaptioner_tpu.core.config import StudentConfig
from imagecaptioner_tpu.models import lstm as L
from imagecaptioner_tpu.models import mobilenet, resnet

Params = Dict


# ---------------------------------------------------------------------------
# Encoders (CNN backbone -> (B, 49, E) token features)
# ---------------------------------------------------------------------------


def cnn_encoder_init(key, cfg: StudentConfig) -> Tuple[Params, Params]:
    """Full student: ResNet-50 -> pool 7x7 -> Linear+ReLU+Dropout+LayerNorm
    (student_model.py:8-69)."""
    k1, k2 = jax.random.split(key)
    backbone_p, backbone_s = resnet.resnet50_init(k1)
    p = {
        "resnet": backbone_p,
        "projection": {
            "fc": M.linear_init(k2, resnet.OUT_CHANNELS, cfg.embed_size),
            "ln": M.layer_norm_init(cfg.embed_size),
        },
    }
    return p, {"resnet": backbone_s}


def cnn_encoder_apply(p, s, images, cfg: StudentConfig, *, train=False,
                      rng=None) -> Tuple[jnp.ndarray, Params]:
    feats, new_bs = resnet.resnet50_apply(p["resnet"], s["resnet"], images,
                                          train=train)  # (B, 2048, 7, 7)
    feats = jnp.transpose(feats, (0, 2, 3, 1))          # NHWC
    feats = M.adaptive_avg_pool2d(feats, (7, 7))
    b = feats.shape[0]
    feats = feats.reshape(b, 49, resnet.OUT_CHANNELS)
    x = jax.nn.relu(M.dense(p["projection"]["fc"], feats))
    x = M.dropout(rng, x, 0.2, train)
    x = M.layer_norm(p["projection"]["ln"], x)
    return x, {"resnet": new_bs}


def compact_encoder_init(key, cfg: StudentConfig) -> Tuple[Params, Params]:
    """Compact student: MobileNetV2 -> pool 7x7 -> Linear+ReLU+Dropout(0.1)
    (student_model_compact.py:9-65, no LayerNorm)."""
    k1, k2 = jax.random.split(key)
    backbone_p, backbone_s = mobilenet.mobilenet_v2_init(k1)
    p = {
        "backbone": backbone_p,
        "projection": {"fc": M.linear_init(k2, mobilenet.OUT_CHANNELS,
                                           cfg.embed_size)},
    }
    return p, {"backbone": backbone_s}


def compact_encoder_apply(p, s, images, cfg: StudentConfig, *, train=False,
                          rng=None) -> Tuple[jnp.ndarray, Params]:
    feats, new_bs = mobilenet.mobilenet_v2_apply(p["backbone"], s["backbone"],
                                                 images, train=train)
    feats = jnp.transpose(feats, (0, 2, 3, 1))
    feats = M.adaptive_avg_pool2d(feats, (7, 7))
    b = feats.shape[0]
    feats = feats.reshape(b, 49, mobilenet.OUT_CHANNELS)
    x = jax.nn.relu(M.dense(p["projection"]["fc"], feats))
    x = M.dropout(rng, x, 0.1, train)
    return x, {"backbone": new_bs}


# ---------------------------------------------------------------------------
# Attention refinement (student_model.py:72-118)
# ---------------------------------------------------------------------------


def attention_refinement_init(key, embed_size: int, num_heads: int = 4) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "attention": M.mha_init(ks[0], embed_size),
        "ffn": {
            "fc1": M.linear_init(ks[1], embed_size, embed_size * 2),
            "fc2": M.linear_init(ks[2], embed_size * 2, embed_size),
        },
        "norm1": M.layer_norm_init(embed_size),
        "norm2": M.layer_norm_init(embed_size),
    }


def attention_refinement_apply(p, feats, *, num_heads=4, train=False, rng=None):
    r1, r2, r3 = M.split_rngs(rng, 3)
    attn_out, _ = M.multi_head_attention(
        p["attention"], feats, feats, feats, num_heads=num_heads,
        dropout_rate=0.1, train=train, rng=r1)
    feats = M.layer_norm(p["norm1"], feats + attn_out)
    h = jax.nn.relu(M.dense(p["ffn"]["fc1"], feats))
    h = M.dropout(r2, h, 0.1, train)
    h = M.dense(p["ffn"]["fc2"], h)
    return M.layer_norm(p["norm2"], feats + h)


def compact_refinement_init(key, embed_size: int) -> Params:
    """Compact variant: inline 4-head MHA + LayerNorm only
    (student_model_compact.py:211-218)."""
    k1 = key
    return {"attention": M.mha_init(k1, embed_size),
            "norm": M.layer_norm_init(embed_size)}


def compact_refinement_apply(p, feats, *, train=False, rng=None):
    attn_out, _ = M.multi_head_attention(
        p["attention"], feats, feats, feats, num_heads=4,
        dropout_rate=0.1, train=train, rng=rng)
    return M.layer_norm(p["norm"], feats + attn_out)


# ---------------------------------------------------------------------------
# Full assemblies
# ---------------------------------------------------------------------------


def student_init(key, cfg: StudentConfig) -> Tuple[Params, Params]:
    """Dispatch on cfg.variant ('full' | 'compact' | 'enhanced')."""
    if cfg.variant == "enhanced":
        from imagecaptioner_tpu.models import student_enhanced as SE

        return SE.enhanced_student_init(key, cfg)
    k_enc, k_ref, k_dec = jax.random.split(key, 3)
    if cfg.variant == "full":
        enc_p, enc_s = cnn_encoder_init(k_enc, cfg)
        p = {"encoder": enc_p, "decoder": L.full_decoder_init(k_dec, cfg)}
        if cfg.use_attention_refinement:
            p["attention_refinement"] = attention_refinement_init(
                k_ref, cfg.embed_size)
        return p, enc_s
    elif cfg.variant == "compact":
        enc_p, enc_s = compact_encoder_init(k_enc, cfg)
        p = {"encoder": enc_p, "decoder": L.compact_decoder_init(k_dec, cfg)}
        if cfg.use_attention_refinement:
            p["attention_refinement"] = compact_refinement_init(
                k_ref, cfg.embed_size)
        return p, enc_s
    else:
        raise ValueError(f"unknown student variant: {cfg.variant}")


def encode_image(p, s, images, cfg: StudentConfig, *, train=False, rng=None,
                 refine: bool = True):
    """Encoder (+ optional refinement). Returns (raw_features,
    refined_features, new_state).

    For 'enhanced', "raw" is the compressed-refined KD tap (the reference's
    contract differs there, student_model_enhanced.py:440-445)."""
    if cfg.variant == "enhanced":
        from imagecaptioner_tpu.models import student_enhanced as SE

        refined, compressed, new_s = SE.enhanced_encode(
            p, s, images, cfg, train=train, rng=rng)
        return compressed, refined, new_s
    r1, r2 = M.split_rngs(rng, 2)
    if cfg.variant == "full":
        raw, new_s = cnn_encoder_apply(p["encoder"], s, images, cfg,
                                       train=train, rng=r1)
        refined = raw
        if refine and cfg.use_attention_refinement:
            refined = attention_refinement_apply(
                p["attention_refinement"], raw, train=train, rng=r2)
    else:
        raw, new_s = compact_encoder_apply(p["encoder"], s, images, cfg,
                                           train=train, rng=r1)
        refined = raw
        if refine and cfg.use_attention_refinement:
            refined = compact_refinement_apply(
                p["attention_refinement"], raw, train=train, rng=r2)
    return raw, refined, new_s


def student_apply(
    p: Params, s: Params, images: jnp.ndarray, captions: jnp.ndarray,
    cfg: StudentConfig, *, train: bool = False, rng: Optional[jax.Array] = None,
):
    """Returns ((logits, encoder_features, hidden_states, attention_weights),
    new_state) — the reference 4-tuple with the *unrefined* feature tap."""
    if cfg.variant == "enhanced":
        from imagecaptioner_tpu.models import student_enhanced as SE

        return SE.enhanced_student_apply(p, s, images, captions, cfg,
                                         train=train, rng=rng)
    r_enc, r_dec = M.split_rngs(rng, 2)
    raw, refined, new_s = encode_image(p, s, images, cfg, train=train, rng=r_enc)
    if cfg.variant == "full":
        if cfg.decoder_impl == "pallas" and cfg.num_layers == 2:
            from imagecaptioner_tpu.ops.pallas_lstm import (
                pallas_full_decoder_scan_train)

            logits, hiddens, attns = pallas_full_decoder_scan_train(
                p["decoder"], refined, captions, cfg, train=train, rng=r_dec)
        else:
            logits, hiddens, attns = L.full_decoder_apply(
                p["decoder"], refined, captions, cfg, train=train, rng=r_dec)
    else:
        if cfg.decoder_impl == "pallas" and cfg.num_layers == 1:
            from imagecaptioner_tpu.ops.pallas_lstm import (
                pallas_compact_decoder_scan_train)

            logits, hiddens, attns = pallas_compact_decoder_scan_train(
                p["decoder"], refined, captions, cfg, train=train, rng=r_dec)
        else:
            logits, hiddens, attns = L.compact_decoder_apply(
                p["decoder"], refined, captions, cfg, train=train, rng=r_dec)
    return (logits, raw, hiddens, attns), new_s


def decoder_step(p, word_emb, hc, feats, cfg: StudentConfig):
    """Single recurrence step + vocab logits — used by the decode loops."""
    if cfg.variant == "enhanced":
        from imagecaptioner_tpu.models import student_enhanced as SE

        h_top, enh, hc_new, attn = SE.enhanced_decoder_step(
            p["decoder"], word_emb, hc, feats, cfg)
        logits = SE.enhanced_output_projection(p["decoder"], enh, cfg)
        return logits, hc_new, attn
    if cfg.variant == "full":
        h_top, hc_new, attn = L.full_decoder_step(p["decoder"], word_emb, hc,
                                                  feats, cfg)
        logits = L.output_projection(p["decoder"]["output_projection"], h_top,
                                     cfg)
    else:
        h_top, hc_new, attn = L.compact_decoder_step(p["decoder"], word_emb,
                                                     hc, feats, cfg)
        logits = M.dense(p["decoder"]["output_projection"], h_top)
    return logits, hc_new, attn


def student_trainable_mask(p: Params, cfg: StudentConfig) -> Params:
    """Trainability pytree: frozen backbone prefixes per reference."""
    if cfg.variant == "enhanced":
        from imagecaptioner_tpu.models import student_enhanced as SE

        return SE.enhanced_student_trainable_mask(p, cfg)
    mask = jax.tree.map(lambda _: True, p)
    if not cfg.freeze_backbone:
        return mask
    if cfg.variant == "full":
        mask["encoder"]["resnet"] = resnet.resnet50_trainable_mask(
            p["encoder"]["resnet"])
    else:
        mask["encoder"]["backbone"] = mobilenet.mobilenet_v2_trainable_mask(
            p["encoder"]["backbone"])
    return mask


def count_parameters(p: Params) -> int:
    return M.tree_size(p)
