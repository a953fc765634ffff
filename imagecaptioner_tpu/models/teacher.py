"""CaptioningTeacher: ViT-S/16 encoder + transformer decoder.

Reproduces teacher_model.py:30-106 — encoder features projected 384 -> embed,
caption embeddings (U(-0.1,0.1) init) + sinusoidal PE + dropout, causal-masked
post-LN transformer decoder (ffn = 2 x embed), pre-output LayerNorm + dropout
+ xavier-init output head.  Production config 512/8/4/0.15 (SURVEY §2.2).

forward: images (B,3,224,224) NCHW + captions (T,B) time-major -> logits
(T,B,V).  Beam-search decode lives in ops/decode.py (fixed-width, KV-cached,
on-device — replacing the reference's per-step full-prefix host loop).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from imagecaptioner_tpu.core import modules as M
from imagecaptioner_tpu.core.config import TeacherConfig
from imagecaptioner_tpu.models import transformer as TD
from imagecaptioner_tpu.models import vit

Params = Dict


def teacher_init(key, cfg: TeacherConfig) -> Params:
    ks = jax.random.split(key, 5)
    p: Params = {
        "encoder": vit.vit_init(ks[0], cfg),
        "embedding": M.embedding_init(ks[1], cfg.vocab_size, cfg.embed_size),
        "decoder": TD.decoder_init(ks[2], cfg.embed_size,
                                   cfg.num_decoder_layers, 2 * cfg.embed_size),
        "pre_output_norm": M.layer_norm_init(cfg.embed_size),
        "fc_out": {
            "weight": M.xavier_uniform(ks[3], (cfg.vocab_size, cfg.embed_size)),
            "bias": jnp.zeros((cfg.vocab_size,)),
        },
    }
    if cfg.encoder_dim != cfg.embed_size:
        p["encoder_projection"] = M.linear_init(ks[4], cfg.encoder_dim,
                                                cfg.embed_size)
    return p


def encode_image(p: Params, images: jnp.ndarray, cfg: TeacherConfig, *,
                 train: bool = False, rng: Optional[jax.Array] = None
                 ) -> jnp.ndarray:
    """ViT features + projection -> memory (B, 197, embed_size).

    Single pass — the reference's TeacherWrapper re-ran the encoder to tap
    features (distillation_utils.py:278-283); here the same memory serves the
    decoder and the KD tap (same outputs, half the encoder FLOPs)."""
    feats = vit.vit_forward_features(p["encoder"], images, cfg, train=train,
                                     rng=rng)
    if "encoder_projection" in p:
        feats = M.dense(p["encoder_projection"], feats)
    return feats


_PE_CACHE: Dict[Tuple[int, int], "object"] = {}


def _pe(cfg: TeacherConfig) -> jnp.ndarray:
    key = (cfg.max_pe_len, cfg.embed_size)
    if key not in _PE_CACHE:
        # cache host-side (numpy) so a table built during a jit trace can
        # never leak a tracer into later calls
        import numpy as _np

        _PE_CACHE[key] = _np.asarray(M.sinusoidal_positional_encoding(*key))
    return jnp.asarray(_PE_CACHE[key])


def embed_captions(p: Params, captions_tb: jnp.ndarray, cfg: TeacherConfig, *,
                   train: bool = False, rng: Optional[jax.Array] = None,
                   position_offset: int = 0) -> jnp.ndarray:
    """(T, B) -> (B, T, E) with sinusoidal PE + dropout (teacher_model.py:87-88)."""
    T = captions_tb.shape[0]
    emb = M.embedding(p["embedding"], captions_tb.T)  # (B, T, E)
    pe = jax.lax.dynamic_slice_in_dim(_pe(cfg), position_offset, T, axis=0)
    emb = emb + pe[None, :, :].astype(emb.dtype)
    return M.dropout(rng, emb, cfg.dropout, train)


def teacher_apply(
    p: Params, images: jnp.ndarray, captions: jnp.ndarray, cfg: TeacherConfig,
    *, train: bool = False, rng: Optional[jax.Array] = None,
    memory: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full forward -> logits (T, B, V).  Pass ``memory`` to reuse a
    precomputed encoding (KD step computes it once)."""
    from imagecaptioner_tpu.parallel import sp

    r_enc, r_emb, r_dec, r_out = M.split_rngs(rng, 4)
    if memory is None:
        memory = encode_image(p, images, cfg, train=train, rng=r_enc)
    memory = sp.shard_seq(memory, 1)          # (B, L, E): token axis
    x = embed_captions(p, captions, cfg, train=train, rng=r_emb)  # (B,T,E)
    x = sp.shard_seq(x, 1)                    # caption time axis
    T = captions.shape[0]
    x = TD.decoder_apply(p["decoder"], x, memory, num_heads=cfg.num_heads,
                         tgt_mask=M.causal_mask(T), dropout=cfg.dropout,
                         train=train, rng=r_dec, tgt_causal=True)
    x = M.layer_norm(p["pre_output_norm"], x)
    x = M.dropout(r_out, x, cfg.dropout, train)
    logits = M.dense(p["fc_out"], x)  # (B, T, V)
    return jnp.transpose(logits, (1, 0, 2))  # time-major (T, B, V)


def teacher_trainable_mask(p: Params, cfg: TeacherConfig) -> Params:
    """Encoder partially frozen (blocks 8-11 + norm trainable); decoder fully
    trainable (teacher_model.py:43-47)."""
    mask = jax.tree.map(lambda _: True, p)
    mask["encoder"] = vit.vit_trainable_mask(p["encoder"], cfg)
    return mask


def count_parameters(p: Params) -> int:
    return M.tree_size(p)
