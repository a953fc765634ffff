"""ViT encoder (timm ``vit_small_patch16_224`` semantics, headless).

Replaces the timm pretrained encoder (teacher_model.py:36; SURVEY §2.9 N3):
patch-embed conv, CLS token + learned position embeddings, ``depth`` pre-norm
blocks (MHSA with qkv bias + 4x GELU MLP), final LayerNorm.
``vit_forward_features`` returns all 197 tokens — the teacher taps them as
cross-attention memory and as KD features.

Param tree mirrors timm naming (``patch_embed.proj``, ``blocks.i.attn.qkv``,
…) for straightforward pretrained-weight conversion.
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from imagecaptioner_tpu.core import modules as M
from imagecaptioner_tpu.core.config import TeacherConfig

Params = Dict


def trunc_normal(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape)


def _block_init(key, dim: int, mlp_ratio: float) -> Params:
    ks = jax.random.split(key, 4)
    hidden = int(dim * mlp_ratio)
    return {
        "norm1": M.layer_norm_init(dim),
        "attn": {
            "qkv": M.linear_init(ks[0], dim, 3 * dim),
            "proj": M.linear_init(ks[1], dim, dim),
        },
        "norm2": M.layer_norm_init(dim),
        "mlp": {
            "fc1": M.linear_init(ks[2], dim, hidden),
            "fc2": M.linear_init(ks[3], hidden, dim),
        },
    }


def _block_apply(p: Params, x: jnp.ndarray, num_heads: int, *,
                 dropout: float = 0.0, train: bool = False,
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
    b, l, d = x.shape
    head_dim = d // num_heads
    r1, r2 = M.split_rngs(rng, 2)

    # --- attention (pre-norm) ---
    h = M.layer_norm(p["norm1"], x)
    qkv = M.dense(p["attn"]["qkv"], h).reshape(b, l, 3, num_heads, head_dim)
    q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
    from imagecaptioner_tpu.ops.pallas_attention import attention_auto

    # policy + measured-shape dispatch (ops/pallas_attention.attention_auto):
    # at the 197-token teacher shapes the XLA batched GEMM beats the fused
    # kernel 3-4x (the f32 scores fit on-chip); the kernel takes over past
    # ~100 MB of scores, per-shard under the DP policy.
    attn = attention_auto(q, k, v, causal=False,
                          scale=1.0 / math.sqrt(head_dim))
    attn = attn.transpose(0, 2, 1, 3).reshape(b, l, d)
    attn = M.dense(p["attn"]["proj"], attn)
    attn = M.dropout(r1, attn, dropout, train)
    x = x + attn

    # --- MLP (pre-norm) ---
    h = M.layer_norm(p["norm2"], x)
    h = jax.nn.gelu(M.dense(p["mlp"]["fc1"], h), approximate=False)
    h = M.dense(p["mlp"]["fc2"], h)
    h = M.dropout(r2, h, dropout, train)
    return x + h


def vit_init(key, cfg: TeacherConfig) -> Params:
    ks = jax.random.split(key, cfg.encoder_depth + 3)
    d = cfg.encoder_dim
    p: Params = {
        "patch_embed": {"proj": M.conv2d_init(ks[0], 3, d, cfg.patch_size)},
        "cls_token": trunc_normal(ks[1], (1, 1, d)),
        "pos_embed": trunc_normal(ks[2], (1, cfg.num_tokens, d)),
        "blocks": [
            _block_init(ks[3 + i], d, cfg.encoder_mlp_ratio)
            for i in range(cfg.encoder_depth)
        ],
        "norm": M.layer_norm_init(d),
    }
    return p


def vit_forward_features(
    p: Params, images_nchw: jnp.ndarray, cfg: TeacherConfig, *,
    train: bool = False, rng: Optional[jax.Array] = None,
    dropout: float = 0.0,
) -> jnp.ndarray:
    """(B, 3, 224, 224) -> (B, 197, encoder_dim), final-norm applied."""
    x = jnp.transpose(images_nchw, (0, 2, 3, 1))  # NHWC
    x = M.conv2d(p["patch_embed"]["proj"], x, stride=cfg.patch_size, padding=0)
    b, hh, ww, d = x.shape
    x = x.reshape(b, hh * ww, d)
    cls = jnp.broadcast_to(p["cls_token"].astype(x.dtype), (b, 1, d))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["pos_embed"].astype(x.dtype)
    from imagecaptioner_tpu.parallel import sp

    x = sp.shard_seq(x, 1)  # sequence parallelism over the 197 patch tokens
    keys = M.split_rngs(rng, len(p["blocks"]))
    for blk, k in zip(p["blocks"], keys):
        x = _block_apply(blk, x, cfg.encoder_heads, dropout=dropout,
                         train=train, rng=k)
        x = sp.shard_seq(x, 1)
    return M.layer_norm(p["norm"], x)


def vit_trainable_mask(p: Params, cfg: TeacherConfig) -> Params:
    """Reference partial freeze (teacher_model.py:43-47): a param is
    trainable iff its timm name contains ``blocks.8``/``9``/``10``/``11``
    or ``norm`` — which unfreezes the last 4 blocks ENTIRELY plus every
    ``norm1``/``norm2`` inside the frozen early blocks plus the final norm.
    patch_embed / cls_token / pos_embed stay frozen."""
    mask = jax.tree.map(lambda _: False, p)
    for i in range(len(p["blocks"])):
        trainable = i >= cfg.encoder_depth - 4
        mask["blocks"][i] = jax.tree.map(lambda _: trainable, p["blocks"][i])
        if not trainable:  # 'norm' in name matches frozen blocks' LNs too
            mask["blocks"][i]["norm1"] = jax.tree.map(
                lambda _: True, p["blocks"][i]["norm1"])
            mask["blocks"][i]["norm2"] = jax.tree.map(
                lambda _: True, p["blocks"][i]["norm2"])
    mask["norm"] = jax.tree.map(lambda _: True, p["norm"])
    return mask
