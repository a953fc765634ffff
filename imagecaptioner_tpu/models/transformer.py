"""Transformer decoder with torch ``nn.TransformerDecoder`` semantics.

The teacher's decoder (teacher_model.py:60-67) is a stack of post-LN torch
``TransformerDecoderLayer``s (self-attn -> cross-attn -> ReLU FFN, residual
then norm, dim_feedforward = 2 x embed).  Batch-first internally — the
reference's seq-first layout is a view choice, not a numeric one.

Includes an incremental-decode path with a KV cache so beam search never
re-runs the whole prefix (the reference recomputes the full prefix per step,
teacher_model.py:156-229 — an O(T^2) host loop this replaces).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from imagecaptioner_tpu.core import modules as M

Params = Dict


def decoder_layer_init(key, d_model: int, dim_feedforward: int) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "self_attn": M.mha_init(ks[0], d_model),
        "multihead_attn": M.mha_init(ks[1], d_model),
        "linear1": M.linear_init(ks[2], d_model, dim_feedforward),
        "linear2": M.linear_init(ks[3], dim_feedforward, d_model),
        "norm1": M.layer_norm_init(d_model),
        "norm2": M.layer_norm_init(d_model),
        "norm3": M.layer_norm_init(d_model),
    }


def decoder_layer_apply(
    p: Params, x: jnp.ndarray, memory: jnp.ndarray, *, num_heads: int,
    tgt_mask: Optional[jnp.ndarray] = None, dropout: float = 0.0,
    train: bool = False, rng: Optional[jax.Array] = None,
    tgt_causal: bool = False,
) -> jnp.ndarray:
    """Post-LN decoder layer. x (B, T, E), memory (B, L, E).
    ``tgt_causal`` declares tgt_mask is the standard causal mask (lets the
    fused attention kernel build it in-kernel on TPU)."""
    r = M.split_rngs(rng, 6)
    sa, _ = M.multi_head_attention(
        p["self_attn"], x, x, x, num_heads=num_heads, attn_mask=tgt_mask,
        dropout_rate=dropout, train=train, rng=r[0], causal=tgt_causal)
    x = M.layer_norm(p["norm1"], x + M.dropout(r[1], sa, dropout, train))
    ca, _ = M.multi_head_attention(
        p["multihead_attn"], x, memory, memory, num_heads=num_heads,
        dropout_rate=dropout, train=train, rng=r[2])
    x = M.layer_norm(p["norm2"], x + M.dropout(r[3], ca, dropout, train))
    h = jax.nn.relu(M.dense(p["linear1"], x))
    h = M.dropout(r[4], h, dropout, train)
    h = M.dense(p["linear2"], h)
    return M.layer_norm(p["norm3"], x + M.dropout(r[5], h, dropout, train))


def decoder_init(key, d_model: int, num_layers: int, dim_feedforward: int) -> List[Params]:
    keys = jax.random.split(key, num_layers)
    return [decoder_layer_init(k, d_model, dim_feedforward) for k in keys]


def decoder_apply(
    layers: List[Params], x: jnp.ndarray, memory: jnp.ndarray, *,
    num_heads: int, tgt_mask: Optional[jnp.ndarray] = None,
    dropout: float = 0.0, train: bool = False,
    rng: Optional[jax.Array] = None, tgt_causal: bool = False,
) -> jnp.ndarray:
    keys = M.split_rngs(rng, len(layers))
    for p, k in zip(layers, keys):
        x = decoder_layer_apply(p, x, memory, num_heads=num_heads,
                                tgt_mask=tgt_mask, dropout=dropout,
                                train=train, rng=k, tgt_causal=tgt_causal)
    return x


# ---------------------------------------------------------------------------
# Incremental decoding with KV cache (for greedy/beam loops)
# ---------------------------------------------------------------------------


def init_kv_cache(num_layers: int, batch: int, max_len: int, d_model: int,
                  dtype=jnp.float32) -> Params:
    z = jnp.zeros((num_layers, batch, max_len, d_model), dtype)
    return {"k": z, "v": z}


def _attend(q, k, v, num_heads: int, mask=None):
    """q (B,1,E), k/v (B,S,E) already projected; standard MHA core."""
    b, lq, e = q.shape
    hd = e // num_heads

    def split(t):
        return t.reshape(b, t.shape[1], num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) / jnp.sqrt(
                            jnp.float32(hd))
    if mask is not None:
        logits = jnp.where(mask, -jnp.inf, logits)
    w = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, vh,
                     preferred_element_type=jnp.float32).astype(vh.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, e)


def _proj_qkv(p_mha, x):
    w_q, w_k, w_v = jnp.split(p_mha["in_proj_weight"], 3, axis=0)
    b_q, b_k, b_v = jnp.split(p_mha["in_proj_bias"], 3, axis=0)

    def d(w, b):
        return (jax.lax.dot_general(x, w.astype(x.dtype),
                                    (((2,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
                + b).astype(x.dtype)

    return d(w_q, b_q), d(w_k, b_k), d(w_v, b_v)


def _proj_q(p_mha, x):
    """Q-only projection for cross-attention decode steps: K/V of the query
    token are never used there, so projecting all three (``_proj_qkv``)
    wastes 2/3 of the GEMM.  Identical numerics to ``_proj_qkv(...)[0]``."""
    e = p_mha["in_proj_weight"].shape[1]
    w_q = p_mha["in_proj_weight"][:e]
    b_q = p_mha["in_proj_bias"][:e]
    return (jax.lax.dot_general(x, w_q.astype(x.dtype),
                                (((2,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + b_q).astype(x.dtype)


def precompute_memory_kv(layers: List[Params], memory: jnp.ndarray) -> List[Params]:
    """Cross-attention K/V depend only on encoder memory — computed once per
    decode instead of once per step."""
    cached = []
    for p in layers:
        _, k, v = _proj_qkv(p["multihead_attn"], memory)
        cached.append({"k": k, "v": v})
    return cached


def decoder_step_cached(
    layers: List[Params], x_t: jnp.ndarray, pos: jnp.ndarray,
    self_kv: Params, mem_kv: List[Params], *, num_heads: int,
    mem_group: int = 1,
) -> Tuple[jnp.ndarray, Params]:
    """One token through all layers with KV caching (eval mode, no dropout).

    x_t (B, 1, E); pos scalar int32 index; self_kv {'k','v'}: (L, B, S, E).
    Returns (y (B, 1, E), updated self_kv).

    ``mem_group``: number of consecutive x_t rows sharing one ``mem_kv`` row
    (beam search packs an image's K beams at rows n*K..n*K+K-1, all attending
    the SAME encoder memory).  The grouped rows attend as K query positions
    of one cross-attention call — same math per row (cross-attention has no
    mask and softmaxes each query independently), but the memory K/V are
    stored and read once per image instead of once per beam.  The decode
    loop is HBM-bound, and the per-beam K/V re-read each step was its
    largest term (~5x the per-image traffic at beam_size=5).
    """
    max_len = self_kv["k"].shape[2]
    new_k, new_v = self_kv["k"], self_kv["v"]
    # mask out self-attention positions beyond `pos`
    pos_ids = jnp.arange(max_len)[None, None, None, :]  # (1,1,1,S)
    causal = pos_ids > pos

    y = x_t
    for li, p in enumerate(layers):
        q, k_new, v_new = _proj_qkv(p["self_attn"], y)
        k_cache = jax.lax.dynamic_update_slice(
            new_k[li], k_new, (0, pos, 0))
        v_cache = jax.lax.dynamic_update_slice(
            new_v[li], v_new, (0, pos, 0))
        new_k = new_k.at[li].set(k_cache)
        new_v = new_v.at[li].set(v_cache)
        sa = _attend(q, k_cache, v_cache, num_heads, mask=causal)
        sa = M.dense(p["self_attn"]["out_proj"], sa)
        y = M.layer_norm(p["norm1"], y + sa)

        qc = _proj_q(p["multihead_attn"], y)
        if mem_group > 1:
            qg = qc.reshape(-1, mem_group, qc.shape[-1])  # (N, K, E)
            ca = _attend(qg, mem_kv[li]["k"], mem_kv[li]["v"], num_heads)
            ca = ca.reshape(qc.shape)
        else:
            ca = _attend(qc, mem_kv[li]["k"], mem_kv[li]["v"], num_heads)
        ca = M.dense(p["multihead_attn"]["out_proj"], ca)
        y = M.layer_norm(p["norm2"], y + ca)

        h = jax.nn.relu(M.dense(p["linear1"], y))
        h = M.dense(p["linear2"], h)
        y = M.layer_norm(p["norm3"], y + h)
    return y, {"k": new_k, "v": new_v}
