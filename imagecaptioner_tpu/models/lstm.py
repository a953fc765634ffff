"""LSTM caption decoders as `lax.scan` recurrences.

Replaces the reference's per-timestep Python loops over cuDNN LSTM kernels
(student_model.py:232-251, student_model_compact.py:167-186; SURVEY §2.9 N1).

TPU-first structure:
  * The recurrence (attention + LSTM cell) runs under one `lax.scan` — a
    single compiled loop, state resident on-chip.
  * The vocab projection does NOT feed back into the recurrence under teacher
    forcing, so it is hoisted out of the scan and computed as one big
    (T*B, H) x (H, V) matmul — MXU-shaped instead of T tiny matmuls.
  * A fused Pallas kernel for the scan body is flag-switchable
    (ops/pallas_lstm.py); this module is the numerics reference.

Torch LSTM semantics reproduced exactly: gate order (i, f, g, o), two bias
vectors, inter-layer dropout (fresh mask per step, layers except last),
xavier(w_ih)/orthogonal(w_hh)/zero-bias init (student_model.py:159-165).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from imagecaptioner_tpu.core import modules as M
from imagecaptioner_tpu.core.config import StudentConfig

Params = Dict


# ---------------------------------------------------------------------------
# LSTM cell / stack
# ---------------------------------------------------------------------------


def lstm_layer_init(key, input_size: int, hidden_size: int) -> Params:
    """Per-layer params in torch layout (w_ih (4H, in), w_hh (4H, H))."""
    k1, k2 = jax.random.split(key)
    return {
        "weight_ih": M.xavier_uniform(k1, (4 * hidden_size, input_size)),
        "weight_hh": M.orthogonal(k2, (4 * hidden_size, hidden_size)),
        "bias_ih": jnp.zeros((4 * hidden_size,)),
        "bias_hh": jnp.zeros((4 * hidden_size,)),
    }


def lstm_stack_init(key, input_size: int, hidden_size: int, num_layers: int) -> list:
    keys = jax.random.split(key, num_layers)
    return [
        lstm_layer_init(keys[i], input_size if i == 0 else hidden_size, hidden_size)
        for i in range(num_layers)
    ]


def lstm_cell(p: Params, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One torch-semantics LSTM cell step. x (B, in), h/c (B, H)."""
    gates = (
        jax.lax.dot_general(x, p["weight_ih"].astype(x.dtype),
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + jax.lax.dot_general(h.astype(x.dtype),
                              p["weight_hh"].astype(x.dtype),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
        + p["bias_ih"] + p["bias_hh"]
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)  # torch gate order
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c.astype(jnp.float32) + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new.astype(x.dtype), c_new.astype(x.dtype)


def lstm_stack_step(
    layers: list, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray, *,
    dropout_rate: float = 0.0, train: bool = False,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """One step through an L-layer stack. h/c: (L, B, H)."""
    new_h, new_c = [], []
    inp = x
    n = len(layers)
    keys = M.split_rngs(rng, n)
    for li, p in enumerate(layers):
        hi, ci = lstm_cell(p, inp, h[li], c[li])
        new_h.append(hi)
        new_c.append(ci)
        inp = hi
        if train and dropout_rate > 0.0 and li < n - 1:
            inp = M.dropout(keys[li], inp, dropout_rate, train)
    return inp, (jnp.stack(new_h), jnp.stack(new_c))


def init_hidden(num_layers: int, batch: int, hidden: int, dtype=jnp.float32):
    z = jnp.zeros((num_layers, batch, hidden), dtype)
    return z, z


# ---------------------------------------------------------------------------
# Attention mechanisms over image features
# ---------------------------------------------------------------------------


def bahdanau_attention(p_attn: Params, h_top: jnp.ndarray, feats: jnp.ndarray
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-student additive attention (student_model.py:173-203).

    scores = sum_dim2(tanh(Linear([h_expanded, feats]))); softmax over tokens.
    h_top (B, H), feats (B, L, E) -> context (B, E), weights (B, L).
    """
    L = feats.shape[1]
    h_exp = jnp.broadcast_to(h_top[:, None, :], (h_top.shape[0], L, h_top.shape[1]))
    combined = jnp.concatenate([h_exp, feats], axis=-1)
    scores = jnp.sum(jnp.tanh(M.dense(p_attn, combined)), axis=-1)  # (B, L)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=1).astype(feats.dtype)
    context = jnp.einsum("bl,ble->be", weights, feats,
                         preferred_element_type=jnp.float32).astype(feats.dtype)
    return context, weights


def dot_attention(p_attn: Params, h_top: jnp.ndarray, feats: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compact-student dot-product attention (student_model_compact.py:114-138):
    scores = (W h) . feats."""
    h_proj = M.dense(p_attn, h_top)  # (B, E)
    scores = jnp.einsum("be,ble->bl", h_proj, feats,
                        preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(scores, axis=1).astype(feats.dtype)
    context = jnp.einsum("bl,ble->be", weights, feats,
                         preferred_element_type=jnp.float32).astype(feats.dtype)
    return context, weights


# ---------------------------------------------------------------------------
# Full-student decoder (student_model.py:121-256)
# ---------------------------------------------------------------------------


def full_decoder_init(key, cfg: StudentConfig) -> Params:
    ks = jax.random.split(key, 6)
    e, h, v = cfg.embed_size, cfg.hidden_size, cfg.vocab_size
    return {
        "embedding": M.embedding_init(ks[0], v, e),
        "attention": M.linear_init(ks[1], h + e, e),
        "attention_combine": M.linear_init(ks[2], 2 * e, e),
        "lstm": lstm_stack_init(ks[3], e, h, cfg.num_layers),
        "output_projection": {
            "fc1": M.linear_init(ks[4], h, e),
            "fc2": M.linear_init(ks[5], e, v),
        },
    }


def full_decoder_step(
    p: Params, word_emb: jnp.ndarray, hc, feats: jnp.ndarray, cfg: StudentConfig,
    *, train: bool = False, rng: Optional[jax.Array] = None,
):
    """One recurrence step (no vocab projection): returns (h_top, new_hc, attn_w)."""
    h, c = hc
    context, attn_w = bahdanau_attention(p["attention"], h[-1], feats)
    combined = M.dense(p["attention_combine"],
                       jnp.concatenate([word_emb, context], axis=-1))
    h_top, hc_new = lstm_stack_step(
        p["lstm"], combined, h, c,
        dropout_rate=cfg.dropout, train=train, rng=rng)
    return h_top, hc_new, attn_w


def output_projection(p: Params, h_top: jnp.ndarray, cfg: StudentConfig, *,
                      train: bool = False, rng: Optional[jax.Array] = None
                      ) -> jnp.ndarray:
    """Linear(H->E) + ReLU + Dropout + Linear(E->V) (student_model.py:151-156).
    Applied to (..., H) of any rank — hoisted out of the scan for (T*B, H)."""
    x = jax.nn.relu(M.dense(p["fc1"], h_top))
    x = M.dropout(rng, x, cfg.dropout, train)
    return M.dense(p["fc2"], x)


def full_decoder_apply(
    p: Params, image_features: jnp.ndarray, captions: jnp.ndarray,
    cfg: StudentConfig, *, train: bool = False, rng: Optional[jax.Array] = None,
    hidden=None,
):
    """Teacher-forced forward. captions (T, B) -> logits (T, B, V),
    hidden_states (T, B, H), attn (T, B, L)."""
    T, B = captions.shape
    if hidden is None:
        hidden = init_hidden(cfg.num_layers, B, cfg.hidden_size,
                             image_features.dtype)
    embedded = M.embedding(p["embedding"], captions).astype(image_features.dtype)

    base_rng = rng if rng is not None else jax.random.PRNGKey(0)

    def scan_fn(carry, xs):
        hc = carry
        emb_t, t = xs
        step_rng = jax.random.fold_in(base_rng, t) if train else None
        h_top, hc_new, attn_w = full_decoder_step(
            p, emb_t, hc, image_features, cfg, train=train, rng=step_rng)
        return hc_new, (h_top, attn_w)

    _, (h_tops, attns) = jax.lax.scan(
        scan_fn, hidden, (embedded, jnp.arange(T)))
    # steps fold in 0..T-1; T is free for the projection dropout
    proj_rng = jax.random.fold_in(base_rng, T) if train else None
    logits = output_projection(p["output_projection"], h_tops, cfg,
                               train=train, rng=proj_rng)
    return logits, h_tops, attns


# ---------------------------------------------------------------------------
# Compact-student decoder (student_model_compact.py:68-191)
# ---------------------------------------------------------------------------


def compact_decoder_init(key, cfg: StudentConfig) -> Params:
    ks = jax.random.split(key, 4)
    e, h, v = cfg.embed_size, cfg.hidden_size, cfg.vocab_size
    return {
        "embedding": M.embedding_init(ks[0], v, e),
        "attention": M.linear_init(ks[1], h, e),
        "lstm": lstm_stack_init(ks[2], e, h, cfg.num_layers),
        "output_projection": M.linear_init(ks[3], h, v),
    }


def compact_decoder_step(
    p: Params, word_emb: jnp.ndarray, hc, feats: jnp.ndarray, cfg: StudentConfig,
    *, train: bool = False, rng: Optional[jax.Array] = None,
):
    h, c = hc
    context, attn_w = dot_attention(p["attention"], h[-1], feats)
    combined = word_emb + context  # simple additive fusion (:174-176)
    h_top, hc_new = lstm_stack_step(p["lstm"], combined, h, c,
                                    dropout_rate=0.0, train=train, rng=rng)
    return h_top, hc_new, attn_w


def compact_decoder_apply(
    p: Params, image_features: jnp.ndarray, captions: jnp.ndarray,
    cfg: StudentConfig, *, train: bool = False, rng: Optional[jax.Array] = None,
    hidden=None,
):
    T, B = captions.shape
    if hidden is None:
        hidden = init_hidden(cfg.num_layers, B, cfg.hidden_size,
                             image_features.dtype)
    embedded = M.embedding(p["embedding"], captions).astype(image_features.dtype)

    def scan_fn(carry, emb_t):
        h_top, hc_new, attn_w = compact_decoder_step(
            p, emb_t, carry, image_features, cfg, train=train)
        return hc_new, (h_top, attn_w)

    _, (h_tops, attns) = jax.lax.scan(scan_fn, hidden, embedded)
    logits = M.dense(p["output_projection"], h_tops)
    return logits, h_tops, attns
