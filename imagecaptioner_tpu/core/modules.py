"""Functional neural-net building blocks over parameter pytrees.

Design rules (TPU-first):
  * Parameters are plain nested dicts of ``jnp`` arrays — jit/pjit/scan/Pallas
    see ordinary pytrees, nothing is hidden in Python objects.
  * Parameter *storage layouts match PyTorch* (``Linear.weight`` is
    ``(out, in)``, conv weights are ``(O, I, kH, kW)``) so the torch->JAX
    checkpoint converter is a pure tree re-keying and numerical parity tests
    against the reference semantics are exact.  XLA folds the transposes into
    the matmuls; there is no runtime cost.
  * Every ``apply`` function is pure.  Dropout takes an explicit PRNG key and
    a ``train`` flag; batch-norm threads explicit running-stats state.
  * Matmuls go through :func:`dense` which pins MXU accumulation to float32
    via ``preferred_element_type`` while letting activations/weights ride in
    bfloat16 under the precision policy (see ``core/precision.py``).

Reference semantics being reproduced are cited per-function (file:line refers
to the PyTorch reference at /root/reference).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers (PyTorch-default semantics so training dynamics match)
# ---------------------------------------------------------------------------


def _kaiming_uniform_bound(fan_in: int, a: float = math.sqrt(5.0)) -> float:
    # torch.nn.init.kaiming_uniform_(a=sqrt(5)) as used by nn.Linear/nn.Conv2d
    gain = math.sqrt(2.0 / (1.0 + a * a))
    std = gain / math.sqrt(fan_in)
    return math.sqrt(3.0) * std


def uniform(key, shape, bound: float, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def xavier_uniform(key, shape, dtype=jnp.float32):
    """torch.nn.init.xavier_uniform_ for a (out, in) matrix."""
    fan_out, fan_in = shape[0], shape[1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return uniform(key, shape, bound, dtype)


def orthogonal(key, shape, dtype=jnp.float32):
    """torch.nn.init.orthogonal_ for 2-D matrices."""
    n_rows, n_cols = shape
    big = max(n_rows, n_cols)
    a = jax.random.normal(key, (big, min(n_rows, n_cols)), jnp.float32)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))
    q = q[:n_rows, :n_cols] if n_rows >= n_cols else q[:n_cols, :n_rows].T
    return q.astype(dtype)


# ---------------------------------------------------------------------------
# Dense / Linear
# ---------------------------------------------------------------------------


def linear_init(key, in_features: int, out_features: int, bias: bool = True) -> Params:
    """nn.Linear default init: kaiming_uniform(a=sqrt(5)) weight, U(+-1/sqrt(fan_in)) bias."""
    wk, bk = jax.random.split(key)
    p: Params = {
        "weight": uniform(wk, (out_features, in_features), _kaiming_uniform_bound(in_features))
    }
    if bias:
        b_bound = 1.0 / math.sqrt(in_features) if in_features > 0 else 0.0
        p["bias"] = uniform(bk, (out_features,), b_bound)
    return p


def dense(p: Params, x: jnp.ndarray, *, compute_dtype=None) -> jnp.ndarray:
    """``x @ W.T + b`` with f32 MXU accumulation.

    ``x``: (..., in).  Weight stored torch-layout (out, in).  The activation
    dtype is the compute dtype: fp32 params ride along as bf16 when the
    activations are bf16 (the core of the precision policy — params stay
    fp32 in HBM, matmuls run bf16 on the MXU).
    """
    if "weight_q" in p:  # int8 serving weights (ops/quant.py)
        from imagecaptioner_tpu.ops.quant import dense_int8

        return dense_int8(
            p, x if compute_dtype is None else x.astype(compute_dtype))
    w = p["weight"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    elif w.dtype != x.dtype:
        w = w.astype(x.dtype)
    y = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype if compute_dtype is None else compute_dtype)


# ---------------------------------------------------------------------------
# Embedding
# ---------------------------------------------------------------------------


def embedding_init(key, num_embeddings: int, dim: int, *, scale: float = 0.1) -> Params:
    """All reference embeddings are re-initialised U(-0.1, 0.1)
    (teacher_model.py:55, student_model.py:135)."""
    return {"weight": uniform(key, (num_embeddings, dim), scale)}


def embedding(p: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(p["weight"], ids, axis=0)


# ---------------------------------------------------------------------------
# LayerNorm
# ---------------------------------------------------------------------------


def layer_norm_init(dim: int) -> Params:
    return {"weight": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layer_norm(p: Params, x: jnp.ndarray, *, eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Dropout
# ---------------------------------------------------------------------------


def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    """Inverted dropout (torch semantics: scale by 1/(1-p) at train time)."""
    if not train or rate <= 0.0:
        return x
    if rng is None:
        raise ValueError("dropout requires an rng key when train=True and rate>0")
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Multi-head attention (torch nn.MultiheadAttention semantics)
# ---------------------------------------------------------------------------


def mha_init(key, embed_dim: int, *, bias: bool = True) -> Params:
    """Packed q/k/v in_proj like torch (xavier_uniform on the packed matrix,
    zero biases — nn.MultiheadAttention._reset_parameters)."""
    k1, k2 = jax.random.split(key)
    p: Params = {
        "in_proj_weight": xavier_uniform(k1, (3 * embed_dim, embed_dim)),
        "out_proj": {
            "weight": uniform(
                k2, (embed_dim, embed_dim), _kaiming_uniform_bound(embed_dim)
            ),
            "bias": jnp.zeros((embed_dim,)),
        },
    }
    if bias:
        p["in_proj_bias"] = jnp.zeros((3 * embed_dim,))
    return p


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, l, e = x.shape
    return x.reshape(b, l, num_heads, e // num_heads).transpose(0, 2, 1, 3)


def multi_head_attention(
    p: Params,
    query: jnp.ndarray,  # (B, Lq, E)
    key: jnp.ndarray,    # (B, Lk, E)
    value: jnp.ndarray,  # (B, Lk, E)
    *,
    num_heads: int,
    attn_mask: Optional[jnp.ndarray] = None,  # bool (Lq, Lk), True = masked out
    dropout_rate: float = 0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    need_weights: bool = False,
    causal: bool = False,
    attn_impl: Optional[str] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """torch nn.MultiheadAttention forward (batch-first layout internally).

    Returns (output (B, Lq, E), attn_weights (B, Lq, Lk) averaged over heads
    when ``need_weights``).

    ``causal=True`` declares that ``attn_mask`` (if any) is the standard
    causal mask — that lets the fused Pallas attention core build the mask
    in-kernel.  ``attn_impl``: "pallas" | "xla" | None (None = runtime
    policy: fused on real TPU).  Weight-dropout, ``need_weights``, and
    non-causal masks always use the XLA path.
    """
    e = query.shape[-1]
    if "in_proj_weight_q" in p:  # int8 serving weights (ops/quant.py)
        from imagecaptioner_tpu.ops.quant import (dense_int8,
                                                  record_calibration_amax)

        # split arrays are fresh objects each eager call — calibration
        # records against the PACKED tree weight's identity (q, k and v
        # inputs all fold into the same scale, conservatively)
        for act in (query, key, value):
            record_calibration_amax(p["in_proj_weight_q"], act)
        xs = p.get("in_proj_x_scale")
        w_q, w_k, w_v = jnp.split(p["in_proj_weight_q"], 3, axis=0)
        s_q, s_k, s_v = jnp.split(p["in_proj_scale"], 3)
        if "in_proj_bias" in p:
            b_q, b_k, b_v = jnp.split(p["in_proj_bias"], 3, axis=0)
        else:
            b_q = b_k = b_v = None

        def proj(x, w, s, b):
            d = {"weight_q": w, "w_scale": s}
            if b is not None:
                d["bias"] = b
            if xs is not None:
                d["x_scale"] = xs
            return dense_int8(d, x)

        q = _split_heads(proj(query, w_q, s_q, b_q), num_heads)
        k = _split_heads(proj(key, w_k, s_k, b_k), num_heads)
        v = _split_heads(proj(value, w_v, s_v, b_v), num_heads)
    else:
        w_q, w_k, w_v = jnp.split(p["in_proj_weight"], 3, axis=0)
        if "in_proj_bias" in p:
            b_q, b_k, b_v = jnp.split(p["in_proj_bias"], 3, axis=0)
        else:
            b_q = b_k = b_v = None

        def proj(x, w, b):
            y = jax.lax.dot_general(
                x, w.astype(x.dtype),
                dimension_numbers=(((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if b is not None:
                y = y + b
            return y.astype(x.dtype)

        q = _split_heads(proj(query, w_q, b_q), num_heads)  # (B,H,Lq,D)
        k = _split_heads(proj(key, w_k, b_k), num_heads)
        v = _split_heads(proj(value, w_v, b_v), num_heads)

    scale = 1.0 / math.sqrt(e // num_heads)
    from imagecaptioner_tpu.ops.pallas_attention import default_attn_impl

    impl = attn_impl or default_attn_impl()
    use_fused = (impl == "pallas" and not need_weights
                 and not (train and dropout_rate > 0.0)
                 and (attn_mask is None or causal)
                 and (not causal or q.shape[2] == k.shape[2]))
    if use_fused:
        from imagecaptioner_tpu.ops.pallas_attention import (
            dp_attention_policy, fused_attention_core,
            fused_attention_pays_off, fused_attention_sharded)

        pol = dp_attention_policy()
        if attn_impl != "pallas":
            # measured shape gate (skipped when the caller pins the kernel):
            # at small score tensors the XLA batched GEMM beats the
            # per-(batch, head)-program kernel 3-4x — see
            # fused_attention_pays_off.  Under DP the kernel sees the
            # per-shard batch.
            shards = pol[0].shape[pol[1]] if pol is not None else 1
            use_fused = fused_attention_pays_off(
                max(q.shape[0] // shards, 1), num_heads,
                q.shape[2], k.shape[2])
    if use_fused:
        if pol is not None:
            # DP mesh: per-batch-shard kernel via shard_map (the kernel is
            # opaque to GSPMD; without this the fused path would be lost the
            # moment training goes multi-chip — VERDICT r2 #3)
            out = fused_attention_sharded(q, k, v, causal, scale,
                                          pol[0], pol[1])
        else:
            out = fused_attention_core(q, k, v, causal, scale)
    else:
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * scale
        if attn_mask is None and causal:
            # same contract as the fused kernel: causal=True masks even when
            # no explicit mask tensor was passed.  Bottom-right aligned so a
            # cached/incremental query (Lq < Lk) attends to its full prefix —
            # a top-left triu would leave a single query only key 0.  (The
            # fused path refuses Lq != Lk causal entirely, see use_fused.)
            lq, lk = q.shape[2], k.shape[2]
            attn_mask = jnp.triu(jnp.ones((lq, lk), bool), k=lk - lq + 1)
        if attn_mask is not None:
            logits = jnp.where(attn_mask[None, None, :, :], -jnp.inf, logits)
        weights = jax.nn.softmax(logits, axis=-1)
        if train and dropout_rate > 0.0:
            weights = dropout(rng, weights, dropout_rate, train)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd", weights.astype(v.dtype), v,
            preferred_element_type=jnp.float32).astype(v.dtype)
    b, h, lq, d = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(b, lq, h * d)
    out = dense(p["out_proj"], out)
    if need_weights:
        return out, jnp.mean(weights, axis=1)  # torch averages over heads
    return out, None


# ---------------------------------------------------------------------------
# Convolution / pooling (NHWC activations, torch OIHW weight storage)
# ---------------------------------------------------------------------------


def conv2d_init(
    key, in_ch: int, out_ch: int, kernel_size: int, *,
    bias: bool = True, groups: int = 1,
) -> Params:
    wk, bk = jax.random.split(key)
    fan_in = (in_ch // groups) * kernel_size * kernel_size
    p: Params = {
        "weight": uniform(
            wk, (out_ch, in_ch // groups, kernel_size, kernel_size),
            _kaiming_uniform_bound(fan_in)),
    }
    if bias:
        p["bias"] = uniform(bk, (out_ch,), 1.0 / math.sqrt(fan_in))
    return p


def conv2d(
    p: Params, x: jnp.ndarray, *, stride: int = 1, padding: int = 0,
    groups: int = 1, compute_dtype=None,
) -> jnp.ndarray:
    """2-D conv over NHWC input with torch-layout (O, I/g, kH, kW) weight."""
    if "weight_q" in p:  # int8 serving weights (ops/quant.py)
        from imagecaptioner_tpu.ops.quant import conv2d_int8

        return conv2d_int8(
            p, x if compute_dtype is None else x.astype(compute_dtype),
            stride=stride, padding=padding, groups=groups)
    w = p["weight"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    elif w.dtype != x.dtype:
        w = w.astype(x.dtype)  # activation dtype = compute dtype
    # OIHW -> HWIO
    w = jnp.transpose(w, (2, 3, 1, 0))
    # no preferred_element_type: its conv VJP rejects bf16 inputs, and the
    # TPU MXU accumulates bf16 convs in f32 internally regardless
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y.astype(x.dtype)


def max_pool2d(x: jnp.ndarray, window: int, stride: int, padding: int = 0) -> jnp.ndarray:
    """NHWC max pool (torch nn.MaxPool2d semantics, -inf padding)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Averaging matrix (out, in) reproducing torch AdaptiveAvgPool semantics:
    bin i covers [floor(i*in/out), ceil((i+1)*in/out)).

    Adaptive pooling becomes a static matmul — MXU-friendly and fully fused by
    XLA (replaces cuDNN adaptive pooling, SURVEY.md §2.9 N9).
    """
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -(-((i + 1) * in_size) // out_size)  # ceil
        m[i, start:end] = 1.0 / (end - start)
    return m


def adaptive_avg_pool2d(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """NHWC adaptive average pool to ``out_hw`` via two static matmuls."""
    h, w = x.shape[1], x.shape[2]
    mh = jnp.asarray(adaptive_pool_matrix(h, out_hw[0]), x.dtype)
    mw = jnp.asarray(adaptive_pool_matrix(w, out_hw[1]), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", mh, x, preferred_element_type=jnp.float32)
    y = jnp.einsum("pw,bowc->bopc", mw, y.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def adaptive_avg_pool1d(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """(B, C, L) -> (B, C, out_len), torch AdaptiveAvgPool1d semantics."""
    m = jnp.asarray(adaptive_pool_matrix(x.shape[-1], out_len), x.dtype)
    return jnp.einsum("ol,bcl->bco", m, x,
                      preferred_element_type=jnp.float32).astype(x.dtype)


# ---------------------------------------------------------------------------
# BatchNorm2d (NHWC, torch semantics with running stats threaded as state)
# ---------------------------------------------------------------------------


def batch_norm_init(num_features: int) -> Tuple[Params, Params]:
    params = {"weight": jnp.ones((num_features,)), "bias": jnp.zeros((num_features,))}
    state = {"running_mean": jnp.zeros((num_features,)),
             "running_var": jnp.ones((num_features,))}
    return params, state


def batch_norm(
    p: Params, state: Params, x: jnp.ndarray, *,
    train: bool, momentum: float = 0.1, eps: float = 1e-5,
) -> Tuple[jnp.ndarray, Params]:
    """BatchNorm over NHWC (stats over N,H,W). Returns (y, new_state).

    torch updates running_var with the *unbiased* batch variance but
    normalises with the biased one — reproduced here.
    """
    xf = x.astype(jnp.float32)
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(xf, axis=axes)
        var = jnp.mean(jnp.square(xf - mean), axis=axes)
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "running_mean": (1 - momentum) * state["running_mean"] + momentum * mean,
            "running_var": (1 - momentum) * state["running_var"] + momentum * unbiased,
        }
    else:
        mean, var = state["running_mean"], state["running_var"]
        new_state = state
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["weight"] + p["bias"]
    return y.astype(x.dtype), new_state


# ---------------------------------------------------------------------------
# Positional encoding (teacher_model.py:8-27 semantics)
# ---------------------------------------------------------------------------


def sinusoidal_positional_encoding(max_len: int, d_model: int) -> np.ndarray:
    """Standard sinusoidal PE table, shape (max_len, d_model).

    Returns host numpy so results can be cached across jit traces without
    leaking tracers; callers ``jnp.asarray`` at the use site.
    """
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                      * (-math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


def causal_mask(seq_len: int) -> jnp.ndarray:
    """Boolean (T, T) mask, True above the diagonal (= disallowed), matching
    ``torch.triu(ones, diagonal=1).bool()`` (teacher_model.py:91-92)."""
    return jnp.triu(jnp.ones((seq_len, seq_len), dtype=bool), k=1)


# ---------------------------------------------------------------------------
# Pytree helpers
# ---------------------------------------------------------------------------


def tree_size(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def split_rngs(rng: Optional[jax.Array], n: int) -> Sequence[Optional[jax.Array]]:
    if rng is None:
        return [None] * n
    return list(jax.random.split(rng, n))
