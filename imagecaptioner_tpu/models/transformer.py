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

# Ancestry-attention formulation A/B (see _attend_anc / _attend_anc_sel):
# "sel" contracts the one-hot lineage BEFORE the softmax (K-fold smaller
# softmax material); "joint" is the round-3 joint-softmax form.  MEASURED
# loop-only per-HLO at 512/8/4 K=5 (benchmarks/beam_byte_ledger.json =
# joint, beam_byte_ledger_sel.json = sel): joint 1.83 / 4.76 / 10.32 ms
# at N=8/16/32, sel 1.92 / 4.87 / 9.31 — sel neither fixes the N>=16
# fusion cliff (the pathological 'output fusion' follows the ctx-einsum
# scatter, not the softmax) nor wins at the N=8 production serving
# point, so the default stays the recorded N=8 winner; sel remains the
# ~10% winner at N=32 via IC_BEAM_ANC_IMPL=sel.  Token/score equivalence
# of the two is test-enforced (tests/test_beam_batched.py).
import os as _os

_ANC_IMPL = _os.environ.get("IC_BEAM_ANC_IMPL", "joint")
# optimization_barrier between the ancestry softmax and the context einsum
# (identity op — bitwise-identical outputs, only the fusion boundary moves).
# DEFAULT ON by measurement: without it XLA folds the softmax consumer
# chain into one pathological ~10 GB/s output fusion after the ctx einsum
# (minimal repro: benchmarks/anc_fusion_repro.json — barrier cuts the
# 1-layer cached-attention step 39-44% at every N); on the full production
# loop the barrier moves N=8 from 1.36x to 1.15x of its HBM byte bound
# (1.551 vs 1.831 ms, benchmarks/beam_byte_ledger.json vs the r4
# _prebarrier record) and N=16/32 from 2.4-3.3x to 2.1-2.6x.
# IC_ANC_BARRIER=0 opts out (read at trace time).
_ANC_BARRIER = _os.environ.get("IC_ANC_BARRIER", "1") == "1"


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
                  dtype=jnp.float32, *, num_heads: int = 1) -> List[Params]:
    """Per-layer list of {'k','v'} buffers, each HEAD-MAJOR
    (batch, num_heads, max_len, hd).

    Layout ledger — every variant measured end-to-end per-HLO on the chip
    (packed beam, docs/round3_notes.md has the full table):

    * a per-layer LIST, not a stacked (L, B, S, E) array — updating layer
      ``li`` of a stack with ``at[li].set`` copies the WHOLE stack every
      layer of every decode step (313 us of the 3.76 ms call);
    * HEAD-MAJOR (B, H, S, hd), the layout the attention einsums contract:
      any layout with heads packed in the minor axis makes XLA materialize
      a transposed copy of the whole cache per layer-step on the way into
      the score/context einsums — seq-leading (S, B, E), which optimizes
      the row WRITE instead (one contiguous leading-index update), measured
      3.66 vs 3.06 ms/call at N=8: the write is B*E bytes/step while
      attention re-reads the whole cache, so the read side wins the
      layout."""
    hd = d_model // num_heads
    return [{"k": jnp.zeros((batch, num_heads, max_len, hd), dtype),
             "v": jnp.zeros((batch, num_heads, max_len, hd), dtype)}
            for _ in range(num_layers)]


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


def _attend_hm(q, k, v, num_heads: int, mask=None):
    """Attention of a few query rows over a HEAD-MAJOR cache.

    q (B, Lq, E) with small Lq; k/v (B, H, S, hd) — already in the layout
    the score and context einsums contract, so no per-step transposed copy
    of the cache is materialized.  Only q (tiny) is transposed."""
    b, lq, e = q.shape
    hd = e // num_heads
    qh = q.reshape(b, lq, num_heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, k,
                        preferred_element_type=jnp.float32) / jnp.sqrt(
                            jnp.float32(hd))
    if mask is not None:
        logits = jnp.where(mask, -jnp.inf, logits)
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, e)


def _proj_qkv(p_mha, x):
    if "in_proj_weight_q" in p_mha:  # int8 serving weights (ops/quant.py)
        from imagecaptioner_tpu.ops.quant import dense_int8

        d = {"weight_q": p_mha["in_proj_weight_q"],
             "w_scale": p_mha["in_proj_scale"],
             "bias": p_mha["in_proj_bias"]}
        if "in_proj_x_scale" in p_mha:  # calibrated static scale
            d["x_scale"] = p_mha["in_proj_x_scale"]
        y = dense_int8(d, x)
        q, k, v = jnp.split(y, 3, axis=-1)
        return q, k, v
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
    if "in_proj_weight_q" in p_mha:  # int8 serving weights (ops/quant.py)
        from imagecaptioner_tpu.ops.quant import (dense_int8,
                                                  record_calibration_amax)

        # the slice below is a fresh array each eager call, so calibration
        # must record against the PACKED tree weight's identity
        record_calibration_amax(p_mha["in_proj_weight_q"], x)
        e = p_mha["in_proj_weight_q"].shape[1]
        d = {"weight_q": p_mha["in_proj_weight_q"][:e],
             "w_scale": p_mha["in_proj_scale"][:e],
             "bias": p_mha["in_proj_bias"][:e]}
        if "in_proj_x_scale" in p_mha:
            d["x_scale"] = p_mha["in_proj_x_scale"]
        return dense_int8(d, x)
    e = p_mha["in_proj_weight"].shape[1]
    w_q = p_mha["in_proj_weight"][:e]
    b_q = p_mha["in_proj_bias"][:e]
    return (jax.lax.dot_general(x, w_q.astype(x.dtype),
                                (((2,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
            + b_q).astype(x.dtype)


def precompute_memory_kv(layers: List[Params], memory: jnp.ndarray, *,
                         num_heads: int = 1) -> List[Params]:
    """Cross-attention K/V depend only on encoder memory — computed once per
    decode instead of once per step, and stored HEAD-MAJOR (B, H, L, hd) so
    the per-step attention einsums consume them without materializing a
    transposed copy every layer of every decode step (same rationale as
    init_kv_cache)."""
    b, L, e = memory.shape
    hd = e // num_heads
    cached = []
    for p in layers:
        _, k, v = _proj_qkv(p["multihead_attn"], memory)

        def hm(t):
            return t.reshape(b, L, num_heads, hd).transpose(0, 2, 1, 3)

        cached.append({"k": hm(k), "v": hm(v)})
    return cached


def _attend_anc(q, k, v, anc_hot, num_heads: int, causal):
    """Ancestry-select self-attention for beam decode without cache reorder.

    The KV cache stores each position's rows under the beam SLOT that wrote
    them; ``anc_hot`` (N, K, S, K) one-hot maps (beam i, position s) -> the
    slot j whose entry belongs to beam i's lineage.  Scores are computed
    against ALL slots of the same image (K-fold more MXU flops — negligible:
    the step is HBM-bound on reading the cache once either way) and the
    lineage entry is selected with an exact elementwise multiply-reduce, so
    every selected logit is bitwise the logit the physically-reordered cache
    would produce.  This removes the per-step permutation matmul
    (the one-hot permutation matmuls the beam searches used before
    this) — a full cache read+write each
    step, 9% of the packed beam call — and lets the position write be the
    only cache mutation, which XLA aliases in place in the while body.

    q (R, 1, E); k/v HEAD-MAJOR (R, H, S, hd) with R = N*K; causal
    (1, 1, 1, S) bool.  Returns (R, 1, E).
    """
    r, _, e = q.shape
    hd = e // num_heads
    N, K, S, _ = anc_hot.shape
    qh = q.reshape(N, K, num_heads, hd)
    kh = k.reshape(N, K, num_heads, S, hd)
    vh = v.reshape(N, K, num_heads, S, hd)
    # Precision pinned for f32 operands ONLY: the 5-D einsums are otherwise
    # lowered with bf16-truncated multiplies even for f32 operands (measured
    # 7.5e-3 error vs a f64 oracle on CPU — the plain 4-D attend einsum is
    # exact), which would shift beam scores vs the physically-reordered
    # path.  For bf16 operands there is nothing left to truncate — the MXU
    # multiplies bf16 pairs exactly into a f32 accumulator under DEFAULT —
    # while HIGHEST makes XLA run the contraction on an upcast-f32 path
    # measured 5x slower at these shapes (the bf16 serving beam's ctx
    # einsum ran at the f32 rate, 4.6 vs 0.77 us/call).
    prec = (jax.lax.Precision.HIGHEST if qh.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    # all-pairs scores: beam i's query vs every slot j's entry at each s
    s_all = jnp.einsum("nihd,njhsd->nhijs", qh, kh,
                       preferred_element_type=jnp.float32,
                       precision=prec) / jnp.sqrt(jnp.float32(hd))
    # joint softmax over (slot, position) with non-lineage and future
    # entries at -inf: exp(-inf) = 0 exactly, so the weights (and their
    # normalizer) are identical to a softmax over the selected lineage
    # row — no separate select or re-scatter step needed
    live = (anc_hot.astype(bool).transpose(0, 1, 3, 2)[:, None]  # (N,1,K,K,S)
            & ~causal[..., None, :])
    logits = jnp.where(live, s_all, -jnp.inf)
    w = jax.nn.softmax(logits.reshape(N, num_heads, K, K * S), axis=-1)
    w = w.reshape(N, num_heads, K, K, S).astype(vh.dtype)
    if _ANC_BARRIER:
        # N>=16 cliff experiment (scripts/repro_anc_fusion.py): a fusion
        # boundary here stops XLA folding the softmax consumer chain into
        # the pathological output fusion that follows the ctx einsum
        w, vh = jax.lax.optimization_barrier((w, vh))
    ctx = jnp.einsum("nhijs,njhsd->nihd", w, vh,
                     preferred_element_type=jnp.float32,
                     precision=prec).astype(vh.dtype)
    return ctx.reshape(r, 1, e)


def _attend_anc_sel(q, k, v, anc_hot, num_heads: int, causal):
    """``_attend_anc`` with the lineage SELECTION applied before the softmax.

    The joint-softmax formulation materializes (N, H, K, K, S) logits and
    softmaxes over K*S; measured per-HLO this hits an XLA fusion cliff at
    N>=16 (an 'output fusion' around the softmax sub grows to 1.8/3.6 ms
    per call at N=16/32 — benchmarks/beam_byte_ledger.json, absent at N=8).
    Here the one-hot selection contracts the slot axis FIRST (exact: one
    1.0 multiplier per (i, s), the rest 0.0), the softmax runs over the
    K-fold smaller (N, H, K, S) tensor, and the weights are scattered back
    onto slots as an elementwise producer of the context contraction.
    Mathematically identical to ``_attend_anc`` (adding exact zeros);
    token/score equivalence is test-enforced, fp-bitwise it may differ in
    the last ulp (different reduction tree over the same selected terms).
    """
    r, _, e = q.shape
    hd = e // num_heads
    N, K, S, _ = anc_hot.shape
    qh = q.reshape(N, K, num_heads, hd)
    kh = k.reshape(N, K, num_heads, S, hd)
    vh = v.reshape(N, K, num_heads, S, hd)
    prec = (jax.lax.Precision.HIGHEST if qh.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    s_all = jnp.einsum("nihd,njhsd->nhijs", qh, kh,
                       preferred_element_type=jnp.float32,
                       precision=prec) / jnp.sqrt(jnp.float32(hd))
    # exact lineage pick: one-hot contraction in f32 (1.0 * x + 0.0s = x)
    sel = jnp.einsum("nhijs,nisj->nhis", s_all,
                     anc_hot.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    logits = jnp.where(causal[..., 0, :], -jnp.inf, sel)  # (N,H,K,S)
    w = jax.nn.softmax(logits, axis=-1)
    # scatter weights back onto slots; fuses as a producer of the dot
    wj = (w[:, :, :, None, :]
          * anc_hot.transpose(0, 1, 3, 2)[:, None].astype(jnp.float32))
    ctx = jnp.einsum("nhijs,njhsd->nihd", wj.astype(vh.dtype)
                     if vh.dtype != jnp.float32 else wj, vh,
                     preferred_element_type=jnp.float32,
                     precision=prec).astype(vh.dtype)
    return ctx.reshape(r, 1, e)


def decoder_step_cached(
    layers: List[Params], x_t: jnp.ndarray, pos: jnp.ndarray,
    self_kv: List[Params], mem_kv: List[Params], *, num_heads: int,
    mem_group: int = 1, anc: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, List[Params]]:
    """One token through all layers with KV caching (eval mode, no dropout).

    x_t (B, 1, E); pos scalar int32 index; self_kv: per-layer list of
    {'k','v'} head-major (B, H, S, hd) buffers (see init_kv_cache).
    Returns (y (B, 1, E), updated self_kv).

    ``mem_group``: number of consecutive x_t rows sharing one ``mem_kv`` row
    (beam search packs an image's K beams at rows n*K..n*K+K-1, all attending
    the SAME encoder memory).  The grouped rows attend as K query positions
    of one cross-attention call — same math per row (cross-attention has no
    mask and softmaxes each query independently), but the memory K/V are
    stored and read once per image instead of once per beam.  The decode
    loop is HBM-bound, and the per-beam K/V re-read each step was its
    largest term (~5x the per-image traffic at beam_size=5).

    ``anc``: (N, K, S) int32 beam-ancestry table (beam search only): the
    cache is stored un-reordered and ``anc[n, i, s]`` names the slot whose
    position-s entry belongs to the beam currently in slot i.  See
    :func:`_attend_anc`.

    On TPU with ``anc`` the self- and cross-attention cores run as fused
    Pallas kernels (ops/pallas_beam_attn.py); the XLA paths below are the
    CPU/test/fallback implementation.
    """
    B, _, E = x_t.shape
    hd = E // num_heads
    max_len = self_kv[0]["k"].shape[2]
    # mask out self-attention positions beyond `pos`
    pos_ids = jnp.arange(max_len)[None, None, None, :]  # (1,1,1,S)
    causal = pos_ids > pos

    impl = "xla"
    if anc is not None:
        from imagecaptioner_tpu.ops import pallas_beam_attn as BA

        impl = BA.beam_attn_impl()
        if impl != "xla":
            try:
                BA.check_vmem(B, anc, max_len, E, num_heads,
                              mem_len=mem_kv[0]["k"].shape[2],
                              itemsize=jnp.dtype(x_t.dtype).itemsize)
            except BA.BeamAttnVmemExceeded as e:
                import os

                if os.environ.get("IC_STRICT_PALLAS") == "1":
                    raise
                print(f"[beam-attn] {e} — using the XLA ancestry path",
                      flush=True)
                impl = "xla"
    anc_hot = (jax.nn.one_hot(anc, anc.shape[1], dtype=x_t.dtype)
               if anc is not None and impl == "xla" else None)

    y = x_t
    new_kv = []
    for p, kv, mkv in zip(layers, self_kv, mem_kv):
        q, k_new, v_new = _proj_qkv(p["self_attn"], y)
        # write this position's rows in the cache's head-major layout
        k_row = k_new.reshape(B, 1, num_heads, hd).transpose(0, 2, 1, 3)
        v_row = v_new.reshape(B, 1, num_heads, hd).transpose(0, 2, 1, 3)
        k_cache = jax.lax.dynamic_update_slice(kv["k"], k_row, (0, 0, pos, 0))
        v_cache = jax.lax.dynamic_update_slice(kv["v"], v_row, (0, 0, pos, 0))
        new_kv.append({"k": k_cache, "v": v_cache})
        if impl != "xla":
            sa = BA.fused_beam_self_attention(
                q, {"k": k_cache, "v": v_cache}, anc, pos,
                num_heads=num_heads, interpret=impl == "interpret")
        elif anc_hot is not None:
            attend = (_attend_anc_sel if _ANC_IMPL == "sel"
                      else _attend_anc)
            sa = attend(q, k_cache, v_cache, anc_hot, num_heads, causal)
        else:
            sa = _attend_hm(q, k_cache, v_cache, num_heads, mask=causal)
        sa = M.dense(p["self_attn"]["out_proj"], sa)
        y = M.layer_norm(p["norm1"], y + sa)

        qc = _proj_q(p["multihead_attn"], y)
        if impl != "xla":
            ca = BA.fused_beam_cross_attention(
                qc, mkv, mem_group=mem_group, num_heads=num_heads,
                interpret=impl == "interpret")
        elif mem_group > 1:
            qg = qc.reshape(-1, mem_group, qc.shape[-1])  # (N, K, E)
            ca = _attend_hm(qg, mkv["k"], mkv["v"], num_heads)
            ca = ca.reshape(qc.shape)
        else:
            ca = _attend_hm(qc, mkv["k"], mkv["v"], num_heads)
        ca = M.dense(p["multihead_attn"]["out_proj"], ca)
        y = M.layer_norm(p["norm2"], y + ca)

        h = jax.nn.relu(M.dense(p["linear1"], y))
        h = M.dense(p["linear2"], h)
        y = M.layer_norm(p["norm3"], y + h)
    return y, new_kv
