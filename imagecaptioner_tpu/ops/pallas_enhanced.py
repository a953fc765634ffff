"""Fused Pallas TPU kernel: enhanced-student decoder scan (trainable).

Completes the fused-decoder family (ops/pallas_lstm.py covers the full and
compact students): the enhanced student's recurrence — 8-head MHA image
attention with a learned query projection, gated word/context fusion, a
3-layer LSTMCell stack with per-layer LayerNorm + dropout, and a highway
output gate (student_model_enhanced.py:177-371 semantics as reproduced by
models/student_enhanced.py) — runs as ONE whole-sequence ``pallas_call``
with weights and recurrent state VMEM-resident across all T steps.

Algebraic restructuring (same tricks as the full-student kernel, numerics
preserved within matmul-reassociation tolerance):
  * attention K/V are time-invariant: projected ONCE outside the kernel and
    passed pre-split per head ``(nh, B, L, hd)``; per step only the query
    chain (``query_projection`` then the q in-proj) stays in-kernel.
  * the attention-gate Linear splits over its concat input: the word half
    ``emb @ Wg_w + b`` is precomputed for the whole sequence; per step only
    ``ctx @ Wg_c``.
  * the q in-proj and attention out-proj are pre-split per head
    ``(nh, E, hd)`` / ``(nh, hd, E)`` so the kernel never slices the lane
    dimension at the non-128-aligned head width (hd = 48 at the production
    384/8 config); the out-proj is applied as a sum of per-head matmuls
    (exactly the concat-then-matmul in real arithmetic).
  * the output projection (GELU MLP to vocab) stays outside — one big
    (T*B, H) matmul after the scan (models/student_enhanced.py:188-193).

``pallas_enhanced_decoder_scan_train`` is a differentiable drop-in for
``student_enhanced.enhanced_decoder_apply``: fused Pallas forward streaming
the residual trajectories (per-layer h after LayerNorm+dropout, raw c), and
an analytic reverse-time ``lax.scan`` backward that recomputes per-step
intermediates from the trajectories (custom VJP).  Unlike the full student
there is deliberately NO reverse-time Pallas backward: at the enhanced
768-hidden config the six LSTM weight matrices alone are ~52 MB f32, so
weights + their VMEM-resident gradient accumulators cannot fit the 100 MiB
scoped-VMEM cap — the XLA reverse scan is the right tool there.

With ``train=True`` the attention-weight dropout and the per-layer output
dropout reproduce the lax.scan path's exact masks (same fold_in/split key
derivation), so the two paths are swappable mid-training.  Value and
gradient parity vs models/student_enhanced.py is tested in
tests/test_pallas_enhanced.py (interpret mode on CPU; IC_TPU_TESTS=1
compiles on the real chip).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imagecaptioner_tpu.core.config import StudentConfig
from imagecaptioner_tpu.ops.pallas_lstm import (
    _VMEM_CAP_BYTES, _dp_shards, _shift1, _vmem_params)

NUM_HEADS = 8          # student_enhanced._enhanced_attention num_heads
ATTN_DROPOUT = 0.1     # hardcoded in the reference MHA call (:155)
LN_EPS = 1e-5          # core.modules.layer_norm default


# ---------------------------------------------------------------------------
# VMEM budget
# ---------------------------------------------------------------------------


def enhanced_train_vmem_estimate(cfg: StudentConfig, T: int, B: int, L: int,
                                 itemsize: int) -> int:
    """Analytic VMEM estimate mirroring _fused_enhanced_core_fwd_call's
    operand/output list (same 20% margin + 2 MiB as pallas_lstm)."""
    E, H = cfg.embed_size, cfg.hidden_size
    hd = E // NUM_HEADS
    s = itemsize
    operands = (
        T * B * E * s                      # embp
        + T * B * E * 4                    # gate_w (f32)
        + 2 * NUM_HEADS * B * L * hd * s   # k_h, v_h
        + T * B * NUM_HEADS * L * 4        # amask
        + 3 * T * B * H * 4                # lmask
        + H * E * s + E * 4                # wqp + bqp
        + 2 * E * E * s + E * 4            # wq_in_h + wo_h (+ bq folded sz)
        + E * E * s + E * 4                # wg_c + bo
        + (E + 5 * H) * 4 * H * s          # six LSTM matrices
        + 3 * 4 * H * 4                    # lstm biases
        + 2 * 3 * H * 4                    # ln gamma/beta
        + (H + 2 * E) * H * s + 2 * H * 4  # highway + ctx projection
    )
    outs = (
        4 * T * B * H * s      # h_tops, enh, h0s, h1s
        + 3 * T * B * H * 4    # c0s, c1s, c2s (f32)
        + T * B * L * 4        # attns (f32)
    )
    scratch = 6 * B * H * 4
    return int((operands + outs + scratch) * 1.2) + (2 << 20)


def enhanced_train_fits_vmem(cfg: StudentConfig, T: int, B: int, L: int,
                             itemsize: int) -> bool:
    return (enhanced_train_vmem_estimate(cfg, T, B, L, itemsize)
            <= _VMEM_CAP_BYTES)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _kernel_enhanced_train(
        embp_ref, gate_w_ref, k_ref, v_ref, amask_ref, lmask_ref,
        wqp_ref, bqp_ref, wq_in_ref, bq_in_ref, wo_ref, bo_ref, wg_c_ref,
        wih0_ref, whh0_ref, b0_ref, wih1_ref, whh1_ref, b1_ref,
        wih2_ref, whh2_ref, b2_ref, ln_g_ref, ln_b_ref,
        whg_h_ref, whg_c_ref, bhw_ref, wcp_ref, bcp_ref,
        h_out_ref, enh_out_ref, attn_out_ref,
        h0_out_ref, h1_out_ref, c0_out_ref, c1_out_ref, c2_out_ref,
        h0_s, c0_s, h1_s, c1_s, h2_s, c2_s):
    """One program; T steps with the 3-layer state in VMEM scratch.

    Shapes (E embed, H hidden, L=64 tokens, nh=8 heads, hd=E/nh):
      embp    (T, B, E)      word embeddings + learned positions
      gate_w  (T, B, E) f32  embp @ Wg_word + b_gate (precomputed)
      k/v     (nh, B, L, hd) per-head projected memory
      amask   (T, B, nh, L) f32  attention-weight dropout multiplier
      lmask   (3, T, B, H) f32   per-layer output dropout multiplier
      wqp (H, E) + bqp (1, E)    query_projection (bug-fix learned Linear)
      wq_in (nh, E, hd) + bq_in (nh, 1, hd)   q in-proj, per head
      wo (nh, hd, E) + bo (1, E)              out-proj, per head
      wg_c (E, E)                 ctx half of attention_gate
      wih/whh/b per layer (in, 4H)/(H, 4H)/(1, 4H), combined torch biases
      ln_g/ln_b (3, 1, H)         per-layer LayerNorm affine
      whg_h (H, H), whg_c (E, H), bhw (1, H)  highway gate halves
      wcp (E, H), bcp (1, H)      highway context projection
    Residual outs: per-layer h AFTER LayerNorm+dropout (the recurrent
    state), raw c (f32, for tanh'(c) recompute in the backward).
    """
    T = embp_ref.shape[0]
    nh = k_ref.shape[0]
    hd = k_ref.shape[3]
    scale = 1.0 / (hd ** 0.5)
    f32 = jnp.float32

    for s in (h0_s, c0_s, h1_s, c1_s, h2_s, c2_s):
        s[:] = jnp.zeros_like(s)

    def mm(a, w_ref):
        return jnp.dot(a.astype(w_ref.dtype), w_ref[:],
                       preferred_element_type=f32)

    def lstm(x, h, c, wih_ref, whh_ref, b_ref):
        gates = mm(x, wih_ref) + mm(h, whh_ref) + b_ref[:]
        H = gates.shape[-1] // 4
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c_new = f * c + i * g
        return o * jnp.tanh(c_new), c_new

    def step(t, _):
        h2p = h2_s[:]                                   # (B, H) f32
        # --- MHA image attention (query chain in-kernel) -------------------
        q = mm(h2p, wqp_ref) + bqp_ref[:]               # (B, E) f32
        ctx = jnp.zeros_like(q) + bo_ref[:]             # out-proj bias
        wsum = jnp.zeros(amask_ref.shape[1:2] + (amask_ref.shape[3],), f32)
        am = amask_ref[t]                               # (B, nh, L)
        for h in range(nh):
            kh = k_ref[h].astype(f32)                   # (B, L, hd)
            vh = v_ref[h].astype(f32)
            qh = mm(q, wq_in_ref[h]) + bq_in_ref[h]     # (B, hd)
            s = jnp.sum(qh[:, None, :] * kh, axis=-1) * scale   # (B, L)
            w = jax.nn.softmax(s, axis=-1)
            wd = w * am[:, h, :]
            ctx_h = jnp.sum(wd[:, :, None] * vh, axis=1)        # (B, hd)
            ctx = ctx + mm(ctx_h, wo_ref[h])
            wsum = wsum + wd
        # --- gated word/context fusion -------------------------------------
        gate = jax.nn.sigmoid(gate_w_ref[t] + mm(ctx, wg_c_ref))
        fused = gate * embp_ref[t].astype(f32) + (1.0 - gate) * ctx
        # --- 3-layer LSTM stack with LayerNorm + dropout --------------------
        def ln(x, li):
            mu = jnp.mean(x, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
            n = (x - mu) * jax.lax.rsqrt(var + LN_EPS)
            return n * ln_g_ref[li] + ln_b_ref[li]

        rh0, c0 = lstm(fused, h0_s[:], c0_s[:], wih0_ref, whh0_ref, b0_ref)
        h0 = ln(rh0, 0) * lmask_ref[0, t]
        rh1, c1 = lstm(h0, h1_s[:], c1_s[:], wih1_ref, whh1_ref, b1_ref)
        h1 = ln(rh1, 1) * lmask_ref[1, t]
        rh2, c2 = lstm(h1, h2p, c2_s[:], wih2_ref, whh2_ref, b2_ref)
        h2 = ln(rh2, 2) * lmask_ref[2, t]
        # --- highway output gate --------------------------------------------
        ctxh = mm(ctx, wcp_ref) + bcp_ref[:]
        ghw = jax.nn.sigmoid(mm(h2, whg_h_ref) + mm(ctx, whg_c_ref)
                             + bhw_ref[:])
        enh = ghw * h2 + (1.0 - ghw) * ctxh

        h0_s[:] = h0
        c0_s[:] = c0
        h1_s[:] = h1
        c1_s[:] = c1
        h2_s[:] = h2
        c2_s[:] = c2
        h_out_ref[t] = h2.astype(h_out_ref.dtype)
        enh_out_ref[t] = enh.astype(enh_out_ref.dtype)
        attn_out_ref[t] = (wsum / nh).astype(attn_out_ref.dtype)
        h0_out_ref[t] = h0.astype(h0_out_ref.dtype)
        h1_out_ref[t] = h1.astype(h1_out_ref.dtype)
        c0_out_ref[t] = c0
        c1_out_ref[t] = c1
        c2_out_ref[t] = c2
        return ()

    jax.lax.fori_loop(0, T, step, ())


def _fused_enhanced_core_fwd_call(embp, gate_w, k_h, v_h, amask, lmask,
                                  weights: tuple, *, interpret):
    T, B, E = embp.shape
    L = k_h.shape[2]
    H = weights[7].shape[0] * 0 + weights[13].shape[1] // 4  # whh0 (H,4H)
    dtype = embp.dtype
    f32 = jnp.float32
    operands = [embp, gate_w, k_h, v_h, amask, lmask, *weights]
    est = enhanced_train_vmem_estimate(
        type("C", (), {"embed_size": E, "hidden_size": H})(), T, B, L,
        jnp.dtype(dtype).itemsize)
    return pl.pallas_call(
        _kernel_enhanced_train,
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), dtype),   # h_tops (h2)
            jax.ShapeDtypeStruct((T, B, H), dtype),   # enhanced hidden
            jax.ShapeDtypeStruct((T, B, L), f32),     # attn (head-avg)
            jax.ShapeDtypeStruct((T, B, H), dtype),   # h0 trajectory
            jax.ShapeDtypeStruct((T, B, H), dtype),   # h1 trajectory
            jax.ShapeDtypeStruct((T, B, H), f32),     # c0
            jax.ShapeDtypeStruct((T, B, H), f32),     # c1
            jax.ShapeDtypeStruct((T, B, H), f32),     # c2
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(8)),
        scratch_shapes=[pltpu.VMEM((B, H), f32) for _ in range(6)],
        compiler_params=_vmem_params(est),
        interpret=interpret,
    )(*operands)


# ---------------------------------------------------------------------------
# Analytic backward (XLA reverse scan — see module docstring for why there
# is no reverse-time Pallas variant here)
# ---------------------------------------------------------------------------


def _fused_enhanced_core_bwd(res, cots):
    (embp, gate_w, k_h, v_h, amask, lmask, weights,
     h_tops, enh_t, attns, h0s, h1s, c0s, c1s, c2s) = res
    (wqp, bqp, wq_in, bq_in, wo, bo, wg_c,
     wih0, whh0, b0, wih1, whh1, b1, wih2, whh2, b2, ln_g, ln_b,
     whg_h, whg_c, bhw, wcp, bcp) = [w.astype(jnp.float32) for w in weights]
    dh_tops, denh, dattns = cots
    f32 = jnp.float32
    T, B, E = embp.shape
    nh, _, L, hd = k_h.shape
    H = whh0.shape[0]
    scale = 1.0 / (hd ** 0.5)

    Kf = k_h.astype(f32)
    Vf = v_h.astype(f32)

    h0p, h1p, h2p = (_shift1(x).astype(f32) for x in (h0s, h1s, h_tops))
    c0p, c1p, c2p = (_shift1(x).astype(f32) for x in (c0s, c1s, c2s))

    def lstm_fwd(x, hp, cp, wih, whh, b):
        g = x @ wih + hp @ whh + b
        i = jax.nn.sigmoid(g[:, :H])
        f = jax.nn.sigmoid(g[:, H:2 * H])
        gg = jnp.tanh(g[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(g[:, 3 * H:])
        return i, f, gg, o

    def ln_fwd(x, li):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(var + LN_EPS)
        n = (x - mu) * rstd
        return n, rstd

    def ln_bwd(dy, n, rstd, li, acc_g, acc_b):
        g = dy * ln_g[li, 0]
        dn = g - jnp.mean(g, axis=-1, keepdims=True)
        dx = rstd * (dn - n * jnp.mean(g * n, axis=-1, keepdims=True))
        return dx, acc_g + jnp.sum(dy * n, axis=0), acc_b + jnp.sum(dy, axis=0)

    def cell_bwd(dh, dc_c, i, f, gg, o, c_new, cp):
        tc = jnp.tanh(c_new)
        do = dh * tc
        dc = dc_c + dh * o * (1.0 - tc * tc)
        dg = jnp.concatenate([
            dc * gg * i * (1 - i),
            dc * cp * f * (1 - f),
            dc * i * (1 - gg * gg),
            do * o * (1 - o)], axis=-1)          # (B, 4H)
        return dg, dc * f

    z = jnp.zeros
    acc0 = dict(
        wqp=z((H, E), f32), bqp=z((E,), f32),
        wq_in=z((nh, E, hd), f32), bq_in=z((nh, hd), f32),
        wo=z((nh, hd, E), f32), bo=z((E,), f32), wg_c=z((E, E), f32),
        wih0=z((E, 4 * H), f32), whh0=z((H, 4 * H), f32), b0=z((4 * H,), f32),
        wih1=z((H, 4 * H), f32), whh1=z((H, 4 * H), f32), b1=z((4 * H,), f32),
        wih2=z((H, 4 * H), f32), whh2=z((H, 4 * H), f32), b2=z((4 * H,), f32),
        ln_g=z((3, H), f32), ln_b=z((3, H), f32),
        whg_h=z((H, H), f32), whg_c=z((E, H), f32), bhw=z((H,), f32),
        wcp=z((E, H), f32), bcp=z((H,), f32),
        k=z((nh, B, L, hd), f32), v=z((nh, B, L, hd), f32),
    )
    carry0 = (z((B, H), f32), z((B, H), f32), z((B, H), f32),
              z((B, H), f32), z((B, H), f32), z((B, H), f32), acc0)

    xs = (dh_tops.astype(f32), denh.astype(f32), dattns.astype(f32),
          embp.astype(f32), gate_w.astype(f32), amask.astype(f32),
          jnp.moveaxis(lmask, 0, 1).astype(f32),      # (T, 3, B, H)
          h0s.astype(f32), h1s.astype(f32), h_tops.astype(f32),
          c0s.astype(f32), c1s.astype(f32), c2s.astype(f32),
          h0p, h1p, h2p, c0p, c1p, c2p)

    def step(carry, x):
        dh0_c, dc0_c, dh1_c, dc1_c, dh2_c, dc2_c, acc = carry
        (dht, det, dat, embp_t, gate_w_t, am_t, lm_t,
         h0_t, h1_t, h2_t, c0_t, c1_t, c2_t,
         h0p_t, h1p_t, h2p_t, c0p_t, c1p_t, c2p_t) = x

        # --- recompute the step's forward intermediates ---------------------
        q = h2p_t @ wqp + bqp[0]                             # (B, E)
        qh = jnp.einsum("be,nef->bnf", q, wq_in) + bq_in[:, 0][None]
        s = jnp.einsum("bnf,nblf->bnl", qh, Kf) * scale
        w = jax.nn.softmax(s, axis=-1)
        wd = w * jnp.moveaxis(am_t, 1, 0).transpose(1, 0, 2)  # (B, nh, L)
        ctx_h = jnp.einsum("bnl,nblf->bnf", wd, Vf)
        ctx = jnp.einsum("bnf,nfe->be", ctx_h, wo) + bo[0]
        gate = jax.nn.sigmoid(gate_w_t + ctx @ wg_c)
        fused = gate * embp_t + (1.0 - gate) * ctx
        i0, f0, g0, o0 = lstm_fwd(fused, h0p_t, c0p_t, wih0, whh0, b0[0])
        rh0 = o0 * jnp.tanh(c0_t)
        n0, rstd0 = ln_fwd(rh0, 0)
        i1, f1, g1, o1 = lstm_fwd(h0_t, h1p_t, c1p_t, wih1, whh1, b1[0])
        rh1 = o1 * jnp.tanh(c1_t)
        n1, rstd1 = ln_fwd(rh1, 1)
        i2, f2, g2, o2 = lstm_fwd(h1_t, h2p_t, c2p_t, wih2, whh2, b2[0])
        rh2 = o2 * jnp.tanh(c2_t)
        n2, rstd2 = ln_fwd(rh2, 2)
        ctxh = ctx @ wcp + bcp[0]
        ghw = jax.nn.sigmoid(h2_t @ whg_h + ctx @ whg_c + bhw[0])

        # --- highway backward ------------------------------------------------
        dghw = det * (h2_t - ctxh)
        dgp_hw = dghw * ghw * (1.0 - ghw)
        dctxh = det * (1.0 - ghw)
        dh2 = dh2_c + dht + det * ghw + dgp_hw @ whg_h.T
        dctx = dgp_hw @ whg_c.T + dctxh @ wcp.T

        # --- layer 2 (dropout -> LN -> cell) ---------------------------------
        dy2 = dh2 * lm_t[2]
        drh2, dlg2, dlb2 = ln_bwd(dy2, n2, rstd2, 2, acc["ln_g"][2],
                                  acc["ln_b"][2])
        dg2, dc2_prev = cell_bwd(drh2, dc2_c, i2, f2, g2, o2, c2_t, c2p_t)
        dh1 = dh1_c + dg2 @ wih2.T
        dh2_rec = dg2 @ whh2.T

        # --- layer 1 ----------------------------------------------------------
        dy1 = dh1 * lm_t[1]
        drh1, dlg1, dlb1 = ln_bwd(dy1, n1, rstd1, 1, acc["ln_g"][1],
                                  acc["ln_b"][1])
        dg1, dc1_prev = cell_bwd(drh1, dc1_c, i1, f1, g1, o1, c1_t, c1p_t)
        dh0 = dh0_c + dg1 @ wih1.T
        dh1_prev = dg1 @ whh1.T

        # --- layer 0 ----------------------------------------------------------
        dy0 = dh0 * lm_t[0]
        drh0, dlg0, dlb0 = ln_bwd(dy0, n0, rstd0, 0, acc["ln_g"][0],
                                  acc["ln_b"][0])
        dg0, dc0_prev = cell_bwd(drh0, dc0_c, i0, f0, g0, o0, c0_t, c0p_t)
        dfused = dg0 @ wih0.T
        dh0_prev = dg0 @ whh0.T

        # --- gated fusion back to ctx / embp / gate_w -------------------------
        dgate = dfused * (embp_t - ctx)
        dgp_att = dgate * gate * (1.0 - gate)
        dembp_t = dfused * gate
        dgate_w_t = dgp_att
        dctx = dctx + dfused * (1.0 - gate) + dgp_att @ wg_c.T

        # --- attention backward ------------------------------------------------
        dctx_h = jnp.einsum("be,nfe->bnf", dctx, wo)
        dwd = (jnp.einsum("bnf,nblf->bnl", dctx_h, Vf)
               + dat[:, None, :] / nh)
        dw = dwd * jnp.moveaxis(am_t, 1, 0).transpose(1, 0, 2)
        ds = w * (dw - jnp.sum(w * dw, axis=-1, keepdims=True))
        dqh = jnp.einsum("bnl,nblf->bnf", ds, Kf) * scale
        dq = jnp.einsum("bnf,nef->be", dqh, wq_in)
        dh2_attn = dq @ wqp.T

        acc = dict(
            wqp=acc["wqp"] + h2p_t.T @ dq,
            bqp=acc["bqp"] + jnp.sum(dq, axis=0),
            wq_in=acc["wq_in"] + jnp.einsum("be,bnf->nef", q, dqh),
            bq_in=acc["bq_in"] + jnp.sum(dqh, axis=0).reshape(nh, hd),
            wo=acc["wo"] + jnp.einsum("bnf,be->nfe", ctx_h, dctx),
            bo=acc["bo"] + jnp.sum(dctx, axis=0),
            wg_c=acc["wg_c"] + ctx.T @ dgp_att,
            wih0=acc["wih0"] + fused.T @ dg0,
            whh0=acc["whh0"] + h0p_t.T @ dg0,
            b0=acc["b0"] + jnp.sum(dg0, axis=0),
            wih1=acc["wih1"] + h0_t.T @ dg1,
            whh1=acc["whh1"] + h1p_t.T @ dg1,
            b1=acc["b1"] + jnp.sum(dg1, axis=0),
            wih2=acc["wih2"] + h1_t.T @ dg2,
            whh2=acc["whh2"] + h2p_t.T @ dg2,
            b2=acc["b2"] + jnp.sum(dg2, axis=0),
            ln_g=acc["ln_g"].at[0].set(dlg0).at[1].set(dlg1).at[2].set(dlg2),
            ln_b=acc["ln_b"].at[0].set(dlb0).at[1].set(dlb1).at[2].set(dlb2),
            whg_h=acc["whg_h"] + h2_t.T @ dgp_hw,
            whg_c=acc["whg_c"] + ctx.T @ dgp_hw,
            bhw=acc["bhw"] + jnp.sum(dgp_hw, axis=0),
            wcp=acc["wcp"] + ctx.T @ dctxh,
            bcp=acc["bcp"] + jnp.sum(dctxh, axis=0),
            k=acc["k"] + jnp.einsum("bnl,bnf->nblf", ds, qh) * scale,
            v=acc["v"] + jnp.einsum("bnl,bnf->nblf", wd, dctx_h),
        )
        carry = (dh0_prev, dc0_prev, dh1_prev, dc1_prev,
                 dh2_rec + dh2_attn, dc2_prev, acc)
        return carry, (dembp_t, dgate_w_t)

    (_, _, _, _, _, _, acc), (dembp, dgate_w) = jax.lax.scan(
        step, carry0, xs, reverse=True)

    dweights = (
        acc["wqp"].astype(weights[0].dtype),
        acc["bqp"][None, :].astype(weights[1].dtype),
        acc["wq_in"].astype(weights[2].dtype),
        acc["bq_in"][:, None, :].astype(weights[3].dtype),
        acc["wo"].astype(weights[4].dtype),
        acc["bo"][None, :].astype(weights[5].dtype),
        acc["wg_c"].astype(weights[6].dtype),
        acc["wih0"].astype(weights[7].dtype),
        acc["whh0"].astype(weights[8].dtype),
        acc["b0"][None, :].astype(weights[9].dtype),
        acc["wih1"].astype(weights[10].dtype),
        acc["whh1"].astype(weights[11].dtype),
        acc["b1"][None, :].astype(weights[12].dtype),
        acc["wih2"].astype(weights[13].dtype),
        acc["whh2"].astype(weights[14].dtype),
        acc["b2"][None, :].astype(weights[15].dtype),
        acc["ln_g"][:, None, :].astype(weights[16].dtype),
        acc["ln_b"][:, None, :].astype(weights[17].dtype),
        acc["whg_h"].astype(weights[18].dtype),
        acc["whg_c"].astype(weights[19].dtype),
        acc["bhw"][None, :].astype(weights[20].dtype),
        acc["wcp"].astype(weights[21].dtype),
        acc["bcp"][None, :].astype(weights[22].dtype),
    )
    return (dembp.astype(embp.dtype), dgate_w.astype(gate_w.dtype),
            acc["k"].astype(k_h.dtype), acc["v"].astype(v_h.dtype),
            jnp.zeros_like(amask), jnp.zeros_like(lmask), list(dweights))


_FUSED_ENHANCED_CACHE: Dict = {}


def _get_fused_enhanced_core(interpret: bool):
    if interpret in _FUSED_ENHANCED_CACHE:
        return _FUSED_ENHANCED_CACHE[interpret]

    @jax.custom_vjp
    def core(embp, gate_w, k_h, v_h, amask, lmask, weights):
        h_tops, enh, attns, *_ = _fused_enhanced_core_fwd_call(
            embp, gate_w, k_h, v_h, amask, lmask, tuple(weights),
            interpret=interpret)
        return h_tops, enh, attns

    def fwd(embp, gate_w, k_h, v_h, amask, lmask, weights):
        h_tops, enh, attns, h0s, h1s, c0s, c1s, c2s = (
            _fused_enhanced_core_fwd_call(
                embp, gate_w, k_h, v_h, amask, lmask, tuple(weights),
                interpret=interpret))
        res = (embp, gate_w, k_h, v_h, amask, lmask, tuple(weights),
               h_tops, enh, attns, h0s, h1s, c0s, c1s, c2s)
        return (h_tops, enh, attns), res

    core.defvjp(fwd, _fused_enhanced_core_bwd)
    _FUSED_ENHANCED_CACHE[interpret] = core
    return core


# ---------------------------------------------------------------------------
# Public wrapper
# ---------------------------------------------------------------------------


def _split_enhanced_params(p: Dict, cfg: StudentConfig, dtype):
    """Torch-layout decoder params -> kernel operand tuple (order must match
    _kernel_enhanced_train's weight refs and the bwd's dweights)."""
    E, H = cfg.embed_size, cfg.hidden_size
    nh = NUM_HEADS
    hd = E // nh
    f32 = jnp.float32
    mha = p["image_attention"]
    wq, wk, wv = jnp.split(mha["in_proj_weight"], 3, axis=0)   # (E, E) each
    bq, bk, bv = jnp.split(mha["in_proj_bias"], 3, axis=0)
    # q in-proj per head: y = x @ wq.T; head h takes output cols h*hd:(h+1)*hd
    wq_in = wq.T.reshape(E, nh, hd).transpose(1, 0, 2)          # (nh, E, hd)
    bq_in = bq.reshape(nh, 1, hd)
    wo_full = mha["out_proj"]["weight"]                         # (E, E)
    wo = wo_full.T.reshape(nh, hd, E)                           # per-head rows
    bo = mha["out_proj"]["bias"][None, :]
    wg = p["attention_gate"]["weight"]                          # (E, 2E)
    l0, l1, l2 = p["lstm"]
    whg = p["highway_gate"]["weight"]                           # (H, H+E)
    weights = (
        p["query_projection"]["weight"].T.astype(dtype),        # wqp (H, E)
        p["query_projection"]["bias"][None, :].astype(f32),     # bqp
        wq_in.astype(dtype), bq_in.astype(f32),
        wo.astype(dtype), bo.astype(f32),
        wg[:, E:].T.astype(dtype),                              # wg_c (E, E)
        l0["weight_ih"].T.astype(dtype), l0["weight_hh"].T.astype(dtype),
        (l0["bias_ih"] + l0["bias_hh"])[None, :].astype(f32),
        l1["weight_ih"].T.astype(dtype), l1["weight_hh"].T.astype(dtype),
        (l1["bias_ih"] + l1["bias_hh"])[None, :].astype(f32),
        l2["weight_ih"].T.astype(dtype), l2["weight_hh"].T.astype(dtype),
        (l2["bias_ih"] + l2["bias_hh"])[None, :].astype(f32),
        jnp.stack([n["weight"] for n in p["lstm_norms"]])[:, None, :]
        .astype(f32),                                           # ln_g (3,1,H)
        jnp.stack([n["bias"] for n in p["lstm_norms"]])[:, None, :]
        .astype(f32),                                           # ln_b
        whg[:, :H].T.astype(dtype),                             # whg_h (H, H)
        whg[:, H:].T.astype(dtype),                             # whg_c (E, H)
        p["highway_gate"]["bias"][None, :].astype(f32),
        p["highway_context_projection"]["weight"].T.astype(dtype),  # wcp
        p["highway_context_projection"]["bias"][None, :].astype(f32),
    )
    kv = dict(wk=wk, bk=bk, wv=wv, bv=bv)
    gate_word = dict(w=wg[:, :E], b=p["attention_gate"]["bias"])
    return weights, kv, gate_word


def pallas_enhanced_decoder_scan_train(
    p: Dict, image_features: jnp.ndarray, captions: jnp.ndarray,
    cfg: StudentConfig, *, train: bool = False,
    rng: Optional[jax.Array] = None, interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Differentiable drop-in for student_enhanced.enhanced_decoder_apply:
    fused Pallas forward (residuals saved), analytic reverse-scan backward.
    Returns (logits, h_tops, attns).  Falls back to the lax.scan path when
    the whole-sequence residency exceeds the VMEM cap."""
    if cfg.num_layers != 3:
        raise ValueError("enhanced pallas kernel supports the 3-layer stack")
    from imagecaptioner_tpu.core import modules as M
    from imagecaptioner_tpu.models import student_enhanced as SE

    dtype = image_features.dtype
    T, B = captions.shape
    L = image_features.shape[1]
    E, H = cfg.embed_size, cfg.hidden_size
    nh = NUM_HEADS
    hd = E // nh
    n_shards, dp_mesh, dp_axis = _dp_shards(B)
    if not enhanced_train_fits_vmem(cfg, T, B // n_shards, L,
                                    jnp.dtype(dtype).itemsize):
        return SE.enhanced_decoder_apply(p, image_features, captions, cfg,
                                         train=train, rng=rng,
                                         _skip_pallas=True)

    base_rng = rng if rng is not None else jax.random.PRNGKey(0)
    weights, kv, gate_word = _split_enhanced_params(p, cfg, dtype)

    # word embeddings + learned positions (enhanced_decoder_apply :199-206)
    emb = M.embedding(p["embedding"], captions.T).astype(dtype)   # (B, T, E)
    pos_len = min(T, SE.MAX_POS)
    emb = emb.at[:, :pos_len, :].add(
        p["pos_encoding"][:, :pos_len, :].astype(emb.dtype))
    embp = jnp.transpose(emb, (1, 0, 2))                          # (T, B, E)

    # word half of the attention gate, whole sequence (bias folded here)
    gate_w = (jnp.einsum("tbe,ef->tbf", embp,
                         gate_word["w"].T.astype(dtype),
                         preferred_element_type=jnp.float32)
              + gate_word["b"].astype(jnp.float32))               # f32

    # time-invariant K/V, per head (modules.multi_head_attention proj semantics)
    def proj(w, b):
        y = jax.lax.dot_general(
            image_features, w.astype(dtype), (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + b
        return y.astype(dtype)

    def heads(x):  # (B, L, E) -> (nh, B, L, hd)
        return x.reshape(B, L, nh, hd).transpose(2, 0, 1, 3)

    k_h = heads(proj(kv["wk"], kv["bk"]))
    v_h = heads(proj(kv["wv"], kv["bv"]))

    # dropout masks with the scan path's exact key derivation
    if train:
        keep_a = 1.0 - ATTN_DROPOUT
        keep_l = 1.0 - cfg.dropout

        def masks_at(t):
            r = jax.random.split(jax.random.fold_in(base_rng, t),
                                 1 + cfg.num_layers)
            am = jnp.where(
                jax.random.bernoulli(r[0], keep_a, (B, nh, 1, L)),
                1.0 / keep_a, 0.0)[:, :, 0, :]
            if cfg.dropout > 0.0:
                lm = jnp.stack([
                    jnp.where(jax.random.bernoulli(r[1 + i], keep_l, (B, H)),
                              1.0 / keep_l, 0.0)
                    for i in range(cfg.num_layers)])
            else:
                lm = jnp.ones((cfg.num_layers, B, H))
            return am.astype(jnp.float32), lm.astype(jnp.float32)

        amask, lmask_t = jax.vmap(masks_at)(jnp.arange(T))
        lmask = jnp.moveaxis(lmask_t, 1, 0)          # (3, T, B, H)
    else:
        amask = jnp.ones((T, B, nh, L), jnp.float32)
        lmask = jnp.ones((3, T, B, H), jnp.float32)

    core = _get_fused_enhanced_core(interpret)
    if n_shards > 1:
        from jax.sharding import PartitionSpec as P

        def spec(bd):
            return P(*([None] * bd + [dp_axis]))

        core = jax.shard_map(
            core, mesh=dp_mesh,
            in_specs=(spec(1), spec(1), spec(1), spec(1), spec(1), spec(2),
                      jax.tree.map(lambda _: P(), list(weights))),
            out_specs=(P(None, dp_axis),) * 3,
            check_vma=False)
    h_tops, enh, attns = core(embp, gate_w, k_h, v_h, amask, lmask,
                              list(weights))
    proj_rng = jax.random.fold_in(base_rng, T) if train else None
    logits = SE.enhanced_output_projection(p, enh, cfg, train=train,
                                           rng=proj_rng)
    return logits, h_tops, attns
