"""Fused Pallas TPU kernel: full-student LSTM + Bahdanau attention scan.

Replaces the hot decoder recurrence (SURVEY §2.9 N1).  The whole T-step scan
runs in ONE ``pallas_call``: weights and recurrent state stay resident in
VMEM across all timesteps instead of being re-read from HBM every step.

Algebraic restructuring (numerics preserved exactly):
  * reference attention computes ``tanh(Linear([h_expand, feats]))`` per step
    (student_model.py:186-194).  Linear splits over the concat:
    ``W = [W_h; W_f]`` — the ``feats @ W_f + b`` half is time-invariant and
    is computed ONCE outside the kernel; per step only ``h @ W_h`` remains.
  * ``attention_combine([emb_t, ctx])`` splits the same way: the
    ``emb @ W_e`` half is precomputed for the whole sequence (teacher
    forcing); per step only ``ctx @ W_c``.
  * the vocab projection stays outside (one big (T*B, H) matmul after the
    scan, models/lstm.py).

Per step, in-kernel (bf16 matmuls, f32 accumulation and cell state):
  hW = h1 @ W_h; scores = sum_E tanh(F_proj + hW); w = softmax;
  ctx = w @ feats; x0 = embW[t] + ctx @ W_c + b_c;
  2x LSTM cells (torch gate order).

The kernel is forward-only (decode/eval paths); training uses the
differentiable ``lax.scan`` in models/lstm.py.  Numerical parity is tested in
tests/test_pallas_lstm.py (interpret mode on CPU; IC_TPU_TESTS=1 compiles on
the real chip).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imagecaptioner_tpu.core.config import StudentConfig


def _kernel(emb_w_ref, f_proj_ref, feats_ref,
            w_h_ref, w_c_ref, b_c_ref,
            w_ih0_ref, w_hh0_ref, b0_ref,
            w_ih1_ref, w_hh1_ref, b1_ref,
            h_out_ref, attn_out_ref,
            h0_s, c0_s, h1_s, c1_s):
    """One program; loops T steps with state in VMEM scratch.

    Shapes (E=embed, H=hidden, L=tokens, B=batch, T=steps):
      emb_w   (T, B, E)   emb @ W_e + b_attn_combine (precomputed)
      f_proj  (B, L, E)   feats @ W_f + b_attn (precomputed)
      feats   (B, L, E)
      w_h     (H, E)      attention: h-half of the split weight
      w_c     (E, E)      attention_combine: ctx-half
      b_c     (1, E)      zero (bias already folded into emb_w)
      w_ih/w_hh (in, 4H) / (H, 4H); b (1, 4H) = b_ih + b_hh
      h_out   (T, B, H), attn_out (T, B, L)
      scratch h/c (B, H) f32
    """
    T = emb_w_ref.shape[0]
    B = emb_w_ref.shape[1]
    H = w_h_ref.shape[0]

    h0_s[:] = jnp.zeros_like(h0_s)
    c0_s[:] = jnp.zeros_like(c0_s)
    h1_s[:] = jnp.zeros_like(h1_s)
    c1_s[:] = jnp.zeros_like(c1_s)

    feats = feats_ref[:]        # (B, L, E)
    f_proj = f_proj_ref[:]      # (B, L, E)

    def lstm_cell(x, h, c, w_ih_ref, w_hh_ref, b_ref):
        gates = (
            jnp.dot(x, w_ih_ref[:], preferred_element_type=jnp.float32)
            + jnp.dot(h.astype(x.dtype), w_hh_ref[:],
                      preferred_element_type=jnp.float32)
            + b_ref[:]
        )  # (B, 4H) f32
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return h_new, c_new

    def step(t, _):
        h1 = h1_s[:]  # top-layer hidden drives attention (reference h[-1])
        # --- attention ---
        hw = jnp.dot(h1.astype(w_h_ref.dtype), w_h_ref[:],
                     preferred_element_type=jnp.float32)      # (B, E)
        scores = jnp.sum(jnp.tanh(f_proj.astype(jnp.float32)
                                  + hw[:, None, :]), axis=-1)  # (B, L)
        w = jax.nn.softmax(scores, axis=-1)                    # (B, L) f32
        # batched (B,L)x(B,L,E) contraction as mul+reduce — Mosaic has no
        # batch-dim dot, and L=49 makes this cheap VPU work
        ctx = jnp.sum(w[:, :, None] * feats.astype(jnp.float32),
                      axis=1)                                  # (B, E) f32
        # --- combine ---
        x0 = (emb_w_ref[t] .astype(jnp.float32)
              + jnp.dot(ctx.astype(w_c_ref.dtype), w_c_ref[:],
                        preferred_element_type=jnp.float32)
              + b_c_ref[:])                                    # (B, E)
        x0 = x0.astype(feats.dtype)
        # --- 2-layer LSTM ---
        h0_new, c0_new = lstm_cell(x0, h0_s[:], c0_s[:],
                                   w_ih0_ref, w_hh0_ref, b0_ref)
        h1_new, c1_new = lstm_cell(h0_new.astype(feats.dtype), h1_s[:],
                                   c1_s[:], w_ih1_ref, w_hh1_ref, b1_ref)
        h0_s[:] = h0_new
        c0_s[:] = c0_new
        h1_s[:] = h1_new
        c1_s[:] = c1_new
        h_out_ref[t] = h1_new.astype(h_out_ref.dtype)
        attn_out_ref[t] = w.astype(attn_out_ref.dtype)
        return ()

    jax.lax.fori_loop(0, T, step, ())


def _split_params(p: Dict, cfg: StudentConfig):
    """Split the torch-layout decoder params into kernel operands."""
    H, E = cfg.hidden_size, cfg.embed_size
    w_attn = p["attention"]["weight"]          # (E, H+E) torch (out, in)
    w_h = w_attn[:, :H].T                      # (H, E)
    w_f = w_attn[:, H:].T                      # (E, E)
    b_attn = p["attention"]["bias"]
    w_comb = p["attention_combine"]["weight"]  # (E, 2E)
    w_e = w_comb[:, :E].T                      # (E, E)
    w_c = w_comb[:, E:].T                      # (E, E)
    b_comb = p["attention_combine"]["bias"]
    l0, l1 = p["lstm"][0], p["lstm"][1]
    return dict(
        w_h=w_h, w_f=w_f, b_attn=b_attn, w_e=w_e, w_c=w_c, b_comb=b_comb,
        w_ih0=l0["weight_ih"].T, w_hh0=l0["weight_hh"].T,
        b0=(l0["bias_ih"] + l0["bias_hh"])[None, :],
        w_ih1=l1["weight_ih"].T, w_hh1=l1["weight_hh"].T,
        b1=(l1["bias_ih"] + l1["bias_hh"])[None, :],
    )


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def pallas_full_decoder_scan(
    p: Dict, image_features: jnp.ndarray, captions: jnp.ndarray,
    cfg: StudentConfig, *, interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in forward for models/lstm.full_decoder_apply (eval mode):
    returns (logits (T,B,V), h_tops (T,B,H), attn (T,B,L))."""
    from imagecaptioner_tpu.core import modules as M
    from imagecaptioner_tpu.models.lstm import output_projection

    if cfg.num_layers != 2:
        raise ValueError("pallas kernel supports the 2-layer full student")
    T, B = captions.shape
    L = image_features.shape[1]
    E, H = cfg.embed_size, cfg.hidden_size
    dtype = image_features.dtype

    sp = _split_params(p, cfg)
    # precomputed time-invariant pieces (big MXU matmuls, XLA-side)
    f_proj = (jnp.einsum("ble,ef->blf", image_features, sp["w_f"].astype(dtype),
                         preferred_element_type=jnp.float32)
              + sp["b_attn"]).astype(dtype)                      # (B,L,E)
    emb = M.embedding(p["embedding"], captions).astype(dtype)     # (T,B,E)
    emb_w = (jnp.einsum("tbe,ef->tbf", emb, sp["w_e"].astype(dtype),
                        preferred_element_type=jnp.float32)
             + sp["b_comb"]).astype(dtype)                        # (T,B,E)
    b_c = jnp.zeros((1, E), jnp.float32)  # bias folded into emb_w

    operands = [
        emb_w, f_proj, image_features,
        sp["w_h"].astype(dtype), sp["w_c"].astype(dtype), b_c,
        sp["w_ih0"].astype(dtype), sp["w_hh0"].astype(dtype),
        sp["b0"].astype(jnp.float32),
        sp["w_ih1"].astype(dtype), sp["w_hh1"].astype(dtype),
        sp["b1"].astype(jnp.float32),
    ]
    h_tops, attns = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), dtype),
            jax.ShapeDtypeStruct((T, B, L), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands),
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)

    logits = output_projection(p["output_projection"], h_tops, cfg)
    return logits, h_tops, attns
