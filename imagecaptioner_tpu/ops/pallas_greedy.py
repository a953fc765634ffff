"""Fully-fused Pallas greedy decode for the full student.

The entire autoregressive loop — embedding lookup, Bahdanau attention,
2-layer LSTM, vocab projection, argmax, END masking, token feedback — runs in
ONE ``pallas_call``.  Weights, the embedding table, and the recurrent state
stay resident in VMEM for all ``max_length`` steps: zero HBM weight re-reads
and zero kernel-launch latency between steps (the residual cost of the
``lax.scan`` decode path).

Mosaic-specific choices:
  * embedding lookup = one-hot (B, V) @ table (V, E) on the MXU (dynamic row
    gather does not lower; 16x3072x256 is ~12 MFLOPs — noise);
  * batched context contraction as mul+reduce over L=49;
  * token / done state kept as (B, 1) int32/bool VMEM scratch.

Semantics identical to ops/decode.greedy_decode_student (temperature divide,
argmax in f32, PAD after first <END>); parity-tested in
tests/test_pallas_greedy.py.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imagecaptioner_tpu.core.config import StudentConfig
from imagecaptioner_tpu.data.vocabulary import END, PAD, START
from imagecaptioner_tpu.ops.pallas_lstm import (
    _VMEM_CAP_BYTES, _split_params, _vmem_estimate, _vmem_params)


class GreedyVmemExceeded(ValueError):
    """Raised (at trace time) when the fused greedy kernel's whole-decode
    VMEM residency would exceed the safe cap — an EXPECTED, shape-dependent
    condition the dispatcher (ops/decode.best_greedy_decode_student) handles
    by falling back to the lax.scan path."""


def _check_vmem(est: int, what: str) -> None:
    if est > _VMEM_CAP_BYTES:
        raise GreedyVmemExceeded(
            f"{what}: estimated VMEM {est / 2**20:.1f} MiB exceeds the "
            f"{_VMEM_CAP_BYTES / 2**20:.0f} MiB cap")


def _make_kernel(T: int, temperature: float):
    def kernel(emb_table_ref, f_proj_ref, feats_ref,
               w_h_ref, w_c_ref, w_e_ref, b_c_ref,
               w_ih0_ref, w_hh0_ref, b0_ref,
               w_ih1_ref, w_hh1_ref, b1_ref,
               fc1_w_ref, fc1_b_ref, fc2_w_ref, fc2_b_ref,
               out_ref,
               h0_s, c0_s, h1_s, c1_s, tok_s, done_s, out_s):
        B = feats_ref.shape[0]
        V = emb_table_ref.shape[0]
        Tp = out_s.shape[1]

        h0_s[:] = jnp.zeros_like(h0_s)
        c0_s[:] = jnp.zeros_like(c0_s)
        h1_s[:] = jnp.zeros_like(h1_s)
        c1_s[:] = jnp.zeros_like(c1_s)
        tok_s[:] = jnp.full_like(tok_s, START)
        done_s[:] = jnp.zeros_like(done_s)
        out_s[:] = jnp.full_like(out_s, PAD)

        feats = feats_ref[:]
        f_proj = f_proj_ref[:].astype(jnp.float32)
        vocab_ids = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
        # dynamic lane-dim writes must be 128-aligned on TPU, so tokens
        # accumulate via a masked update into a padded scratch instead
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (B, Tp), 1)

        def lstm_cell(x, h, c, w_ih_ref, w_hh_ref, b_ref):
            gates = (jnp.dot(x, w_ih_ref[:], preferred_element_type=jnp.float32)
                     + jnp.dot(h.astype(x.dtype), w_hh_ref[:],
                               preferred_element_type=jnp.float32)
                     + b_ref[:])
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            return h_new, c_new

        def step(t, _):
            tok = tok_s[:]                      # (B, 1) int32
            done = done_s[:]                    # (B, 1) int32 (0/1)
            # --- embedding via one-hot matmul ---
            one_hot = (vocab_ids == tok).astype(emb_table_ref.dtype)
            emb = jnp.dot(one_hot, emb_table_ref[:],
                          preferred_element_type=jnp.float32)   # (B, E) f32
            # --- attention ---
            h1 = h1_s[:]
            hw = jnp.dot(h1.astype(w_h_ref.dtype), w_h_ref[:],
                         preferred_element_type=jnp.float32)
            scores = jnp.sum(jnp.tanh(f_proj + hw[:, None, :]), axis=-1)
            w = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.sum(w[:, :, None] * feats.astype(jnp.float32), axis=1)
            # --- combine ---
            x0 = (jnp.dot(emb.astype(w_e_ref.dtype), w_e_ref[:],
                          preferred_element_type=jnp.float32)
                  + jnp.dot(ctx.astype(w_c_ref.dtype), w_c_ref[:],
                            preferred_element_type=jnp.float32)
                  + b_c_ref[:]).astype(feats.dtype)
            # --- LSTM x2 ---
            h0_new, c0_new = lstm_cell(x0, h0_s[:], c0_s[:],
                                       w_ih0_ref, w_hh0_ref, b0_ref)
            h1_new, c1_new = lstm_cell(h0_new.astype(feats.dtype), h1,
                                       c1_s[:], w_ih1_ref, w_hh1_ref, b1_ref)
            h0_s[:] = h0_new
            c0_s[:] = c0_new
            h1_s[:] = h1_new
            c1_s[:] = c1_new
            # --- vocab projection ---
            hid = jax.nn.relu(
                jnp.dot(h1_new.astype(fc1_w_ref.dtype), fc1_w_ref[:],
                        preferred_element_type=jnp.float32) + fc1_b_ref[:])
            logits = (jnp.dot(hid.astype(fc2_w_ref.dtype), fc2_w_ref[:],
                              preferred_element_type=jnp.float32)
                      + fc2_b_ref[:])                            # (B, V) f32
            if temperature != 1.0:
                logits = logits / temperature
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
            is_end = (nxt == END).astype(jnp.int32)
            emit = jnp.where((done + is_end) > 0,
                             jnp.full_like(nxt, PAD), nxt)       # (B, 1)
            done_new = jnp.minimum(done + is_end, 1)
            tok_s[:] = jnp.where(done_new > 0, tok, nxt)
            done_s[:] = done_new
            out_s[:] = jnp.where(col_ids == t, emit, out_s[:])
            return ()

        jax.lax.fori_loop(0, T, step, ())
        out_ref[:] = out_s[:, :T]

    return kernel


def _make_compact_kernel(T: int, temperature: float):
    """Compact-student variant: dot-product attention, additive fusion,
    1-layer LSTM, plain linear head (student_model_compact.py:114-191)."""

    def kernel(emb_table_ref, feats_ref,
               w_attn_ref, b_attn_ref,
               w_ih_ref, w_hh_ref, b_ref,
               out_w_ref, out_b_ref,
               out_ref,
               h_s, c_s, tok_s, done_s, out_s):
        B = feats_ref.shape[0]
        V = emb_table_ref.shape[0]
        Tp = out_s.shape[1]

        h_s[:] = jnp.zeros_like(h_s)
        c_s[:] = jnp.zeros_like(c_s)
        tok_s[:] = jnp.full_like(tok_s, START)
        done_s[:] = jnp.zeros_like(done_s)
        out_s[:] = jnp.full_like(out_s, PAD)

        feats = feats_ref[:]
        vocab_ids = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (B, Tp), 1)

        def step(t, _):
            tok = tok_s[:]
            done = done_s[:]
            one_hot = (vocab_ids == tok).astype(emb_table_ref.dtype)
            emb = jnp.dot(one_hot, emb_table_ref[:],
                          preferred_element_type=jnp.float32)
            h = h_s[:]
            h_proj = (jnp.dot(h.astype(w_attn_ref.dtype), w_attn_ref[:],
                              preferred_element_type=jnp.float32)
                      + b_attn_ref[:])                          # (B, E)
            scores = jnp.sum(h_proj[:, None, :]
                             * feats.astype(jnp.float32), axis=-1)
            w = jax.nn.softmax(scores, axis=-1)
            ctx = jnp.sum(w[:, :, None] * feats.astype(jnp.float32), axis=1)
            x0 = (emb + ctx).astype(feats.dtype)                # add fusion
            gates = (jnp.dot(x0, w_ih_ref[:],
                             preferred_element_type=jnp.float32)
                     + jnp.dot(h.astype(x0.dtype), w_hh_ref[:],
                               preferred_element_type=jnp.float32)
                     + b_ref[:])
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c_s[:] + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            h_s[:] = h_new
            c_s[:] = c_new
            logits = (jnp.dot(h_new.astype(out_w_ref.dtype), out_w_ref[:],
                              preferred_element_type=jnp.float32)
                      + out_b_ref[:])
            if temperature != 1.0:
                logits = logits / temperature
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)[:, None]
            is_end = (nxt == END).astype(jnp.int32)
            emit = jnp.where((done + is_end) > 0,
                             jnp.full_like(nxt, PAD), nxt)
            done_new = jnp.minimum(done + is_end, 1)
            tok_s[:] = jnp.where(done_new > 0, tok, nxt)
            done_s[:] = done_new
            out_s[:] = jnp.where(col_ids == t, emit, out_s[:])
            return ()

        jax.lax.fori_loop(0, T, step, ())
        out_ref[:] = out_s[:, :T]

    return kernel


@functools.partial(jax.jit, static_argnames=("cfg", "max_length",
                                             "temperature", "interpret"))
def pallas_greedy_decode_compact(
    params: Dict, feats: jnp.ndarray, cfg: StudentConfig, *,
    max_length: int = 20, temperature: float = 1.0, interpret: bool = False,
) -> jnp.ndarray:
    """Fused greedy decode for the compact (1-layer) student."""
    if cfg.num_layers != 1:
        raise ValueError("compact greedy kernel supports 1-layer LSTM")
    B, L, E = feats.shape
    H = cfg.hidden_size
    dtype = feats.dtype
    p = params["decoder"]
    l0 = p["lstm"][0]
    operands = [
        p["embedding"]["weight"].astype(dtype), feats,
        p["attention"]["weight"].T.astype(dtype),
        p["attention"]["bias"].astype(jnp.float32)[None, :],
        l0["weight_ih"].T.astype(dtype), l0["weight_hh"].T.astype(dtype),
        (l0["bias_ih"] + l0["bias_hh"]).astype(jnp.float32)[None, :],
        p["output_projection"]["weight"].T.astype(dtype),
        p["output_projection"]["bias"].astype(jnp.float32)[None, :],
    ]
    est = _vmem_estimate(
        operands, extra_shapes=[((B, max_length), jnp.int32)],
        scratch_bytes=(2 * B * H + 2 * B + B * max(128, max_length)) * 4)
    _check_vmem(est, "compact greedy kernel")
    return pl.pallas_call(
        _make_compact_kernel(max_length, temperature),
        out_shape=jax.ShapeDtypeStruct((B, max_length), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, 1), jnp.int32),
            pltpu.VMEM((B, 1), jnp.int32),
            pltpu.VMEM((B, max(128, max_length)), jnp.int32),
        ],
        compiler_params=_vmem_params(est),
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit, static_argnames=("cfg", "max_length",
                                             "temperature", "interpret"))
def pallas_greedy_decode_student(
    params: Dict, feats: jnp.ndarray, cfg: StudentConfig, *,
    max_length: int = 20, temperature: float = 1.0, interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ops/decode.greedy_decode_student (full student, argmax).
    feats: refined features (B, L, E).  Returns (B, max_length) int32."""
    if cfg.num_layers != 2:
        raise ValueError("pallas greedy kernel supports the 2-layer full student")
    B, L, E = feats.shape
    H = cfg.hidden_size
    dtype = feats.dtype

    p = params["decoder"]
    sp = _split_params(p, cfg)
    f_proj = (jnp.einsum("ble,ef->blf", feats, sp["w_f"].astype(dtype),
                         preferred_element_type=jnp.float32)
              + sp["b_attn"]).astype(dtype)
    op = p["output_projection"]

    operands = [
        p["embedding"]["weight"].astype(dtype),
        f_proj, feats,
        sp["w_h"].astype(dtype), sp["w_c"].astype(dtype),
        sp["w_e"].astype(dtype), sp["b_comb"].astype(jnp.float32)[None, :],
        sp["w_ih0"].astype(dtype), sp["w_hh0"].astype(dtype),
        sp["b0"].astype(jnp.float32),
        sp["w_ih1"].astype(dtype), sp["w_hh1"].astype(dtype),
        sp["b1"].astype(jnp.float32),
        op["fc1"]["weight"].T.astype(dtype),
        op["fc1"]["bias"].astype(jnp.float32)[None, :],
        op["fc2"]["weight"].T.astype(dtype),
        op["fc2"]["bias"].astype(jnp.float32)[None, :],
    ]
    est = _vmem_estimate(
        operands, extra_shapes=[((B, max_length), jnp.int32)],
        scratch_bytes=(4 * B * H + 2 * B + B * max(128, max_length)) * 4)
    _check_vmem(est, "full greedy kernel")
    out = pl.pallas_call(
        _make_kernel(max_length, temperature),
        out_shape=jax.ShapeDtypeStruct((B, max_length), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, 1), jnp.int32),
            pltpu.VMEM((B, 1), jnp.int32),
            pltpu.VMEM((B, max(128, max_length)), jnp.int32),
        ],
        compiler_params=_vmem_params(est),
        interpret=interpret,
    )(*operands)
    return out
