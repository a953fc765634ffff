"""Fused Pallas kernels for the beam-search decode step's attention cores.

Replaces, for every decoder layer of every beam decode step, the XLA
lowering of (a) the ancestry self-attention over the KV cache
(models/transformer._attend_anc) and (b) the beam-grouped cross-attention
over the encoder memory (reference being replaced: the per-step
full-prefix torch decoder re-run, teacher_model.py:156-229).

Why kernels: per-HLO profiles of the packed beam
(benchmarks/serving_hlo_profile.json) showed the XLA decode loop dominated
by artifacts the math doesn't require —

  * every elementwise/softmax op on the small-minor-dim score tensors
    ((N,H,K,K,S) self scores with K=5 -> 8 sublanes and S=21 -> 128 lanes;
    (N,H,K,L) cross scores) pads 2-10x, inflating effective traffic (the
    cross softmax alone measured 3.6 ms/call at 68 GB/s at N=32);
  * each of the ~10 small XLA ops per layer-step pays dispatch overhead.

In the kernels every score/softmax/context stays a 2-D VMEM tile, and
programs process ``G`` images each so the ~2-3 us fixed program cost
(programs run sequentially on the single tensorcore) amortizes.

The KV-cache row write stays in XLA on the head-major (B, H, S, hd)
cache (measured variants that moved the update in-kernel paid full in+out
block DMA on the aliased cache and lost; the full layout ledger is in
docs/round3_notes.md and transformer.init_kv_cache).

Numerics match the XLA ancestry path: scores contract in f32, the joint
softmax over (slot, position) sees -inf at non-lineage entries (exp = 0
exactly), and the context accumulates in f32 (parity-tested in
tests/test_pallas_beam_attn.py, interpret mode on CPU and compiled under
IC_TPU_TESTS=1).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic's default scoped-VMEM limit is 16 MiB; the blocks here are a few
# hundred KB at production shapes, but guard anyway (same discipline as
# ops/pallas_lstm VMEM budgets).
_VMEM_CAP = 100 << 20


class BeamAttnVmemExceeded(RuntimeError):
    """Raised at trace time when a program block would not fit VMEM."""


def beam_attn_impl() -> str:
    """Dispatch policy for the fused beam-attention step.

    Currently 'xla' everywhere: the per-(image, head) kernel formulation is
    INSTRUCTION-bound at production shapes (measured 2026-08-18 on v5e,
    N=8/K=5/S=21/E=512: ~0.34 us per (g, h) pair across ~12 tiny
    dot/mask/softmax ops -> self 1.8 ms + cross 1.5 ms per packed-beam
    call, vs the XLA ancestry path's 3.06 ms whole call), so the kernels
    lose despite eliminating XLA's padded-softmax and strided-update
    pathologies.  Set IC_BEAM_ATTN = pallas to run them on TPU anyway,
    interpret for the CPU interpreter (parity tests), xla to force the
    fallback."""
    import os

    forced = os.environ.get("IC_BEAM_ATTN")
    if forced in ("pallas", "interpret", "xla"):
        return forced
    return "xla"


def _pick_g(n: int, per_image_bytes: int) -> int:
    """Images per program: amortize fixed program overhead while keeping
    the block a few MB."""
    for g in (8, 4, 2, 1):
        if n % g == 0 and int(g * per_image_bytes * 1.4) + (2 << 20) <= _VMEM_CAP:
            return g
    return 1


def _self_bytes(K: int, H: int, S: int, E: int, itemsize: int) -> int:
    return 2 * S * K * E * itemsize + K * E * itemsize + K * S * 4


def _cross_bytes(K: int, L: int, E: int, itemsize: int) -> int:
    return 2 * L * E * itemsize + K * E * itemsize


def check_vmem(batch: int, anc, max_len: int, E: int, num_heads: int, *,
               mem_len: int, itemsize: int) -> None:
    """Trace-time refusal for shapes whose per-image slices would not fit a
    program block (callers fall back to the XLA path BEFORE building any
    kernel calls, so a decode is all-kernel or all-XLA)."""
    N, K, S = anc.shape
    sb = _self_bytes(K, num_heads, max_len, E, itemsize)
    cb = _cross_bytes(K, mem_len, E, itemsize)
    if (int(sb * 1.4) + (2 << 20) > _VMEM_CAP
            or int(cb * 1.4) + (2 << 20) > _VMEM_CAP):
        raise BeamAttnVmemExceeded(
            f"beam attention blocks K={K} H={num_heads} S={max_len} E={E} "
            f"L={mem_len} need ~{max(sb, cb) / 2**20:.0f} MiB of VMEM "
            f"per image (cap {_VMEM_CAP / 2**20:.0f})")


def _make_self_kernel(G: int, K: int, H: int, S: int, hd: int, scale: float,
                      exact: bool):
    # Mosaic rejects contract_precision=fp32 on bf16 operands ("Bad lhs
    # type") — and doesn't need it: the MXU multiplies bf16 inputs exactly
    # into an f32 accumulator.  The HIGHEST pin only matters in interpret
    # mode, where the CPU dot would otherwise truncate f32 operands to
    # bf16 (the pathology measured in models/transformer._attend_anc).
    prec = jax.lax.Precision.HIGHEST if exact else None

    def kernel(pos_ref, q_ref, anc_ref, kc_ref, vc_ref, o_ref):
        pos = pos_ref[0, 0]
        s_ids = jax.lax.broadcasted_iota(jnp.int32, (K, S), 1)
        neg = jnp.float32(-jnp.inf)
        for g in range(G):
            anc = anc_ref[g]                                 # (K, S) int32
            # (Ki, S) lineage+causal mask per candidate slot j — everything
            # below stays 2-D (single-tile VMEM ops; 3-D dots / stacked
            # score tensors would relayout or fail to lower in Mosaic)
            lives = [(anc == j) & (s_ids <= pos) for j in range(K)]
            for h in range(H):
                q_h = q_ref[g, h]                            # (K, hd)
                # per-slot scores (Ki, S): q_h (K, hd) x k_j (S, hd)^T
                logits = []
                for j in range(K):
                    k_j = kc_ref[g * K + j, h]               # (S, hd)
                    s_j = jax.lax.dot_general(
                        q_h, k_j,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec) * scale
                    logits.append(jnp.where(lives[j], s_j, neg))
                # joint softmax over (slot, position) — 2-D reductions
                m = logits[0]
                for j in range(1, K):
                    m = jnp.maximum(m, logits[j])
                m = jnp.max(m, axis=1, keepdims=True)        # (Ki, 1)
                es = [jnp.exp(l - m) for l in logits]
                z = es[0].sum(axis=1, keepdims=True)
                for j in range(1, K):
                    z = z + es[j].sum(axis=1, keepdims=True)
                # context: sum_j w_j @ v[j], f32 accumulation
                ctx = None
                for j in range(K):
                    w_j = (es[j] / z).astype(vc_ref.dtype)
                    v_j = vc_ref[g * K + j, h]               # (S, hd)
                    c_j = jax.lax.dot_general(
                        w_j, v_j,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=prec)
                    ctx = c_j if ctx is None else ctx + c_j
                # o is (G, H, K, hd) so this store is a clean 2-D view
                o_ref[g, h] = ctx.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_beam_self_attention(
    q: jnp.ndarray, kv: Dict, anc: jnp.ndarray, pos, *, num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Ancestry beam self-attention over the (already updated) head-major
    cache.

    q (R, 1, E) projected queries for this step; ``kv`` holds the
    head-major caches {'k','v'} (R, H, S, hd) with this step's rows
    already written at ``pos``; ``anc`` (N, K, S) int32 ancestry (R = N*K,
    position ``pos`` set to identity by the caller); ``pos`` scalar int32.
    Returns the attention output (R, 1, E).
    """
    R, _, E = q.shape
    N, K, S = anc.shape
    H = num_heads
    hd = E // H
    itemsize = jnp.dtype(kv["k"].dtype).itemsize
    G = _pick_g(N, _self_bytes(K, H, S, E, itemsize))
    est = int(G * _self_bytes(K, H, S, E, itemsize) * 1.4) + (2 << 20)
    if est > _VMEM_CAP:
        raise BeamAttnVmemExceeded(
            f"beam self-attention block K={K} H={H} S={S} E={E} needs ~"
            f"{est / 2**20:.0f} MiB of VMEM (cap {_VMEM_CAP / 2**20:.0f})")

    # q head-major-first (N, H, K, hd): per-head kernel slices index only
    # leading axes (Mosaic rejects the reshapes other layouts would need);
    # the transpose is R*E elements — trivial
    qh = q.reshape(N, K, H, hd).transpose(0, 2, 1, 3)
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1, 1)

    cache_blk = pl.BlockSpec((G * K, H, S, hd), lambda n: (n, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_self_kernel(G, K, H, S, hd, 1.0 / float(hd) ** 0.5, interpret),
        grid=(N // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pos (1,1)
            pl.BlockSpec((G, H, K, hd), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, K, S), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),   # anc
            cache_blk,
            cache_blk,
        ],
        out_specs=pl.BlockSpec((G, H, K, hd), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, K, hd), kv["v"].dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(est, 16 * 1024 * 1024)),
        interpret=interpret,
    )(pos_arr, qh, anc, kv["k"], kv["v"])
    return out.transpose(0, 2, 1, 3).reshape(R, 1, E)


def _make_cross_kernel(G: int, K: int, H: int, L: int, hd: int, scale: float,
                      exact: bool):
    prec = jax.lax.Precision.HIGHEST if exact else None

    def kernel(q_ref, mk_ref, mv_ref, o_ref):
        for g in range(G):
            for h in range(H):
                q_h = q_ref[g, h]                            # (K, hd)
                k_h = mk_ref[g, h]                           # (L, hd)
                s = jax.lax.dot_general(
                    q_h, k_h, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec) * scale                  # (K, L)
                m = jnp.max(s, axis=1, keepdims=True)
                e = jnp.exp(s - m)
                w = (e / e.sum(axis=1, keepdims=True)).astype(mv_ref.dtype)
                v_h = mv_ref[g, h]                           # (L, hd)
                ctx = jax.lax.dot_general(
                    w, v_h, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec)
                o_ref[g, h] = ctx.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("mem_group", "num_heads", "interpret"))
def fused_beam_cross_attention(
    q: jnp.ndarray, mem_kv: Dict, *, mem_group: int, num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Beam-grouped cross-attention over precomputed encoder memory K/V.

    q (R, 1, E) with R = N * mem_group (an image's beams are consecutive
    rows); ``mem_kv`` {'k','v'} head-major (N, H, L, hd).  Unmasked
    per-query softmax over L — the XLA equivalent padded its (N, H, K, L)
    score tensor and ran the softmax chain at 68 GB/s effective
    (3.6 ms/call at N=32).  Returns (R, 1, E).
    """
    R, _, E = q.shape
    K = mem_group
    N = R // K
    H = num_heads
    hd = E // H
    L = mem_kv["k"].shape[2]
    itemsize = jnp.dtype(mem_kv["k"].dtype).itemsize
    G = _pick_g(N, _cross_bytes(K, L, E, itemsize))
    est = int(G * _cross_bytes(K, L, E, itemsize) * 1.4) + (2 << 20)
    if est > _VMEM_CAP:
        raise BeamAttnVmemExceeded(
            f"beam cross-attention block K={K} H={H} L={L} E={E} needs ~"
            f"{est / 2**20:.0f} MiB of VMEM (cap {_VMEM_CAP / 2**20:.0f})")

    qh = q.reshape(N, K, H, hd).transpose(0, 2, 1, 3)
    out = pl.pallas_call(
        _make_cross_kernel(G, K, H, L, hd, 1.0 / float(hd) ** 0.5, interpret),
        grid=(N // G,),
        in_specs=[
            pl.BlockSpec((G, H, K, hd), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, L, hd), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, H, L, hd), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, H, K, hd), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, K, hd), mem_kv["v"].dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(est, 16 * 1024 * 1024)),
        interpret=interpret,
    )(qh, mem_kv["k"], mem_kv["v"])
    return out.transpose(0, 2, 1, 3).reshape(R, 1, E)
