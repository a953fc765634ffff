"""Fused Pallas TPU attention core (SURVEY §2.9 N2).

Replaces the XLA einsum->softmax->einsum attention core in
``core.modules.multi_head_attention`` (reference: torch
nn.MultiheadAttention inside src/teacher_model.py's TransformerDecoder) and
the ViT block MHSA (src/teacher_model.py ViT-S/16 backbone, 197 tokens).

One grid program per (batch, head): scores, the f32 softmax, and the
context matmul all happen in VMEM — the (Lq, Lk) probability matrix never
round-trips to HBM (the XLA path materializes (B, H, Lq, Lk) between the
two matmuls).  QKV/out projections stay outside: they are large
MXU-friendly matmuls XLA already handles at full tilt.

Differentiable: a custom VJP recomputes the identical XLA core under
``jax.vjp`` in the backward — numerics match the non-fused path (the
parity tests cover values and gradients), so the kernel is usable in
training as well as for the frozen-teacher KD forward and beam decode.

Supported: optional static ``causal`` masking (the teacher decoder's
self-attention; requires Lq == Lk as in training-time teacher forcing).
Attention-weight dropout and ``need_weights`` fall back to the XLA path in
``multi_head_attention``.
"""

from __future__ import annotations

import functools
from contextlib import contextmanager
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DP_POLICY: Optional[Tuple] = None  # (mesh, data-axis name)


@contextmanager
def data_parallel_attention(mesh, axis: str = "data"):
    """Keep the fused kernel under data-only sharding (VERDICT r2 #3).

    Inside this context, ``multi_head_attention`` runs the Pallas core
    per-shard via ``shard_map`` over the mesh's ``axis`` (batch) axis —
    instead of silently degrading to the XLA core the moment training goes
    multi-chip.  Like ``sp.sequence_sharding``, entering ``jax.set_mesh``
    keys every jit cache on the policy, so traces made outside the context
    can't leak in (and vice versa).  DP trainers activate this whenever they
    train over a mesh; TP/SP keep the XLA core (head/token axes are split
    there, which the per-batch-shard kernel cannot express)."""
    global _DP_POLICY
    prev = _DP_POLICY
    _DP_POLICY = (mesh, axis)
    try:
        with jax.set_mesh(mesh):
            yield
    finally:
        _DP_POLICY = prev


def dp_attention_policy():
    return _DP_POLICY


def default_attn_impl() -> str:
    """Runtime policy: fused kernel on single-device TPU and on DP-only
    meshes (per-shard via shard_map — see ``data_parallel_attention``); XLA
    elsewhere.

    Under TP/SP sharding the XLA path is used: a ``pallas_call`` is opaque
    to GSPMD, so operands sharded over heads/tokens would be all-gathered
    around it instead of partitioning the attention — the XLA core
    partitions cleanly.  CPU tests exercise the kernel in interpret mode
    explicitly."""
    if jax.default_backend() != "tpu":
        return "xla"
    from imagecaptioner_tpu.parallel import sp

    if sp.active():
        return "xla"
    if len(jax.devices()) == 1 or _DP_POLICY is not None:
        return "pallas"
    return "xla"


# Fused-vs-XLA crossover, measured per-HLO on the v5e chip
# (scripts/bench_attn_impl.py -> benchmarks/attn_impl_sweep.json): the
# kernel's one-program-per-(batch, head) grid runs tiny (L, 64) matmuls, so
# while the materialized f32 score tensor still fits on-chip the XLA
# batched-GEMM core wins 2.8-3.7x (B16 H6 L197 ViT teacher: 22.5 us XLA vs
# 82.5 us fused; up through B*H*Lq*Lk*4 ~ 75 MB).  Past ~100 MB XLA falls
# off a cliff (B16 H8 L448: 398 us vs 184 us fused) and the fused kernel
# wins 2.2-2.9x from there up.  Dispatch on that boundary.
FUSED_MIN_SCORE_BYTES = 96 * 1024 * 1024


def fused_attention_pays_off(batch: int, heads: int, lq: int, lk: int) -> bool:
    """True when the fused kernel beats the XLA core at these shapes
    (``batch`` = per-device rows: divide by the DP shard count first)."""
    return batch * heads * lq * lk * 4 >= FUSED_MIN_SCORE_BYTES


def attention_auto(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
                   causal: bool, scale: float) -> jnp.ndarray:
    """Policy + measured-shape dispatch for a plain (no mask tensor, no
    weight dropout) attention core: the fused kernel — per-batch-shard
    under the DP policy — when ``fused_attention_pays_off``, the XLA core
    otherwise.  Shared by multi_head_attention and the ViT blocks."""
    if default_attn_impl() == "pallas":
        pol = dp_attention_policy()
        shards = pol[0].shape[pol[1]] if pol is not None else 1
        if fused_attention_pays_off(max(q.shape[0] // shards, 1),
                                    q.shape[1], q.shape[2], k.shape[2]):
            if pol is not None:
                return fused_attention_sharded(q, k, v, causal, scale,
                                               pol[0], pol[1])
            return fused_attention_core(q, k, v, causal, scale)
    return attention_core_xla(q, k, v, causal=causal, scale=scale)


def attention_core_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       *, causal: bool, scale: float) -> jnp.ndarray:
    """Reference core: q (B,H,Lq,D), k/v (B,H,Lk,D) -> (B,H,Lq,D).
    Mirrors core.modules.multi_head_attention's unmasked/causal math."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        lq, lk = logits.shape[-2], logits.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
        logits = jnp.where((col > row)[None, None], -jnp.inf, logits)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _make_kernel(causal: bool, scale: float):
    def kernel(q_ref, k_ref, v_ref, o_ref):
        q = q_ref[0]          # (Lq, D)
        k = k_ref[0]          # (Lk, D)
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if causal:
            lq, lk = s.shape
            row = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (lq, lk), 1)
            s = jnp.where(col > row, -jnp.inf, s)
        p = jax.nn.softmax(s, axis=-1)
        o_ref[0] = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(v.dtype)

    return kernel


def _kernel_call(q, k, v, causal: bool, scale: float, interpret: bool):
    B, H, Lq, D = q.shape
    Lk = k.shape[2]
    # Mixed input dtypes (e.g. f32 caption queries against a bf16 memory in
    # teacher training) follow the XLA core's contract: scores accumulate in
    # f32 with q/k promoted to their result type, and the OUTPUT dtype is
    # v.dtype — the kernel's out ref must be typed accordingly or Mosaic
    # rejects the store ("Invalid dtype for swap").
    qk_dtype = jnp.result_type(q.dtype, k.dtype)
    q = q.astype(qk_dtype)
    k = k.astype(qk_dtype)
    qf = q.reshape(B * H, Lq, D)
    kf = k.reshape(B * H, Lk, D)
    vf = v.reshape(B * H, Lk, D)
    # per-program VMEM: q/k/v blocks + f32 score matrix + out
    est = (q.dtype.itemsize * (Lq + 2 * Lk) * D + 4 * Lq * Lk
           + q.dtype.itemsize * Lq * D)
    est = int(est * 1.3) + (2 << 20)
    out = pl.pallas_call(
        _make_kernel(causal, scale),
        grid=(B * H,),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq, D), v.dtype),
        in_specs=[
            pl.BlockSpec((1, Lq, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lk, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Lq, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(est, 16 * 1024 * 1024)),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(B, H, Lq, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_attention_core(q, k, v, causal: bool = False, scale: float = 1.0,
                         interpret: bool = False):
    """Fused (B,H,Lq,D) attention core; backward recomputes via XLA."""
    return _kernel_call(q, k, v, causal, scale, interpret)


def _fwd(q, k, v, causal, scale, interpret):
    return _kernel_call(q, k, v, causal, scale, interpret), (q, k, v)


def _bwd(causal, scale, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: attention_core_xla(q_, k_, v_, causal=causal,
                                              scale=scale), q, k, v)
    return vjp(g)


fused_attention_core.defvjp(_fwd, _bwd)


def _sharded_kernel_call(q, k, v, causal, scale, mesh, axis, interpret):
    from jax.sharding import PartitionSpec as P

    spec = P(axis)

    def core(q_, k_, v_):
        return _kernel_call(q_, k_, v_, causal, scale, interpret)

    # Full-manual shard_map (every mesh axis manual, check_vma off): the
    # partial data-only manual mode trips a vma-propagation bug in pallas
    # interpret mode, and check_vma=True requires vma plumbing the HLO
    # interpreter rejects.  DP meshes are (n, 1) (core/mesh.create_mesh
    # default), so making the size-1 'model' axis manual costs nothing;
    # axes unmentioned in the specs replicate.
    return jax.shard_map(core, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def fused_attention_sharded(q, k, v, causal: bool = False, scale: float = 1.0,
                            mesh=None, axis: str = "data",
                            interpret: bool = False):
    """Run the fused core per-batch-shard under ``shard_map`` over the mesh's
    data axis: each device computes attention for its own batch shard with
    the Pallas kernel, no cross-device communication (attention is
    batch-independent).  Other mesh axes stay in GSPMD auto mode; the
    backward recomputes through the XLA core (GSPMD partitions it).

    Requires the batch dim divisible by the data axis (the DP trainers
    guarantee this, train/common.maybe_mesh)."""
    return _sharded_kernel_call(q, k, v, causal, scale, mesh, axis, interpret)


def _sharded_fwd(q, k, v, causal, scale, mesh, axis, interpret):
    return _sharded_kernel_call(q, k, v, causal, scale, mesh, axis,
                                interpret), (q, k, v)


def _sharded_bwd(causal, scale, mesh, axis, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: attention_core_xla(q_, k_, v_, causal=causal,
                                              scale=scale), q, k, v)
    return vjp(g)


fused_attention_sharded.defvjp(_sharded_fwd, _sharded_bwd)
