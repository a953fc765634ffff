"""Data-parallel serving: caption image batches sharded over a device mesh.

The reference serves one image per eager call on one GPU
(/root/reference/streamlit_app.py:281-307,
/root/reference/src/evaluate_student.py:99-201).  The TPU-native serving
path shards the image batch over the mesh's ``data`` axis with replicated
parameters and lets GSPMD partition the whole encode + decode program:
captioning is per-image independent, so no collectives are needed beyond
the early-exit while_loop's all-images-done predicate (one scalar ``or``
reduction per decode step).  One jitted callable scales unchanged from the
1-device mesh to a full slice — the same scaling story as the trainers
(core/mesh.py).

Factories return jitted closures so callers pay sharding placement once
per model, not per request.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from imagecaptioner_tpu.core import mesh as MX
from imagecaptioner_tpu.core.config import StudentConfig, TeacherConfig
from imagecaptioner_tpu.models import student as SM
from imagecaptioner_tpu.models import teacher as TM
from imagecaptioner_tpu.ops import decode as D


def make_dp_beam_captioner(
    params: Dict, cfg: TeacherConfig, mesh, *, max_length: int = 20,
    beam_size: int = 5, length_penalty: float = 0.6,
    pipelined_pack: int = 0,
) -> Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Teacher beam-search serving over a mesh.

    Returns a jitted ``fn(images_nchw) -> (seqs (N,K,S), scores (N,K),
    lens (N,K))`` with the batch sharded over ``data`` end to end
    (ViT encode, packed K-beams-in-batch decode).  ``N`` must be divisible
    by the mesh's data-axis size.  Token-identical to the single-device
    packed search (tests/test_sharding.py::test_dp_beam_serving_matches_single).

    ``pipelined_pack > 0``: two-stage serving (encode + memory-K/V at the
    full per-device batch, decode lax.map-chained in packs of that many
    images per device — decode.beam_search_teacher_pipelined); the global
    batch must then be divisible by n_data * pipelined_pack.
    """
    params = jax.device_put(params, MX.replicated(mesh))

    @functools.partial(
        jax.jit,
        in_shardings=(MX.data_sharding(mesh, 4),),
        out_shardings=(MX.data_sharding(mesh, 3), MX.data_sharding(mesh, 2),
                       MX.data_sharding(mesh, 2)),
    )
    def fn(images):
        memory = TM.encode_image(params, images, cfg)
        if pipelined_pack:
            # decode must run PER SHARD: the pipelined path lax.maps over
            # packs, and GSPMD cannot split a scan's leading axis across
            # devices (it would gather per iteration); shard_map gives each
            # device its own shorter pack chain over its local batch
            # (same full-manual construction as pallas_attention's DP path)
            from jax.sharding import PartitionSpec as P

            spec = P(MX.DATA_AXIS)

            def local_decode(mem_local):
                return D.beam_search_teacher_pipelined(
                    params, mem_local, cfg, pack=pipelined_pack,
                    max_length=max_length, beam_size=beam_size,
                    length_penalty=length_penalty)

            return jax.shard_map(
                local_decode, mesh=mesh, in_specs=(spec,),
                out_specs=(spec, spec, spec), check_vma=False)(memory)
        return D.beam_search_teacher_packed(
            params, memory, cfg, max_length=max_length, beam_size=beam_size,
            length_penalty=length_penalty)

    return _guard_batch(fn, mesh, per_shard_multiple=pipelined_pack or 1)


def _guard_batch(fn, mesh, per_shard_multiple: int = 1):
    """Raise a readable error for batch sizes the mesh can't split evenly
    (GSPMD's own failure is an opaque sharding error).
    ``per_shard_multiple``: each shard's local batch must additionally be a
    multiple of this (the pipelined beam's pack width)."""
    n_data = mesh.shape[MX.DATA_AXIS]
    need = n_data * per_shard_multiple

    @functools.wraps(fn)
    def call(images):
        if images.shape[0] % need:
            raise ValueError(
                f"batch {images.shape[0]} not divisible by the mesh's "
                f"data axis ({n_data})"
                + (f" x pack {per_shard_multiple}"
                   if per_shard_multiple > 1 else "")
                + "; pad the trailing batch to a multiple")
        return fn(images)

    return call


def make_dp_greedy_captioner(
    params: Dict, model_state, cfg: StudentConfig, mesh, *,
    max_length: int = 20, temperature: float = 1.0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Student greedy serving over a mesh: ``fn(images_nchw) -> (N, T)``
    tokens, batch sharded over ``data``.

    Uses the XLA decode core — ``pallas_greedy``'s whole-loop kernel is
    opaque to GSPMD (it would all-gather the batch and run replicated, the
    failure mode the training kernels avoid via shard_map); at serving
    batch-per-chip sizes the scan path partitions cleanly and the encoder
    dominates the call (benchmarks/serving_hlo_profile.json: decode is ~4%
    of the greedy call).
    """
    params = jax.device_put(params, MX.replicated(mesh))
    model_state = jax.device_put(model_state, MX.replicated(mesh))

    @functools.partial(
        jax.jit,
        in_shardings=(MX.data_sharding(mesh, 4),),
        out_shardings=MX.data_sharding(mesh, 2),
    )
    def fn(images):
        _, refined, _ = SM.encode_image(params, model_state, images, cfg,
                                        train=False)
        return D.greedy_decode_student(params, refined, cfg,
                                       max_length=max_length,
                                       temperature=temperature)

    return _guard_batch(fn, mesh)
