"""Tensor parallelism over the mesh's ``model`` axis.

The models here (<=35M params) fit one chip, so the reference needs no TP —
but the framework reserves the ``model`` mesh axis so scaling past one chip
is *a config, not a rewrite* (SURVEY §2.10).  This module makes that real:
:func:`teacher_tp_shardings` returns a pytree of ``NamedSharding`` that
Megatron-style-shards the teacher's matmul weights over ``model``:

  * ViT blocks: qkv out-dim / attn-proj in-dim, mlp fc1 out-dim / fc2 in-dim
  * decoder layers: in_proj out-dim / out_proj in-dim, ffn fc1 out / fc2 in
  * embedding + vocab head: vocab-dim sharded
  * norms, biases of in-dim-sharded layers, cls/pos tokens: replicated

Placing params with these shardings and jitting the unchanged model
functions is all it takes — XLA GSPMD propagates the shardings through the
computation and inserts the all-gather/reduce-scatter collectives over ICI
(the scaling-book recipe: pick a mesh, annotate, let XLA do collectives).
Numerical equivalence with the replicated run is test-enforced on a virtual
(data, model) CPU mesh (tests/test_sharding.py).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from imagecaptioner_tpu.core.config import TeacherConfig
from imagecaptioner_tpu.core.mesh import MODEL_AXIS


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def _mha_tp(mesh: Mesh) -> Dict[str, Any]:
    """Packed qkv row-sharded (out dim), out_proj column-sharded (in dim)."""
    return {
        "in_proj_weight": _ns(mesh, MODEL_AXIS, None),
        "in_proj_bias": _ns(mesh, MODEL_AXIS),
        "out_proj": {"weight": _ns(mesh, None, MODEL_AXIS),
                     "bias": _ns(mesh)},
    }


def _lin_out_tp(mesh: Mesh) -> Dict[str, Any]:
    """Linear sharded over its OUTPUT features (torch layout (out, in))."""
    return {"weight": _ns(mesh, MODEL_AXIS, None),
            "bias": _ns(mesh, MODEL_AXIS)}


def _lin_in_tp(mesh: Mesh) -> Dict[str, Any]:
    """Linear sharded over its INPUT features; bias replicated (it adds to
    the already-reduced output)."""
    return {"weight": _ns(mesh, None, MODEL_AXIS), "bias": _ns(mesh)}


def teacher_tp_shardings(mesh: Mesh, params: Dict, cfg: TeacherConfig):
    """NamedSharding pytree for the teacher params, matching ``params``'
    structure.  Everything not explicitly matmul-sharded is replicated."""
    rep = _ns(mesh)
    shardings = jax.tree.map(lambda _: rep, params)

    for blk in shardings["encoder"]["blocks"]:
        blk["attn"]["qkv"] = _lin_out_tp(mesh)
        blk["attn"]["proj"] = _lin_in_tp(mesh)
        blk["mlp"]["fc1"] = _lin_out_tp(mesh)
        blk["mlp"]["fc2"] = _lin_in_tp(mesh)

    for layer in shardings["decoder"]:
        layer["self_attn"] = _mha_tp(mesh)
        layer["multihead_attn"] = _mha_tp(mesh)
        layer["linear1"] = _lin_out_tp(mesh)
        layer["linear2"] = _lin_in_tp(mesh)

    # vocab-dim sharding for the embedding table and the output head
    shardings["embedding"] = {"weight": _ns(mesh, MODEL_AXIS, None)}
    shardings["fc_out"] = _lin_out_tp(mesh)
    return shardings


def place_teacher_tp(mesh: Mesh, params: Dict, cfg: TeacherConfig) -> Dict:
    """Device-put the teacher params with TP shardings over ``model``."""
    return jax.tree.map(jax.device_put, params,
                        teacher_tp_shardings(mesh, params, cfg))
