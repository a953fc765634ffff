"""Pytree checkpointing (npz + JSON structure), reference-schema compatible.

The reference checkpoints are ``torch.save`` dicts (SURVEY §5.4):
``{'epoch', 'model_state_dict'/'student_state_dict', 'projectors_state_dict',
'optimizer_state_dict', 'scheduler_state_dict', 'val_loss'/'val_bleu',
'vocab_size', 'model_config', 'distillation_config'}``.  This module saves
arbitrary pytrees (nested dict/list with array/scalar/string leaves) under the
same logical keys to a single ``.npz`` — portable, dependency-free, and
mesh-agnostic (arrays are gathered to host before saving).

A ``.pth`` converter for the torch reference lives in utils/torch_convert.py.
"""

from __future__ import annotations

import io
import json
import os
from typing import Any, Dict, List, Tuple

import jax
import numpy as np

_SENTINEL_NONE = "__none__"


def _flatten(tree: Any, prefix: str, out: Dict[str, np.ndarray],
             spec: Dict[str, Any]) -> Any:
    """Returns a JSON-able structure mirror; arrays go to ``out``."""
    if isinstance(tree, dict):
        return {k: _flatten(v, f"{prefix}/{k}", out, spec)
                for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        kind = "tuple" if isinstance(tree, tuple) else "list"
        return {"__seq__": kind,
                "items": [_flatten(v, f"{prefix}/{i}", out, spec)
                          for i, v in enumerate(tree)]}
    if tree is None:
        return _SENTINEL_NONE
    if isinstance(tree, (str,)):
        return {"__str__": tree}
    if isinstance(tree, bool):
        return {"__bool__": tree}
    if isinstance(tree, int):
        return {"__int__": tree}
    if isinstance(tree, float):
        return {"__float__": tree}
    arr = np.asarray(jax.device_get(tree))
    out[prefix] = arr
    return {"__array__": prefix}


def _unflatten(node: Any, arrays: Dict[str, np.ndarray]) -> Any:
    if node == _SENTINEL_NONE:
        return None
    if isinstance(node, dict):
        if "__seq__" in node:
            items = [_unflatten(v, arrays) for v in node["items"]]
            return tuple(items) if node["__seq__"] == "tuple" else items
        if "__array__" in node:
            return arrays[node["__array__"]]
        if "__str__" in node:
            return node["__str__"]
        if "__bool__" in node:
            return bool(node["__bool__"])
        if "__int__" in node:
            return int(node["__int__"])
        if "__float__" in node:
            return float(node["__float__"])
        return {k: _unflatten(v, arrays) for k, v in node.items()}
    raise ValueError(f"corrupt checkpoint node: {node!r}")


def _snapshot(tree: Any) -> Dict[str, np.ndarray]:
    """Flatten + fetch every leaf to host numpy NOW.  Train steps donate
    their state buffers, so the snapshot must complete before the caller
    takes another step — only the (slow) disk write may be deferred."""
    arrays: Dict[str, np.ndarray] = {}
    spec: Dict[str, Any] = {}
    structure = _flatten(tree, "", arrays, spec)
    arrays["__structure__"] = np.frombuffer(
        json.dumps(structure).encode(), dtype=np.uint8)
    return arrays


def _write_npz(path: str, arrays: Dict[str, np.ndarray]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # atomic-ish write
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def save_checkpoint(path: str, tree: Any) -> None:
    _write_npz(path, _snapshot(tree))


# --- async writes: a multi-hundred-MB npz takes ~a minute on a slow host,
# stalling training at every best-model save.  The snapshot (device_get) is
# synchronous; the write runs on ONE background thread (FIFO, so repeated
# saves to the same path land in order).  wait_for_saves() must run before
# reading a just-saved file or letting the process exit. ---------------------

_save_lock = __import__("threading").Lock()
_pending: List[Any] = []
_executor = None


def _get_executor():
    global _executor
    if _executor is None:
        from concurrent.futures import ThreadPoolExecutor

        _executor = ThreadPoolExecutor(max_workers=1,
                                       thread_name_prefix="ckpt-save")
    return _executor


def save_checkpoint_async(path: str, tree: Any):
    """Snapshot ``tree`` to host now, write the npz in the background.
    Returns the Future (exceptions surface there and in wait_for_saves)."""
    arrays = _snapshot(tree)
    fut = _get_executor().submit(_write_npz, path, arrays)
    with _save_lock:
        _pending.append(fut)
    return fut


def wait_for_saves() -> None:
    """Block until every queued async checkpoint write has landed; re-raises
    the first write error.  Trainers call this before returning so callers
    (e.g. run_kd_pipeline, which loads best_student_model.npz immediately
    after training) always see complete files."""
    with _save_lock:
        futs = list(_pending)
        _pending.clear()
    for f in futs:
        f.result()


def load_checkpoint(path: str) -> Any:
    with np.load(path, allow_pickle=False) as z:
        arrays = {k: z[k] for k in z.files}
    structure = json.loads(bytes(arrays.pop("__structure__")).decode())
    return _unflatten(structure, arrays)


def load_student_checkpoint(path: str):
    """Rebuild a trained student from a KD checkpoint: dispatch on the
    recorded ``model_config.model_type`` (full / compact / enhanced — same
    switch as eval/evaluate_student.py:279-287).  Returns
    ``(params, cfg, model_state)``."""
    import jax.numpy as jnp

    from imagecaptioner_tpu.core.config import (
        compact_student_config, enhanced_student_config, full_student_config)

    ckpt = load_checkpoint(path)
    mc = dict(ckpt.get("model_config", {}))
    variant = mc.pop("model_type", "full")
    try:
        factory = {"full": full_student_config,
                   "compact": compact_student_config,
                   "enhanced": enhanced_student_config}[variant]
    except KeyError:
        raise ValueError(f"unknown student model_type {variant!r}") from None
    cfg = factory(int(ckpt["vocab_size"]), **mc)
    params = jax.tree.map(jnp.asarray, ckpt["student_state_dict"]["params"])
    mstate = jax.tree.map(jnp.asarray,
                          ckpt["student_state_dict"]["model_state"])
    return params, cfg, mstate
