"""Device mesh, named shardings, and collectives.

The reference has no distributed training of any kind (SURVEY §2.10) — this
module is the new first-class component that makes every trainer data-parallel
by default.  Design (per the scaling-book recipe): pick a mesh, annotate
shardings on the jitted step's inputs/outputs, and let XLA insert the
collectives (gradient ``psum`` over ICI for data-parallel, DCN across hosts).

Axes:
  * ``data``  — batch sharding (DP).  Gradients reduce over ICI.
  * ``model`` — reserved tensor-parallel axis.  Models here (<=25M params) fit
    one chip, so TP is a config, not a rewrite: shardings below accept a mesh
    with a non-trivial ``model`` axis and keep parameters replicated across it
    unless a module opts in.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Build a 2-D (data, model) mesh. Default: all devices on the data axis.

    Single-chip v5e-1 is the degenerate 1x1 mesh — the same jitted train step
    runs unchanged from 1 chip to a full slice.
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices), 1)
    if shape[0] * shape[1] != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; trailing axes replicated."""
    spec = [DATA_AXIS] + [None] * (ndim - 1)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch onto the mesh, batch-axis sharded over ``data``.

    Works for pytrees whose leaves all carry the batch on axis 0 (images
    (B,3,H,W)) — time-major caption tensors (T,B) must be passed through
    :func:`shard_time_major` instead.
    """
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch)


def shard_time_major(mesh: Mesh, x: Any) -> Any:
    """Shard a time-major (T, B, ...) array over ``data`` on axis 1 —
    captions are (T, B) throughout (data_loader.py:98 contract)."""

    def _put(a):
        spec = [None, DATA_AXIS] + [None] * (np.ndim(a) - 2)
        return jax.device_put(a, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(_put, x)


def replicate(mesh: Mesh, tree: Any) -> Any:
    return jax.tree.map(lambda x: jax.device_put(x, replicated(mesh)), tree)


def batch_spec(ndim: int = 1) -> P:
    return P(*([DATA_AXIS] + [None] * (ndim - 1)))


def time_major_spec(ndim: int = 2) -> P:
    return P(*([None, DATA_AXIS] + [None] * (ndim - 2)))


def local_device_count() -> int:
    return jax.local_device_count()


def psum_over_data(x, axis_name: str = DATA_AXIS):
    """Explicit collective for shard_map-style code paths."""
    return jax.lax.psum(x, axis_name)
