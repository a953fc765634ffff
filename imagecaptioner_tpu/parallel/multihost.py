"""Multi-host data parallelism over DCN (SURVEY §2.10).

The reference is single-machine (src/train_teacher.py:70 — one cuda/cpu
device).  Here, scaling past one host is process-level plumbing on top of the
same sharded train steps: every host runs this program, ``jax.devices()``
becomes the global device set, and the sharding annotations that drive DP on
one chip drive DCN collectives across hosts unchanged.  This module owns the
three things only the multi-process path needs:

  * :func:`initialize` — ``jax.distributed.initialize`` wrapper (no-op for
    single-process runs, so trainers can call it unconditionally);
  * :func:`host_shard` — deterministic, equal-size split of dataset indices
    per host (host-count-agnostic loader sharding);
  * :func:`global_batch` — assemble a *global* batch array from each host's
    local shard via ``jax.make_array_from_process_local_data``: each host
    uploads only what it loaded, and the jitted step sees one global batch
    sharded over the ``data`` axis.

The 2-process loopback test (tests/test_multihost.py) drives exactly this
path: two OS processes, a shared coordinator, global arrays, and a gradient
reduced across both processes' shards.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from imagecaptioner_tpu.core import mesh as MS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Any] = None,
    **kwargs: Any,
) -> bool:
    """Join the multi-process runtime; returns True if distributed mode is on.

    With no arguments and no cluster environment, this is a no-op (False) —
    single-host trainers can call it unconditionally.  On TPU pods the args
    are auto-detected from the environment; on CPU/GPU pass them explicitly.
    Extra kwargs forward to ``jax.distributed.initialize`` (timeouts etc.).
    """
    import jax

    if (coordinator_address is None and num_processes is None
            and process_id is None):
        return False
    if num_processes is not None and num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
        **kwargs,
    )
    return True


def process_info() -> Dict[str, int]:
    import jax

    return {"process_index": jax.process_index(),
            "process_count": jax.process_count()}


def host_shard(
    n_examples: int,
    *,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> np.ndarray:
    """This host's dataset indices: strided, deterministic, equal-size.

    Every host gets exactly ``n_examples // process_count`` indices
    (equal-size keeps per-host batch shapes static; the remainder examples
    are dropped, matching the loader's drop_last semantics)."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = n_examples // pc
    return np.arange(n_examples)[pi::pc][:per]


def global_batch(mesh, local: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Assemble the global on-device batch from this host's local shard.

    ``images`` (B_local, ...) and ``lengths`` (B_local,) concatenate over the
    leading axis; time-major ``captions`` (T, B_local) over axis 1.  Each
    host transfers only its own shard; the result is one global jax.Array
    sharded over the mesh's ``data`` axis, exactly what the mesh-agnostic
    train steps consume."""
    import jax

    out: Dict[str, Any] = {}
    for k, v in local.items():
        if k.startswith("captions"):
            spec = MS.time_major_spec(v.ndim)  # (T, B) — batch on axis 1
        else:
            spec = MS.batch_spec(v.ndim)
        from jax.sharding import NamedSharding

        out[k] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(v))
    return out
