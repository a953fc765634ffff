"""Parallelism: device meshes, named shardings, DP-by-default train steps.

The reference has no distributed training (SURVEY §2.10); this package is the
framework's first-class replacement for a NCCL/MPI communication backend —
XLA collectives over ICI/DCN, driven purely by sharding annotations:

  * :func:`create_mesh` — (data, model) mesh; 1 chip is the degenerate case.
  * :func:`shard_batch` / :func:`shard_time_major` — input placement; the
    jitted train steps in ``train/steps.py`` are mesh-agnostic, so sharding
    the batch over ``data`` IS data-parallelism (gradient psum inserted by
    XLA over ICI).
  * ``model`` axis is reserved for tensor parallelism: the models here
    (<=35M params) fit one chip, so TP stays a config, not a rewrite.
  * Multi-host: :mod:`parallel.multihost` — ``initialize()`` (no-op when
    single-process), ``host_shard()`` per-host loader sharding, and
    ``global_batch()`` assembling global arrays from per-host shards; the
    sharded train steps are unchanged from 1 chip to a pod.  Exercised with
    two real OS processes over a loopback coordinator
    (tests/test_multihost.py).

Correctness is tested on an 8-device virtual CPU mesh
(tests/test_sharding.py): the sharded step reproduces single-device losses
and parameter updates exactly.
"""

from imagecaptioner_tpu.core.mesh import (  # noqa: F401
    DATA_AXIS, MODEL_AXIS, batch_spec, create_mesh, data_sharding,
    local_device_count, psum_over_data, replicate, replicated, shard_batch,
    shard_time_major, time_major_spec)
from imagecaptioner_tpu.parallel import multihost, sp, tp  # noqa: F401

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "batch_spec", "create_mesh", "data_sharding",
    "local_device_count", "multihost", "psum_over_data", "replicate",
    "replicated", "shard_batch", "shard_time_major", "time_major_spec",
    "sp", "tp",
]
