"""Shared trainer plumbing: accumulation stacking, history, early stopping."""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Iterator, List, Optional

import numpy as np

# Per-variant KD-decoder implementation, decided by RECORDED measurement
# (benchmarks/results.json config #4 decoder arms), the same discipline the
# attention dispatch uses (`ops.pallas_attention.fused_attention_pays_off`):
#   full     -> pallas  (kernel wins: KD streamed 1,807 img/s, greedy
#                        6,515 vs 4,541)
#   compact  -> scan    (scan wins the device-rate streamed arm 2,706 vs
#                        2,558 img/s, r4 re-measure — consistent with the
#                        r3 standalone record; the 1-layer H=256 cell is
#                        too small for kernel overhead — VERDICT r3 #4)
#   enhanced -> pallas  (kernel wins: streamed 1,148 vs 1,085, standalone
#                        664.7 vs 255.5 img/s, r4)
# IC_DECODER_IMPL=scan|pallas overrides for A/B runs.
_RECORDED_DECODER_IMPL = {"full": "pallas", "compact": "scan",
                          "enhanced": "pallas"}


def recorded_decoder_impl(variant: str) -> str:
    """The measured-winner KD decoder impl for ``variant`` on TPU
    ('scan' on every other backend — the kernels are TPU Mosaic)."""
    import jax

    if variant not in _RECORDED_DECODER_IMPL:
        # same message/type on every backend — without this, a bad variant
        # died with a raw KeyError on TPU but fell through to 'scan' on CPU
        # (ADVICE r4 #1)
        raise ValueError(f"unknown student_variant {variant!r}")
    env = os.environ.get("IC_DECODER_IMPL")
    if env in ("scan", "pallas"):
        return env
    if jax.default_backend() != "tpu":
        return "scan"
    return _RECORDED_DECODER_IMPL[variant]


def flatten_step_metrics(fetched: List[Dict]) -> List[Dict]:
    """Normalize a mix of scalar metric dicts (one per step) and stacked
    metric dicts ((k,) arrays from a chained device-data dispatch,
    steps.make_device_data_step) into one flat per-step list."""
    out: List[Dict] = []
    for m in fetched:
        v0 = next(iter(m.values()))
        if np.ndim(v0) == 1:
            out.extend({k: v[i] for k, v in m.items()}
                       for i in range(len(v0)))
        else:
            out.append(m)
    return out


def stacked_batches(loader, accumulation_steps: int, *, mesh=None,
                    prefetch: int = 2) -> Iterator[Dict]:
    """Group loader batches into stacks of ``A`` for in-step accumulation.

    Trailing incomplete groups are dropped — equivalent to the reference,
    which only steps the optimizer on accumulation boundaries.

    With a ``mesh``, stacks are device-prefetched with the batch dimension
    sharded over the ``data`` axis (data parallelism; no-op on one chip).
    """
    def gen():
        buf: List[Dict] = []
        for batch in loader:
            buf.append(batch)
            if len(buf) == accumulation_steps:
                yield {
                    k: np.stack([b[k] for b in buf]) for k in buf[0]
                }
                buf = []

    if mesh is None:
        yield from gen()
        return

    def put(stk):
        return put_global_batch(mesh, stk, stacked=True)

    import collections

    buf2 = collections.deque()
    it = gen()
    try:
        for _ in range(prefetch):
            buf2.append(put(next(it)))
    except StopIteration:
        pass
    while buf2:
        out = buf2.popleft()
        try:
            buf2.append(put(next(it)))
        except StopIteration:
            pass
        yield out


def put_global_batch(mesh, batch: Dict, *, stacked: bool = True) -> Dict:
    """Place a host-local batch onto ``mesh`` with the batch axis sharded
    over 'data'.

    Multi-host: each process holds only its host_shard of the data, so the
    batch is assembled into a GLOBAL array from process-local shards (the
    batch axis grows by process_count); single-host is a plain device_put.
    ``stacked=True`` expects accumulation stacks with a leading (A, ...)
    axis (train); ``stacked=False`` takes a single loader batch (eval).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    multiproc = jax.process_count() > 1
    pre = (None,) if stacked else ()

    def put_arr(x, spec):
        sh = NamedSharding(mesh, P(*spec))
        if multiproc:
            return jax.make_array_from_process_local_data(sh, x)
        return jax.device_put(x, sh)

    return {
        "images": put_arr(batch["images"], pre + ("data",)),
        "captions": put_arr(batch["captions"], pre + (None, "data")),
        "lengths": put_arr(batch["lengths"], pre + ("data",)),
    }


def distributed_init_from_env() -> bool:
    """Join a multi-host run when IC_COORDINATOR / IC_NUM_PROCESSES /
    IC_PROCESS_ID are set; no-op (False) otherwise.  Trainers call this
    unconditionally before first backend use (SURVEY §2.10 DCN path)."""
    coord = os.environ.get("IC_COORDINATOR")
    if not coord:
        return False
    from imagecaptioner_tpu.parallel import multihost as MH

    on = MH.initialize(
        coord,
        num_processes=int(os.environ["IC_NUM_PROCESSES"]),
        process_id=int(os.environ["IC_PROCESS_ID"]))
    if on:
        info = MH.process_info()
        print(f"[multihost] process {info['process_index']}/"
              f"{info['process_count']} joined {coord}")
    return on


def maybe_mesh(batch_size: int, enabled: bool = True):
    """A (data, model) mesh over all devices when DP is applicable: more than
    one device and the batch divides the data axis.  None otherwise (the
    jitted steps are mesh-agnostic either way).

    ``batch_size`` is the PER-HOST loader batch; the global batch a step
    consumes is that times process_count (each host contributes its shard via
    stacked_batches)."""
    import jax

    if jax.process_count() > 1 and not enabled:
        # Independent per-process training silently diverges (every process
        # would write the same checkpoint files) — refuse, regardless of the
        # data_parallel flag.
        raise ValueError(
            "multi-host run requires data parallelism: data_parallel=False "
            f"with {jax.process_count()} processes would train "
            "process-independent models")
    if not enabled:
        return None

    n = len(jax.devices())
    global_batch = batch_size * jax.process_count()
    if n > 1 and global_batch % n == 0:
        from imagecaptioner_tpu.core import mesh as MS

        return MS.create_mesh()
    if jax.process_count() > 1:
        # Independent per-process training silently diverges — refuse.
        raise ValueError(
            f"multi-host run: global batch {global_batch} must divide the "
            f"{n} global devices")
    if n > 1:
        print(f"[dp] global batch {global_batch} not divisible by {n} "
              "devices — running replicated")
    return None


def step_context(mesh):
    """Context to enter around train/eval step calls when training over a
    mesh: activates the DP fused-attention policy (per-batch-shard Pallas
    kernel via shard_map) so multi-chip DP keeps the fused path.  A no-op
    without a mesh, and the policy itself is a no-op off-TPU / under SP
    (ops/pallas_attention.default_attn_impl)."""
    if mesh is None:
        import contextlib

        return contextlib.nullcontext()
    from imagecaptioner_tpu.ops.pallas_attention import data_parallel_attention

    return data_parallel_attention(mesh)


class EarlyStopping:
    """Best-value tracking + patience (mode='min' for loss, 'max' for BLEU)."""

    def __init__(self, patience: int, mode: str = "min"):
        self.patience = patience
        self.mode = mode
        self.best: Optional[float] = None
        self.counter = 0

    def update(self, value: float) -> bool:
        """Returns True if ``value`` is a new best."""
        improved = (self.best is None
                    or (self.mode == "min" and value < self.best)
                    or (self.mode == "max" and value > self.best))
        if improved:
            self.best = value
            self.counter = 0
        else:
            self.counter += 1
        return improved

    @property
    def should_stop(self) -> bool:
        return self.counter >= self.patience


def write_history(path: str, history: Dict) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(history, f, indent=2)


def log_progress(epoch, batch_idx, loss_dict, learning_rate, total_batches,
                 every: int = 50):
    """log_training_progress (distillation_utils.py:412-422)."""
    if batch_idx % every == 0:
        print(f"Epoch {epoch}, Batch {batch_idx}/{total_batches}")
        print(f"  LR: {learning_rate:.6f}")
        for name in ("total_loss", "ce_loss", "token_kd_loss",
                     "feature_kd_loss", "hidden_kd_loss"):
            if name in loss_dict:
                label = name.replace("_", " ").title()
                print(f"  {label}: {float(loss_dict[name]):.4f}")
        print("-" * 50)


class Timer:
    def __init__(self):
        self.start = time.time()

    def elapsed(self) -> float:
        return time.time() - self.start
