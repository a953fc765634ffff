"""Inference latency harness (evaluate_student.py:71-97 semantics).

The reference warms up then times repeated runs bracketed by
``torch.cuda.synchronize``.  On this rig the naive translation is wrong
twice over (CLAUDE.md measurement rules): identical repeated jit calls are
deduped upstream, and ``block_until_ready`` does not reliably wait.  So each
timed run gets DISTINCT input data (``make_input(i)``) and is synced by
``jax.device_get`` of a scalar derived from the actual outputs.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict


def measure_inference_time(fn: Callable[[Any], Any],
                           make_input: Callable[[int], Any], *,
                           num_runs: int = 10,
                           warmup: int = 3) -> Dict[str, float]:
    """Per-call latency stats for ``fn(make_input(i))`` with distinct inputs
    per call and an output fetch as the sync (includes host<->device
    round-trip, as serving latency does)."""
    import jax
    import jax.numpy as jnp

    def sync(out) -> None:
        leaves = [jnp.ravel(jnp.asarray(l))[0] for l in jax.tree.leaves(out)]
        jax.device_get(jnp.stack(leaves))

    for i in range(warmup):
        sync(fn(make_input(1_000_000 + i)))
    times = []
    for i in range(num_runs):
        x = make_input(i)
        t0 = time.perf_counter()
        sync(fn(x))
        times.append(time.perf_counter() - t0)
    times.sort()
    n = len(times)
    return {
        "mean_s": sum(times) / n,
        "p50_s": times[n // 2],
        "min_s": times[0],
        "max_s": times[-1],
        "num_runs": n,
    }
