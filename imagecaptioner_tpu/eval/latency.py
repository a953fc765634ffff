"""Inference latency harness (evaluate_student.py:71-97 semantics).

Warmup runs + timed runs with ``block_until_ready`` bracketing — the JAX
equivalent of the reference's ``torch.cuda.synchronize`` discipline.
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax


def measure_inference_time(fn: Callable[[], object], *, num_runs: int = 10,
                           warmup: int = 3) -> Dict[str, float]:
    for _ in range(warmup):
        jax.block_until_ready(fn())
    times = []
    for _ in range(num_runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
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
