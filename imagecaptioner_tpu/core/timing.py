"""Honest wall-clock measurement on the axon TPU relay.

This rig has two traps (CLAUDE.md measurement rules):
  * identical repeated jit calls are deduped upstream — every timed call must
    receive DISTINCT input data;
  * ``block_until_ready`` does not reliably wait — the only trustworthy sync
    is ``jax.device_get`` of (something derived from) the actual outputs.

And one statistical trap found in round 1 (VERDICT §Weak 1): a single
two-point marginal estimator ``(d_large - d_small) / (n_large - n_small)``
amplifies relay-load variance unboundedly and produced >100%-of-peak
throughput numbers.  The estimators here therefore:

  * interleave k >= 3 (small, large) timing pairs with globally-disjoint
    inputs and take the MEDIAN marginal;
  * report the raw totals alongside, plus a conservative total-based rate;
  * support a physics guard: the calibrated achievable ceiling on this
    container is ~125 TFLOP/s (chained 8192^3 bf16 matmul = 8.8 ms), so any
    computed rate implying more than that is a measurement artifact and must
    not be reported as the headline.
"""

from __future__ import annotations

import statistics
import time
from typing import Any, Callable, Dict, List, Sequence

#: Measured-achievable bf16 compute on this container's chip through the
#: relay (CLAUDE.md calibration), NOT the datasheet peak.
CALIBRATED_TFLOPS = 125.0


def physics_max_rate(flops_per_item: float,
                     tflops: float = CALIBRATED_TFLOPS) -> float:
    """Upper bound on items/sec given FLOPs per item at the calibrated
    ceiling.  Any measured rate above this is impossible on this chip."""
    return tflops * 1e12 / float(flops_per_item)


def _sync(outputs: Sequence[Any]) -> None:
    """Fetch one scalar derived from every output — a true execution sync."""
    import jax
    import jax.numpy as jnp

    leaves = [jnp.ravel(jnp.asarray(l))[0]
              for out in outputs for l in jax.tree.leaves(out)]
    jax.device_get(jnp.stack(leaves))


def timed_calls(fn: Callable[[Any], Any], inputs: Sequence[Any]) -> float:
    """Total seconds for len(inputs) back-to-back calls, one output-derived
    fetch as the sync.  Inputs must already be distinct and device-resident
    (or cheap to transfer)."""
    t0 = time.perf_counter()
    outs = [fn(x) for x in inputs]
    _sync(outs)
    return time.perf_counter() - t0


def steady_state(fn: Callable[[Any], Any],
                 make_input: Callable[[int], Any], *,
                 n_small: int = 4, n_large: int = 16,
                 pairs: int = 3) -> Dict[str, Any]:
    """Steady-state seconds/call with a robust interleaved-pairs estimator.

    ``make_input(i)`` must return distinct data for distinct ``i``; indices
    are globally unique across all runs so the relay can never dedupe.

    Returns a dict with:
      ``per_call_marginal``  median over pairs of (d_large-d_small)/(nL-nS)
      ``per_call_total``     median d_large / n_large  (includes session
                             overhead -> conservative upper bound on time)
      ``raw``                the raw (d_small, d_large) totals per pair
    """
    idx = 0

    def batch(n: int) -> List[Any]:
        nonlocal idx
        xs = [make_input(idx + i) for i in range(n)]
        idx += n
        return xs

    # compile + warmup outside any timed region
    warm = fn(make_input(10_000_000))
    _sync([warm])
    _sync([warm] * n_small)   # precompile the n-ary sync gathers
    _sync([warm] * n_large)

    raw = []
    marginals = []
    totals = []
    for _ in range(max(pairs, 1)):
        d_small = timed_calls(fn, batch(n_small))
        d_large = timed_calls(fn, batch(n_large))
        raw.append({"n_small": n_small, "d_small_s": d_small,
                    "n_large": n_large, "d_large_s": d_large})
        marginals.append((d_large - d_small) / (n_large - n_small))
        totals.append(d_large / n_large)
    per_marginal = statistics.median(marginals)
    per_total = statistics.median(totals)
    if per_marginal <= 0:
        # overhead noise swamped the signal; the total rate is the only
        # defensible number
        per_marginal = per_total
    return {
        "per_call_marginal": per_marginal,
        "per_call_total": per_total,
        "raw": raw,
    }


def guarded_rate(stats: Dict[str, Any], items_per_call: float,
                 flops_per_item: float | None) -> Dict[str, Any]:
    """Turn a ``steady_state`` result into a defensible items/sec figure.

    Picks the marginal-based rate when it is physically possible, else falls
    back to the conservative total-based rate, else caps at the physics
    ceiling — a benchmark must never print an impossible number.
    """
    rate_marginal = items_per_call / stats["per_call_marginal"]
    rate_total = items_per_call / stats["per_call_total"]
    out = {
        "items_per_sec": rate_marginal,
        "items_per_sec_total_based": rate_total,
        "estimator": "median_marginal",
        "raw": stats["raw"],
    }
    if flops_per_item is not None:
        ceiling = physics_max_rate(flops_per_item)
        out["physics_max_items_per_sec"] = ceiling
        if rate_marginal > ceiling:
            if rate_total <= ceiling:
                out["items_per_sec"] = rate_total
                out["estimator"] = "total_based (marginal exceeded physics)"
            else:
                out["items_per_sec"] = ceiling
                out["estimator"] = "physics_capped (both estimators exceeded)"
    return out


#: ms per chained 8192^3 bf16 matmul pair on a CALM relay (2 matmuls at
#: ~8.8 ms each — the CLAUDE.md calibration reference for this container).
CALIBRATION_CALM_MS_PER_PAIR = 17.6


def relay_calibration(trials: int = 3, chain: int = 6,
                      dim: int = 8192) -> float:
    """Measure the shared relay's current health: ms per chained 8192^3 bf16
    matmul pair (calm ~= ``CALIBRATION_CALM_MS_PER_PAIR``; 2x+ means a loaded
    relay and any co-recorded numbers should be treated as inflated).

    Benchmarks embed this before/after their measurements so every recorded
    JSON carries its own load evidence.  The first post-compile dispatch
    burst through the relay is reproducibly ~8x slow (tunnel spin-up), so
    one throwaway trial runs before the ``trials`` measured ones.
    """
    import time

    import jax
    import jax.numpy as jnp

    @jax.jit
    def pair(a, b):
        c = (a @ b).astype(jnp.bfloat16)
        return (c @ b).astype(jnp.bfloat16)

    ks = [jax.random.normal(jax.random.PRNGKey(77_000 + i), (dim, dim),
                            jnp.bfloat16) for i in range(chain + 1)]
    jax.device_get(pair(ks[0], ks[1])[0, 0])  # compile + warm
    best = []
    for trial in range(trials + 1):
        t0 = time.perf_counter()
        outs = [pair(ks[i], ks[i + 1]) for i in range(chain)]
        jax.device_get(jnp.stack([o[0, 0] for o in outs]))
        if trial > 0:  # trial 0 = spin-up throwaway
            best.append((time.perf_counter() - t0) / chain)
    return statistics.median(best) * 1e3
