"""Per-HLO device-time profiling via ``jax.profiler.trace``.

The relay's black-box wall timing carries a load-dependent 20-130 ms
dispatch floor and ~2x multiplicative noise on component estimates
(core/timing.py works around it with streamed marginal estimators).  The
XLA profiler sidesteps all of that: the trace it writes contains one event
per executed HLO with the DEVICE-side duration (``device_duration_ps``),
bytes accessed, and model FLOPs — measured on-chip, immune to relay load.

``profile_device`` runs a callable under the tracer and returns the parsed
per-HLO ledger aggregated by HLO name and by category, so a benchmark (or a
human) can see exactly where a fused step spends its time.

Replaces the reference's reliance on ``torch.profiler`` /
``cuda.synchronize`` wall timing (reference src/evaluate_student.py:71-97)
with the XLA-native equivalent.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import tempfile
from typing import Any, Callable, Dict, List, Optional, Sequence

__all__ = ["profile_device", "aggregate", "top_table"]


def _load_trace_events(trace_dir: str) -> List[dict]:
    """Newest plugins/profile/*/???.trace.json.gz under ``trace_dir``."""
    paths = glob.glob(os.path.join(trace_dir, "plugins", "profile",
                                   "*", "*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    newest = max(paths, key=os.path.getmtime)
    with gzip.open(newest, "rt") as f:
        return json.load(f).get("traceEvents", [])


def _device_pids(events: Sequence[dict]) -> Dict[int, str]:
    out = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "device:" in name and "CPU" not in name:
                out[e["pid"]] = name
    return out


def profile_device(fn: Callable[[Any], Any], make_input: Callable[[int], Any],
                   *, runs: int = 3, warmup: int = 1,
                   trace_dir: Optional[str] = None) -> Dict[str, Any]:
    """Run ``fn(make_input(i))`` under the XLA tracer; return the HLO ledger.

    Inputs must be DISTINCT per call (the relay dedupes identical dispatches
    upstream); ``make_input(i)`` is called with a fresh index per run.
    Events are averaged over the ``runs`` traced calls.
    """
    import jax

    for i in range(warmup):
        jax.device_get(fn(make_input(1000 + i)))

    # Inputs are built and staged BEFORE the trace opens — otherwise any
    # device work make_input does (jax.random, device_put) is charged to
    # the profiled function.
    inputs = [make_input(2000 + i) for i in range(runs)]
    jax.block_until_ready(inputs)

    tdir = trace_dir or tempfile.mkdtemp(prefix="ic_hlo_trace_")
    with jax.profiler.trace(tdir):
        for x in inputs:
            jax.device_get(fn(x))

    events = _load_trace_events(tdir)
    dev = _device_pids(events)
    rows = []
    program_us = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev:
            continue
        args = e.get("args", {})
        if "device_duration_ps" not in args:
            continue  # queue/launch markers
        if "hlo_category" not in args:
            # whole-program envelope (jit_<fn>): the ground-truth total —
            # per-HLO rows can overcount when a control-flow op (while)
            # reports a duration covering its own body's events.  The
            # device lane also carries numeric-named step-group markers
            # ("0", "1", ...) that duplicate the program duration — count
            # only the jit_* envelopes.
            if e.get("name", "").startswith("jit"):
                program_us += int(args["device_duration_ps"]) / 1e6
            continue
        if args.get("hlo_category") in ("while", "conditional"):
            # control-flow envelopes also cover their body's events (the
            # lax.scan `while` reported 2.49 ms over a body whose fusions
            # appear separately) — dropping them keeps the row sum equal to
            # the program envelope; loop overhead = envelope - sum(rows).
            continue
        rows.append({
            "name": e.get("name", ""),
            "dur_us": int(args["device_duration_ps"]) / 1e6,
            "bytes": int(args.get("raw_bytes_accessed",
                                  args.get("bytes_accessed", 0) or 0)),
            "flops": int(args.get("model_flops", 0) or 0),
            "category": args.get("hlo_category", "?"),
            "tf_op": args.get("tf_op", ""),
            "source": args.get("source", ""),
        })
    return {"rows": rows, "runs": runs, "trace_dir": tdir,
            "program_us_per_run": program_us / max(runs, 1),
            "by_name": aggregate(rows, "name", runs),
            "by_category": aggregate(rows, "category", runs),
            "by_source": aggregate(rows, "source", runs)}


def aggregate(rows: Sequence[dict], key: str, runs: int = 1) -> List[dict]:
    """Sum device time (per traced run) grouped by ``key``, descending."""
    acc: Dict[str, dict] = collections.defaultdict(
        lambda: {"dur_us": 0.0, "bytes": 0, "flops": 0, "count": 0})
    meta: Dict[str, dict] = {}
    for r in rows:
        a = acc[r[key]]
        a["dur_us"] += r["dur_us"]
        a["bytes"] += r["bytes"]
        a["flops"] += r["flops"]
        a["count"] += 1
        meta.setdefault(r[key], r)
    out = []
    for k, a in acc.items():
        out.append({
            key: k,
            "dur_us_per_run": a["dur_us"] / max(runs, 1),
            "count_per_run": a["count"] / max(runs, 1),
            "gbytes_per_s": (a["bytes"] / 1e9) / (a["dur_us"] / 1e6)
            if a["dur_us"] else 0.0,
            "tflops_per_s": (a["flops"] / 1e12) / (a["dur_us"] / 1e6)
            if a["dur_us"] else 0.0,
            "category": meta[k].get("category", "?"),
            "tf_op": meta[k].get("tf_op", "")[:120],
        })
    out.sort(key=lambda d: -d["dur_us_per_run"])
    return out


def top_table(agg: Sequence[dict], key: str, n: int = 25,
              total_us: Optional[float] = None) -> str:
    total = total_us or sum(d["dur_us_per_run"] for d in agg)
    lines = [f"{'us/run':>10} {'%':>5} {'GB/s':>7} {'TF/s':>6}  {key}"]
    for d in list(agg)[:n]:
        lines.append(
            f"{d['dur_us_per_run']:10.1f} {100*d['dur_us_per_run']/total:5.1f}"
            f" {d['gbytes_per_s']:7.1f} {d['tflops_per_s']:6.2f}"
            f"  {d[key][:60]}  [{d['category']}]")
    lines.append(f"{total:10.1f} 100.0                 TOTAL device time")
    return "\n".join(lines)
