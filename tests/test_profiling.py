"""core/profiling.py trace parsing — synthetic xplane-style trace JSON.

The on-chip integration (jax.profiler through the relay) is exercised by
scripts/profile_kd_hlo.py / profile_serving_hlo.py; these tests pin the
parsing contract: device-lane selection, program-envelope vs per-HLO rows,
control-flow (while) envelope exclusion, and the aggregation math.
"""

import gzip
import json
import os

from imagecaptioner_tpu.core import profiling as PR


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    os.makedirs(d)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def _meta(pid, name):
    return {"ph": "M", "pid": pid, "name": "process_name",
            "args": {"name": name}}


def _ev(pid, name, dur_ps, category=None, bytes_=0, flops=0, source=""):
    args = {"device_duration_ps": str(dur_ps)}
    if category is not None:
        args.update({"hlo_category": category,
                     "raw_bytes_accessed": str(bytes_),
                     "model_flops": str(flops), "source": source,
                     "tf_op": ""})
    return {"ph": "X", "pid": pid, "name": name, "dur": dur_ps / 1e6,
            "args": args}


def test_parse_device_lane_and_envelope(tmp_path):
    events = [
        _meta(3, "/device:TPU:0"), _meta(7, "/host:CPU"),
        # program envelope: no hlo_category
        _ev(3, "jit_step(123)", 10_000_000),
        # real HLOs
        _ev(3, "fusion.1", 6_000_000, "convolution fusion",
            bytes_=1000, flops=2000, source="a.py:1"),
        _ev(3, "fusion.2", 3_000_000, "loop fusion", source="a.py:2"),
        # while envelope covers the fusions — must be excluded from rows
        _ev(3, "while", 9_000_000, "while"),
        # host lane ignored entirely
        _ev(7, "fusion.1", 99_000_000, "loop fusion"),
    ]
    tdir = _write_trace(tmp_path, events)
    rows = PR._load_trace_events(tdir)
    assert len(rows) == len(events)

    # drive the row-filtering logic through profile_device's parser body
    # indirectly: re-implement the filter via the public helpers
    dev = PR._device_pids(rows)
    assert dev == {3: "/device:TPU:0"}


def test_profile_device_filters(monkeypatch, tmp_path):
    events = [
        _meta(3, "/device:TPU:0"), _meta(7, "/host:CPU"),
        _ev(3, "jit_step(123)", 10_000_000),
        _ev(3, "fusion.1", 6_000_000, "convolution fusion",
            bytes_=6_000, flops=600_000, source="a.py:1"),
        _ev(3, "fusion.2", 3_000_000, "loop fusion", source="a.py:2"),
        _ev(3, "while", 9_000_000, "while"),
        _ev(7, "fusion.9", 99_000_000, "loop fusion"),
    ]
    tdir = _write_trace(tmp_path, events)

    class _FakeTrace:
        def __init__(self, path):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    import jax

    monkeypatch.setattr(jax.profiler, "trace", _FakeTrace)
    monkeypatch.setattr(PR, "_load_trace_events",
                        lambda _: [e for e in events])

    prof = PR.profile_device(lambda x: x, lambda i: i, runs=1, warmup=0,
                             trace_dir=tdir)
    # envelope: the jit_step event only (10_000_000 ps = 10 us)
    assert prof["program_us_per_run"] == 10.0
    # rows: the two fusions — no while, no host lane, no envelope
    assert sorted(r["name"] for r in prof["rows"]) == ["fusion.1", "fusion.2"]
    total = sum(r["dur_us"] for r in prof["rows"])
    assert total == 9.0

    by_cat = {d["category"]: d for d in prof["by_category"]}
    assert set(by_cat) == {"convolution fusion", "loop fusion"}
    conv = by_cat["convolution fusion"]
    assert conv["dur_us_per_run"] == 6.0
    # 6_000 bytes over 6 us -> 1.0 GB/s; 6e5 flops over 6 us -> 0.1 TF/s
    assert abs(conv["gbytes_per_s"] - 1.0) < 1e-9
    assert abs(conv["tflops_per_s"] - 0.1) < 1e-12

    table = PR.top_table(prof["by_category"], "category", 5,
                         prof["program_us_per_run"])
    assert "TOTAL" in table and "convolution fusion" in table


def test_aggregate_orders_and_averages():
    rows = [
        {"name": "a", "dur_us": 10.0, "bytes": 100, "flops": 0,
         "category": "x", "tf_op": "", "source": "s1"},
        {"name": "a", "dur_us": 30.0, "bytes": 300, "flops": 0,
         "category": "x", "tf_op": "", "source": "s1"},
        {"name": "b", "dur_us": 5.0, "bytes": 0, "flops": 50,
         "category": "y", "tf_op": "", "source": "s2"},
    ]
    agg = PR.aggregate(rows, "name", runs=2)
    assert [d["name"] for d in agg] == ["a", "b"]  # descending by time
    assert agg[0]["dur_us_per_run"] == 20.0  # (10+30)/2 runs
    assert agg[0]["count_per_run"] == 1.0
    assert agg[1]["dur_us_per_run"] == 2.5
