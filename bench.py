#!/usr/bin/env python
"""Headline benchmark: full-student greedy captioning serving throughput.

Prints ONE JSON line:
  {"metric": "student_greedy_images_per_sec_per_chip", "value": N,
   "unit": "images/s", "vs_baseline": N / cpu_torch_baseline}

Serving point: B=32 images/batch x 8 batches streamed per dispatch — the
best point of the recorded sweep (benchmarks/results.json #2
``serving_greedy_sweep``: B16 10,095 / B32 11,454 / B64 10,744 img/s);
override with IC_BENCH_BATCH / IC_BENCH_STREAM.

``vs_baseline`` is against the CPU PyTorch reference-architecture student
at the SAME batch size (BASELINE.json north star: >=10x on v5e-1).  The
torch baseline is measured once per machine and cached in
.bench_baseline.json (delete to re-measure).
Run with --quick for a fast smoke (smaller batch count).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

VOCAB = 2994
BATCH = int(os.environ.get("IC_BENCH_BATCH", "32"))
STREAM_K = int(os.environ.get("IC_BENCH_STREAM", "8"))
MAX_LEN = 20
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_baseline.json")


def measure_torch_baseline(num_batches: int = 2) -> float:
    """images/sec of the eager CPU torch reference student (greedy, B=BATCH)."""
    import torch

    from benchmarks.torch_baseline import TorchBaselineStudent

    torch.manual_seed(0)
    model = TorchBaselineStudent(vocab_size=VOCAB)
    model.eval()
    images = torch.randn(BATCH, 3, 224, 224)
    with torch.no_grad():
        model.greedy_decode(images, max_length=MAX_LEN)  # warmup
        t0 = time.perf_counter()
        for _ in range(num_batches):
            model.greedy_decode(images, max_length=MAX_LEN)
        dt = time.perf_counter() - t0
    return BATCH * num_batches / dt


def get_torch_baseline(quick: bool) -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            d = json.load(f)
        if d.get("vocab") == VOCAB and d.get("batch") == BATCH:
            return float(d["images_per_sec"])
    ips = measure_torch_baseline(num_batches=1 if quick else 2)
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"vocab": VOCAB, "batch": BATCH, "max_len": MAX_LEN,
                   "images_per_sec": ips,
                   "what": "eager CPU torch reference-architecture student, "
                           f"batch-{BATCH} greedy decode"}, f)
    return ips


# ResNet-50 forward at 224^2 is ~4.1 GFLOP/image (encoder only — decode adds
# more, so this ceiling is generous).  Any measured rate implying more than
# the calibrated ~125 TFLOP/s is a relay measurement artifact, not physics.
FLOPS_PER_IMAGE = 4.1e9


def measure_jax(num_batches: int) -> dict:
    """Serving-style throughput: DISTINCT pre-staged batches submitted
    back-to-back, outputs fetched to host, interleaved small/large timing
    pairs with a median-marginal estimator and a physics guard
    (core/timing.py — round-1 VERDICT methodology fixes)."""
    import jax
    import jax.numpy as jnp

    from imagecaptioner_tpu.core.runtime import enable_compile_cache

    enable_compile_cache()

    from imagecaptioner_tpu.core import timing
    from imagecaptioner_tpu.core.config import full_student_config
    from imagecaptioner_tpu.models import student as SM
    from imagecaptioner_tpu.ops import decode as D

    cfg = full_student_config(VOCAB, dropout=0.0)
    params, state = SM.student_init(jax.random.PRNGKey(0), cfg)
    # bf16 params for inference (fp32 logits at the argmax inside decode)
    import imagecaptioner_tpu.core.precision as P

    params = P.bf16_compute(params)
    if os.environ.get("IC_BENCH_INT8", "") == "1":
        # opt-in int8 serving encoder (ops/quant.py): the bf16 conv stack is
        # at the MXU roofline, int8 is the remaining throughput lever
        from imagecaptioner_tpu.ops.quant import (count_quantized,
                                                  quantize_student_encoder_int8)

        params = quantize_student_encoder_int8(params)
        print(f"[int8] serving encoder quantized "
              f"({count_quantized(params)} weights)", file=sys.stderr)
        if os.environ.get("IC_BENCH_INT8_STATIC", "") == "1":
            # calibrated static activation scales: drops the per-layer
            # dynamic amax pass (19% of the int8 serve's device time);
            # calibrate eagerly on the CPU backend, not through the relay
            from imagecaptioner_tpu.ops.quant import (
                calibrate_activation_scales)

            cal_x = jax.device_get(jax.random.normal(
                jax.random.PRNGKey(99), (2, 3, 224, 224), jnp.float32))
            host = jax.device_get(params)
            state_h = jax.device_get(state)
            with jax.default_device(jax.devices("cpu")[0]):
                host = calibrate_activation_scales(
                    host, lambda q: SM.encode_image(q, state_h, cal_x, cfg,
                                                    train=False))
            params = jax.tree.map(jnp.asarray, host)
            print("[int8] static activation scales baked", file=sys.stderr)

    def caption_one(images):
        # canonical dispatcher: fused kernel on TPU with VMEM gate + loud
        # fallback (VERDICT r2 weak #8 — bench must follow the same policy
        # as production serving, not pin the kernel by backend alone)
        _, refined, _ = SM.encode_image(params, state, images, cfg,
                                        train=False)
        return D.best_greedy_decode_student(params, refined, cfg,
                                            max_length=MAX_LEN)

    # One dispatch processes a STREAM of K batch-BATCH batches (lax.map
    # keeps per-batch execution semantics).  Through this relay a single
    # dispatch costs ~15 ms while the batch itself is ~2 ms of compute —
    # serving at full rate requires amortizing dispatch, exactly as a real
    # serving loop would queue work.
    K = STREAM_K
    caption_stream = jax.jit(
        lambda stacked: jax.lax.map(caption_one, stacked))

    def mk(i):
        return jax.random.normal(jax.random.PRNGKey(i),
                                 (K, BATCH, 3, 224, 224), jnp.bfloat16)

    stats = timing.steady_state(caption_stream, mk,
                                n_small=max(2, num_batches // 4),
                                n_large=num_batches, pairs=5)
    return timing.guarded_rate(stats, items_per_call=K * BATCH,
                               flops_per_item=FLOPS_PER_IMAGE)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-baseline", action="store_true",
                    help="report vs_baseline from cache or 0")
    args = ap.parse_args()

    num_batches = 4 if args.quick else 12
    meas = measure_jax(num_batches)
    jax_ips = meas["items_per_sec"]

    if args.skip_baseline and not os.path.exists(BASELINE_CACHE):
        baseline = None
    else:
        baseline = get_torch_baseline(args.quick)

    out = {
        "metric": "student_greedy_images_per_sec_per_chip",
        "value": round(jax_ips, 3),
        "unit": "images/s",
        "vs_baseline": round(jax_ips / baseline, 3) if baseline else None,
        "estimator": meas["estimator"],
        "total_based_value": round(meas["items_per_sec_total_based"], 3),
        "physics_max": round(meas["physics_max_items_per_sec"], 1),
        "raw": [{k: round(v, 4) if isinstance(v, float) else v
                 for k, v in r.items()} for r in meas["raw"]],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
