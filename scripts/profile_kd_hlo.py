#!/usr/bin/env python
"""Per-HLO device-time profile of the KD train step (XLA profiler).

Unlike scripts/profile_kd_step.py (black-box marginal wall timing, ~2x
component noise through the shared relay), this uses jax.profiler: the
trace records every executed HLO with its DEVICE-side duration, bytes
accessed and model FLOPs — measured on-chip, immune to relay load and the
20-130 ms dispatch floor.  One un-chained step per traced call is enough;
device event durations do not include host/dispatch gaps.

Writes benchmarks/kd_step_hlo_profile.json:
  {"step_device_ms": ..., "by_category": [...], "top_hlos": [...]}

Usage: python scripts/profile_kd_hlo.py [--batch 16] [--decoder-impl pallas]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=24)
    ap.add_argument("--decoder-impl", default="pallas",
                    choices=["scan", "pallas"])
    ap.add_argument("--teacher-bf16", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "kd_step_hlo_profile.json"))
    args = ap.parse_args()

    from imagecaptioner_tpu.core.runtime import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecaptioner_tpu.core import profiling
    from imagecaptioner_tpu.core.config import (
        DistillConfig, KDTrainConfig, TeacherConfig, full_student_config)
    from imagecaptioner_tpu.distill.projector import create_feature_projectors
    from imagecaptioner_tpu.models import student as SM
    from imagecaptioner_tpu.models import teacher as TM
    from imagecaptioner_tpu.train import optim as O, steps

    B, T = args.batch, args.seq
    V = 2994
    t_cfg = TeacherConfig(vocab_size=V)
    s_cfg = full_student_config(V, decoder_impl=args.decoder_impl)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    teacher_params = TM.teacher_init(k1, t_cfg)
    s_params, s_state = SM.student_init(k2, s_cfg)
    projectors, _ = create_feature_projectors(
        k3, teacher_embed=512, student_embed=256, student_hidden=512,
        student_seq_len=49, teacher_seq_len=197)

    tr = KDTrainConfig(batch_size=B, accumulation_steps=1,
                       teacher_bf16=args.teacher_bf16)
    step = steps.make_kd_train_step(t_cfg, s_cfg, DistillConfig(), tr,
                                    compute_dtype=jnp.bfloat16)
    params = {"student": s_params, "projectors": projectors}
    state = steps.TrainState(params, O.adamw_init(params), s_state)
    state = jax.device_put(state)

    # NO donation: the profiled fn must be re-callable on the same state.
    # The extra output copies XLA inserts for the un-donated update are
    # visible in the ledger as 'copy' category — read them as such.
    @jax.jit
    def one_step(st, tp, batch, rng):
        new_state, metrics = step(st, tp, batch,
                                  jnp.float32(1e-4), jnp.int32(0), rng)
        return metrics["total_loss"]

    def mk(i):
        r = np.random.default_rng(i)
        return ({
            "images": jax.device_put(r.integers(
                0, 255, (1, B, 224, 224, 3), dtype=np.uint8)),
            "captions": jax.device_put(
                r.integers(1, V, (1, T, B)).astype(np.int32)),
            "lengths": jax.device_put(np.full((1, B), T, np.int32)),
        }, jax.random.PRNGKey(i))

    def fn(x):
        return one_step(state, teacher_params, *x)

    prof = profiling.profile_device(fn, mk, runs=args.runs)
    # program envelope = ground truth (row sum misses control-flow self time)
    total_us = (prof["program_us_per_run"]
                or sum(r["dur_us"] for r in prof["rows"]) / args.runs)
    print(f"\nKD step device time: {total_us/1e3:.3f} ms "
          f"(batch {B}, {args.decoder_impl}, teacher_bf16={args.teacher_bf16})")
    print("\n== by HLO category ==")
    print(profiling.top_table(prof["by_category"], "category", 20, total_us))
    print("\n== by source line ==")
    print(profiling.top_table(prof["by_source"], "source", args.top,
                              total_us))
    print("\n== top HLOs ==")
    print(profiling.top_table(prof["by_name"], "name", args.top, total_us))

    out = {
        "step_device_ms": total_us / 1e3,
        "config": {"batch": B, "seq": T, "decoder_impl": args.decoder_impl,
                   "teacher_bf16": args.teacher_bf16, "runs": args.runs},
        "by_category": prof["by_category"],
        "by_source": prof["by_source"][:args.top],
        "top_hlos": prof["by_name"][:args.top],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
