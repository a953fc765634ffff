#!/usr/bin/env python
"""Per-HLO device-time profile of the two serving paths (XLA profiler).

  greedy  — full-student batch greedy captioning (bench.py's headline path:
            encode + fused Pallas greedy decode), one batch per call
  beam    — teacher packed beam search (results.json #3 path: ViT encode +
            K-beams-in-batch KV-cached decode), N images per call

Device durations come from the trace (core/profiling.py) — immune to the
relay dispatch floor, so one un-streamed call per run is enough.

Writes benchmarks/serving_hlo_profile.json.
Usage: python scripts/profile_serving_hlo.py [--which greedy beam]
       [--batch 32] [--beam-n 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", nargs="+", default=["greedy", "beam"],
                    choices=["greedy", "beam"])
    ap.add_argument("--int8", action="store_true",
                    help="quantize the serving encoders (ops/quant.py) and "
                         "record under 'greedy_int8'/'beam_int8'")
    ap.add_argument("--int8-static", action="store_true",
                    help="with --int8: bake calibrated static activation "
                         "scales (calibrate_activation_scales, eager on the "
                         "CPU backend) so the per-layer dynamic amax pass "
                         "disappears; records under '*_int8_static'")
    ap.add_argument("--int8-full", action="store_true",
                    help="teacher beam only: also quantize the transformer "
                         "decoder weights (quantize_teacher_full_int8) and "
                         "record under 'beam_int8_full'")
    ap.add_argument("--batch", type=int, default=32, help="greedy batch")
    ap.add_argument("--beam-n", type=int, default=8, help="beam images/call")
    ap.add_argument("--pipelined", action="store_true",
                    help="beam only: also profile the two-stage pipelined "
                         "beam (encode at --beam-batch, decode in packs of "
                         "--beam-n; decode.beam_search_teacher_pipelined) "
                         "under 'beam_pipelined*'")
    ap.add_argument("--beam-batch", type=int, default=32,
                    help="pipelined beam encode batch")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "serving_hlo_profile.json"))
    args = ap.parse_args()

    from imagecaptioner_tpu.core.runtime import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from imagecaptioner_tpu.core import precision as P
    from imagecaptioner_tpu.core import profiling
    from imagecaptioner_tpu.core.config import (TeacherConfig,
                                                full_student_config)
    from imagecaptioner_tpu.models import student as SM
    from imagecaptioner_tpu.models import teacher as TM
    from imagecaptioner_tpu.ops import decode as D

    import numpy as np

    V, MAX_LEN = 2994, 20
    out = {}
    suffix = "_int8" if args.int8 else ""
    if args.int8 and args.int8_static:
        suffix = "_int8_static"

    def calibrate_on_cpu(qparams, run_host):
        """Eager calibration through the relay would dispatch thousands of
        ops; pull the tree to host and calibrate on the CPU backend, then
        ship the baked tree back."""
        from imagecaptioner_tpu.ops.quant import calibrate_activation_scales

        cpu = jax.devices("cpu")[0]
        host = jax.device_get(qparams)
        with jax.default_device(cpu):
            host = calibrate_activation_scales(host, run_host)
        return jax.device_put(host)
    if os.path.exists(args.out):
        with open(args.out) as f:  # keep the other arms' records
            out = json.load(f)

    if "greedy" in args.which:
        B = args.batch
        cfg = full_student_config(V, dropout=0.0)
        params, state = SM.student_init(jax.random.PRNGKey(0), cfg)
        params = P.bf16_compute(params)
        if args.int8:
            from imagecaptioner_tpu.ops.quant import (
                quantize_student_encoder_int8)

            params = quantize_student_encoder_int8(params)
            if args.int8_static:
                state_h = jax.device_get(state)
                cal_x = np.asarray(jax.random.normal(
                    jax.random.PRNGKey(99), (2, 3, 224, 224), jnp.float32))
                print("calibrating static activation scales (CPU eager)...",
                      flush=True)
                params = calibrate_on_cpu(
                    params,
                    lambda q: SM.encode_image(q, state_h, cal_x, cfg,
                                              train=False))

        @jax.jit
        def caption(images):
            _, refined, _ = SM.encode_image(params, state, images, cfg,
                                            train=False)
            return D.best_greedy_decode_student(params, refined, cfg,
                                                max_length=MAX_LEN)

        def mk(i):
            return jax.random.normal(jax.random.PRNGKey(i),
                                     (B, 3, 224, 224), jnp.bfloat16)

        prof = profiling.profile_device(caption, mk, runs=args.runs)
        tot = (prof["program_us_per_run"]
               or sum(r["dur_us"] for r in prof["rows"]) / args.runs)
        print(f"\ngreedy B={B}: {tot/1e3:.3f} ms/call device "
              f"= {B/(tot/1e6):,.0f} img/s device-rate")
        print(profiling.top_table(prof["by_category"], "category", 12, tot))
        print(profiling.top_table(prof["by_source"], "source", args.top,
                                  tot))
        out["greedy" + suffix] = {
            "batch": B, "device_ms_per_call": tot / 1e3,
            "device_images_per_sec": B / (tot / 1e6),
            "by_category": prof["by_category"],
            "by_source": prof["by_source"][:args.top],
        }

    if "beam" in args.which:
        N = args.beam_n
        cfg = TeacherConfig(vocab_size=V)
        params = P.bf16_compute(TM.teacher_init(jax.random.PRNGKey(0), cfg))
        if args.int8_full:
            from imagecaptioner_tpu.ops.quant import quantize_teacher_full_int8

            params = quantize_teacher_full_int8(params)
        elif args.int8:
            from imagecaptioner_tpu.ops.quant import (
                quantize_teacher_encoder_int8)

            params = quantize_teacher_encoder_int8(params)
        if args.int8_static and (args.int8 or args.int8_full):
            cal_x = np.asarray(jax.random.normal(
                jax.random.PRNGKey(98), (2, 3, 224, 224), jnp.float32))
            cal_caps = np.ones((6, 2), np.int32)
            print("calibrating static activation scales (CPU eager)...",
                  flush=True)
            # the full teacher forward reaches encoder AND decoder weights
            params = calibrate_on_cpu(
                params, lambda q: TM.teacher_apply(q, cal_x, cal_caps, cfg))

        @jax.jit
        def beam(imgs):
            memory = TM.encode_image(params, imgs, cfg)
            return D.beam_search_teacher_packed(params, memory, cfg,
                                                max_length=MAX_LEN,
                                                beam_size=5)[0]

        def mk(i):
            return jax.random.normal(jax.random.PRNGKey(i),
                                     (N, 3, 224, 224), jnp.bfloat16)

        prof = profiling.profile_device(beam, mk, runs=args.runs)
        tot = (prof["program_us_per_run"]
               or sum(r["dur_us"] for r in prof["rows"]) / args.runs)
        print(f"\npacked beam N={N}: {tot/1e3:.3f} ms/call device "
              f"= {N/(tot/1e6):,.0f} img/s device-rate")
        print(profiling.top_table(prof["by_category"], "category", 12, tot))
        print(profiling.top_table(prof["by_source"], "source", args.top,
                                  tot))
        beam_suffix = "_int8_full" if args.int8_full else (
            "_int8" if args.int8 else "")
        if beam_suffix and args.int8_static:
            beam_suffix += "_static"
        out["beam" + beam_suffix] = {
            "images_per_call": N, "device_ms_per_call": tot / 1e3,
            "device_images_per_sec": N / (tot / 1e6),
            "by_category": prof["by_category"],
            "by_source": prof["by_source"][:args.top],
        }

        if args.pipelined:
            BB = args.beam_batch

            @jax.jit
            def beam_pipe(imgs):
                memory = TM.encode_image(params, imgs, cfg)
                return D.beam_search_teacher_pipelined(
                    params, memory, cfg, pack=N, max_length=MAX_LEN,
                    beam_size=5)[0]

            def mkb(i):
                return jax.random.normal(jax.random.PRNGKey(7000 + i),
                                         (BB, 3, 224, 224), jnp.bfloat16)

            prof = profiling.profile_device(beam_pipe, mkb, runs=args.runs)
            tot = (prof["program_us_per_run"]
                   or sum(r["dur_us"] for r in prof["rows"]) / args.runs)
            print(f"\npipelined beam B={BB} pack={N}: {tot/1e3:.3f} ms/call "
                  f"device = {BB/(tot/1e6):,.0f} img/s device-rate")
            print(profiling.top_table(prof["by_category"], "category", 12,
                                      tot))
            out["beam_pipelined" + beam_suffix] = {
                "images_per_call": BB, "pack": N,
                "device_ms_per_call": tot / 1e3,
                "device_images_per_sec": BB / (tot / 1e6),
                "by_category": prof["by_category"],
                "by_source": prof["by_source"][:args.top],
            }

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
