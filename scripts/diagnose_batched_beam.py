#!/usr/bin/env python
"""Diagnose the weak batched-beam scaling seen in benchmarks config #3.

Round-1 numbers (276 img/s single vs 290 img/s batched-8) implied batching
buys nothing.  Hypotheses:
  (a) the measurement is relay-bound — a batched call uploads 8x the input
      bytes over a ~9 MB/s host->device tunnel, so upload, not beam compute,
      dominates each call;
  (b) the vmapped beam itself scales linearly (lane starvation / KV-cache
      reorder gathers).

Method: pre-stage EVERY input on device (device_put + block) before timing,
so the timed region is pure device compute; sweep B in {1,2,4,8,16}; also
time encode-only to split encoder vs decode-loop cost.  Distinct inputs per
call, final device_get sync (CLAUDE.md measurement rules).

Usage: python scripts/diagnose_batched_beam.py [--calls 8]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=8)
    ap.add_argument("--out", default=None,
                    help="optional JSON output path")
    args = ap.parse_args()

    from imagecaptioner_tpu.core.runtime import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from imagecaptioner_tpu.core import precision as P
    from imagecaptioner_tpu.core.config import TeacherConfig
    from imagecaptioner_tpu.models import teacher as TM
    from imagecaptioner_tpu.ops import decode as D

    cfg = TeacherConfig(vocab_size=2994)
    params = P.bf16_compute(TM.teacher_init(jax.random.PRNGKey(0), cfg))

    results = {}

    def timed_chain(fn, inputs):
        """Compile+warm on inputs[0], then time DISTINCT inputs[1:] (repeat
        calls are deduped by this rig — never re-time a seen input), syncing
        every output via device_get."""
        jax.block_until_ready(fn(inputs[0]))
        timed = inputs[1:]
        t0 = time.perf_counter()
        outs = [fn(x) for x in timed]
        got = jax.device_get([jnp.sum(o[0].astype(jnp.float32))
                              if isinstance(o, tuple) else
                              jnp.sum(o.astype(jnp.float32)) for o in outs])
        del got
        return (time.perf_counter() - t0) / len(timed)

    for B in (1, 2, 4, 8, 16):
        if B == 1:
            beam = jax.jit(lambda img: D.beam_search_teacher(
                params, TM.encode_image(params, img, cfg), cfg,
                max_length=20, beam_size=5))
        else:
            beam = jax.jit(lambda img: D.beam_search_teacher_batched(
                params, TM.encode_image(params, img, cfg), cfg,
                max_length=20, beam_size=5))
        enc = jax.jit(lambda img: TM.encode_image(params, img, cfg))

        # pre-stage distinct inputs on device: timed region excludes upload
        staged = [
            jax.device_put(jax.random.normal(
                jax.random.PRNGKey(1000 * B + i), (B, 3, 224, 224),
                jnp.bfloat16))
            for i in range(2 * args.calls)
        ]
        for x in staged:
            jax.block_until_ready(x)

        per_beam = timed_chain(beam, staged[:args.calls])
        per_enc = timed_chain(enc, staged[args.calls:])
        results[f"B{B}"] = {
            "beam_s_per_call": per_beam,
            "encode_s_per_call": per_enc,
            "decode_loop_s": per_beam - per_enc,
            "images_per_sec": B / per_beam,
        }
        print(f"B={B:2d}: beam {per_beam*1e3:8.2f} ms/call "
              f"(encode {per_enc*1e3:7.2f} ms, decode "
              f"{(per_beam-per_enc)*1e3:7.2f} ms)  "
              f"{B/per_beam:8.1f} img/s", flush=True)

    # upload cost for one batched-8 input, for the writeup
    import numpy as np

    host = np.random.default_rng(0).standard_normal(
        (8, 3, 224, 224)).astype(np.float16)
    t0 = time.perf_counter()
    x = jax.device_put(jnp.asarray(host, jnp.bfloat16))
    jax.block_until_ready(x)
    results["upload_8img_s"] = time.perf_counter() - t0
    print(f"upload of one (8,3,224,224) bf16 batch: "
          f"{results['upload_8img_s']*1e3:.1f} ms", flush=True)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
