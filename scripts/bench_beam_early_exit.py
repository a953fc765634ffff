#!/usr/bin/env python
"""Device-time measurement of the beam search's early loop termination.

The reference's beam loop breaks once every beam has emitted <END>
(`/root/reference/src/teacher_model.py:196-198`); the fixed-shape
emulation used to scan all `max_length` steps regardless, doing provable
no-op work after `n_live == 0`.  `decode._run_decode_loop` now runs the
steps under a `lax.while_loop` with an any-image-live predicate
(IC_BEAM_EARLY_EXIT=0 restores the scan).

Two workloads, measured per-HLO on the chip (core/profiling):
  * random teacher — EOS effectively never wins a top-K slot, the loop
    runs all 20 steps: measures the while-vs-scan overhead (none).
  * END-biased output head — every beam finishes by ~step 3, standing in
    for a converged captioner (real captions are ~5-10 tokens): measures
    the early-exit win.

Writes benchmarks/beam_early_exit.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=8, help="packed images/call")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "beam_early_exit.json"))
    args = ap.parse_args()

    from imagecaptioner_tpu.core.runtime import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecaptioner_tpu.core import precision as P
    from imagecaptioner_tpu.core import profiling
    from imagecaptioner_tpu.core.config import TeacherConfig
    from imagecaptioner_tpu.models import teacher as TM
    from imagecaptioner_tpu.ops import decode as D

    V, N, MAXLEN = 2994, args.images, 20
    cfg = TeacherConfig(vocab_size=V)
    params = P.bf16_compute(TM.teacher_init(jax.random.PRNGKey(0), cfg))

    p_eos = jax.tree.map(lambda x: x, params)
    bias = np.full((V,), -2.0, np.float32)
    bias[2] = 12.0  # END
    p_eos["fc_out"] = dict(p_eos["fc_out"],
                           bias=jnp.asarray(bias, jnp.bfloat16))

    def measure(prm, early_exit):
        def fn(mem):
            return D.beam_search_teacher_packed(
                prm, mem, cfg, max_length=MAXLEN, beam_size=5,
                early_exit=early_exit)

        def mk(i):
            return jax.device_put(jax.random.normal(
                jax.random.PRNGKey(i), (N, 197, 512), jnp.bfloat16))

        prof = profiling.profile_device(fn, mk, runs=args.runs, warmup=1)
        return prof["program_us_per_run"]

    out = {"images_per_call": N, "max_length": MAXLEN, "beam_size": 5}
    for tag, prm in (("full_length", params), ("short_captions", p_eos)):
        scan_us = measure(prm, False)
        while_us = measure(prm, True)
        out[tag] = {
            "scan_ms_per_call": scan_us / 1e3,
            "early_exit_ms_per_call": while_us / 1e3,
            "speedup": scan_us / while_us,
            "device_images_per_sec_early_exit": N * 1e6 / while_us,
        }
        print(f"{tag}: scan {scan_us/1e3:.3f} ms, early-exit "
              f"{while_us/1e3:.3f} ms ({scan_us/while_us:.2f}x)")

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
