#!/usr/bin/env python
"""Converged-model beam serving benchmark (real trained teacher, real data).

The recorded serving sweeps (benchmarks/results.json #3) use a RANDOM
teacher — its softmax essentially never finishes a beam, so every search
runs all `max_length` decode steps.  A converged captioner emits <END>
after ~4-8 tokens, and the beam loops early-terminate there
(`decode._run_decode_loop`; benchmarks/beam_early_exit.json measured the
mechanism at 8x on a synthetic END-biased head).  This benchmark records
what serving actually sustains on a TRAINED teacher captioning its own
dataset — the deployment workload, not the fixed-work worst case:

  * trains (or reuses from --workdir) the production 512/8/4 teacher on
    the 256-image learnable synthetic set — the same checkpoint recipe as
    benchmarks/run_all.py config #5;
  * measures the packed-beam serving path on the real images, both
    early_exit=True (production default) and =False (the old fixed scan),
    as device time per call (core/profiling — immune to the relay's
    dispatch floor) and as a streamed wall rate (lax.map over dispatches,
    the rig-sustainable figure; core/timing methodology);
  * records the finished-caption length distribution that drives the win.

Writes benchmarks/serving_converged.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/ic_converged_bench")
    ap.add_argument("--images-per-call", type=int, default=8)
    ap.add_argument("--stream", type=int, default=16,
                    help="batched searches per dispatch (lax.map)")
    ap.add_argument("--epochs-teacher", type=int, default=12)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "serving_converged.json"))
    args = ap.parse_args()

    from imagecaptioner_tpu.core.runtime import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecaptioner_tpu.core import precision as P
    from imagecaptioner_tpu.core import profiling, timing
    from imagecaptioner_tpu.core.config import TeacherTrainConfig
    from imagecaptioner_tpu.data import transforms as T
    from imagecaptioner_tpu.data.dataset import CaptionDataset
    from imagecaptioner_tpu.data.synthetic import make_synthetic_dataset
    from imagecaptioner_tpu.data.vocabulary import Vocabulary
    from imagecaptioner_tpu.eval.evaluate_teacher import load_teacher_evaluator
    from imagecaptioner_tpu.models import teacher as TM
    from imagecaptioner_tpu.ops import decode as D

    # ---- checkpoint: reuse or train (same recipe as run_all config #5) ----
    os.makedirs(args.workdir, exist_ok=True)
    data = os.path.join(args.workdir, "data")
    if not os.path.exists(os.path.join(data, "captions_clean.csv")):
        os.makedirs(data, exist_ok=True)
        make_synthetic_dataset(data, n_images=256, captions_per_image=1,
                               image_size=224, seed=0, learnable=True)
    out_dir = os.path.join(args.workdir, "saved_models_grounded")
    ckpt = os.path.join(out_dir, "best_teacher_model.npz")
    if not os.path.exists(ckpt):
        from imagecaptioner_tpu.train.train_teacher import train as train_teacher

        train_teacher(data, output_dir=out_dir,
                      train_cfg=TeacherTrainConfig(
                          num_epochs=args.epochs_teacher, validate_every=2,
                          learning_rate=3e-4),
                      verbose=True)

    ev = load_teacher_evaluator(ckpt, os.path.join(out_dir, "vocab.json"))
    params = P.bf16_compute(ev.params)
    cfg = ev.cfg

    # ---- real-image batches, pre-staged on device -------------------------
    ds = CaptionDataset(data, os.path.join(data, "captions_clean.csv"),
                        vocab=ev.vocab, image_size=224)
    N, Ks = args.images_per_call, args.stream
    imgs_u8 = np.stack([np.asarray(ds[i][0])
                        for i in range(min(len(ds), N * Ks))])
    need = N * Ks
    if len(imgs_u8) < need:  # tile if the dataset is smaller than one stream
        reps = -(-need // len(imgs_u8))
        imgs_u8 = np.tile(imgs_u8, (reps, 1, 1, 1))[:need]
    images = T.normalize(jnp.asarray(imgs_u8)).astype(jnp.bfloat16)
    batches = jax.device_put(images.reshape(Ks, N, *images.shape[1:]))

    def beam_call(imgs, early_exit):
        memory = TM.encode_image(params, imgs, cfg)
        return D.beam_search_teacher_packed(params, memory, cfg,
                                            max_length=20, beam_size=5,
                                            early_exit=early_exit)

    # ---- caption-length evidence + sanity (real captions come out) --------
    seqs, scores, lens = jax.device_get(beam_call(batches[0], True))
    best_lens = lens[:, 0]
    caps = [D.beam_result_to_captions(seqs[i], scores[i], ev.vocab, 1)[0]
            for i in range(N)]
    print("sample captions:", caps[:3])

    out = {"images_per_call": N, "stream": Ks, "max_length": 20,
           "beam_size": 5, "checkpoint": ckpt,
           "best_caption_len_mean": float(np.mean(best_lens)),
           "best_caption_len_max": int(np.max(best_lens)),
           "sample_captions": caps[:4]}

    # ---- device time per call (per-HLO profile, distinct batches) --------
    for tag, ee in (("early_exit", True), ("fixed_scan", False)):
        def fn(imgs):
            return beam_call(imgs, ee)

        prof = profiling.profile_device(fn, lambda i: batches[i % Ks],
                                        runs=args.runs, warmup=1)
        us = prof["program_us_per_run"]
        out[f"device_ms_per_call_{tag}"] = us / 1e3
        out[f"device_images_per_sec_{tag}"] = N * 1e6 / us
        print(f"device {tag}: {us/1e3:.3f} ms/call = {N*1e6/us:,.0f} img/s")

    # ---- streamed wall rate (the rig-sustainable serving figure) ----------
    @jax.jit
    def stream(stacked):
        return jax.lax.map(lambda b: beam_call(b, True)[0], stacked)

    def mk(i):
        # distinct data per call (relay dedupes identical dispatches):
        # roll the batch axis so every call sees a new arrangement
        return jnp.roll(batches, i, axis=0)

    stats = timing.steady_state(stream, mk, n_small=2, n_large=8, pairs=3)
    g = timing.guarded_rate(stats, items_per_call=float(N * Ks),
                            flops_per_item=4.6e9)
    out["streamed_wall_images_per_sec"] = g["items_per_sec"]
    out["relay_calibration"] = g.get("calibration", None)
    print(f"streamed wall: {g['items_per_sec']:,.0f} img/s "
          f"({N}x{Ks} per dispatch)")

    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
