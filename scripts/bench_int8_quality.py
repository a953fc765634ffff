#!/usr/bin/env python
"""int8-vs-f32 caption QUALITY on converged checkpoints (CPU-runnable).

Loads a converged teacher + full student from a ``benchmarks/run_all.py
--configs 5 --converged`` workdir, captions the first N dataset images with
the float and the int8-encoder (ops/quant.py) models, and records caption
agreement + BLEU-1 for both serving paths.  This is the accuracy half of
the int8 serving story; the throughput half is
``scripts/profile_serving_hlo.py --int8`` on the chip.

Recorded result (benchmarks/int8_quality.json, reference-recipe workdir):
teacher beam (int8 encoder) 31/32 captions identical, BLEU-1
0.8542 -> 0.8507; student greedy 32/32 identical, BLEU-1 0.6563 unchanged.
``teacher_beam_full`` additionally quantizes the transformer decoder
(quantize_teacher_full_int8 — the beam loop's weight-traffic lever).

Usage: python scripts/bench_int8_quality.py
         [--workdir /tmp/ic_converged_ref] [--recipe reference] [--n 32]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/ic_converged_ref")
    ap.add_argument("--recipe", default="reference")
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--static", action="store_true",
                    help="also record the STATIC-scale arms: activation "
                         "scales calibrated on the first --calib-n images "
                         "(teacher decoder arms calibrate on its own "
                         "greedy-decoded tokens; margin --margin), then "
                         "quality measured on all --n images — the "
                         "clipping-vs-quality record the static serving "
                         "mode (ops/quant.py, greedy_int8_static) needs")
    ap.add_argument("--calib-n", type=int, default=8)
    ap.add_argument("--margin", type=float, default=1.25)
    ap.add_argument("--sweep", action="store_true",
                    help="STUDENT static arm only: sweep margin x calib_n "
                         "plus layer-exclusion arms (stem / projection kept "
                         "float) on the converged checkpoint — the "
                         "attack-or-bound record for the static-int8 "
                         "student quality cost (VERDICT r4 #5); records "
                         "under 'student_static_sweep'")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "int8_quality.json"))
    args = ap.parse_args()

    from imagecaptioner_tpu.core.runtime import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from imagecaptioner_tpu.core.config import TeacherConfig
    from imagecaptioner_tpu.data import transforms as T
    from imagecaptioner_tpu.data.vocabulary import Vocabulary
    from imagecaptioner_tpu.eval.metrics import bleu_n
    from imagecaptioner_tpu.models import student as SM
    from imagecaptioner_tpu.models import teacher as TM
    from imagecaptioner_tpu.ops import decode as D
    from imagecaptioner_tpu.ops import quant as Q
    from imagecaptioner_tpu.utils import checkpoint as CKPT

    out_dir = os.path.join(args.workdir, f"saved_models_{args.recipe}")
    vocab = Vocabulary.load(os.path.join(out_dir, "vocab.json"))

    ck = CKPT.load_checkpoint(os.path.join(out_dir, "best_teacher_model.npz"))
    t_cfg = TeacherConfig(vocab_size=int(ck["vocab_size"]),
                          **ck.get("model_config", {}))
    tp = jax.tree.map(jnp.asarray, ck["model_state_dict"]["params"])

    # same variant dispatch as the evaluator/demo (any student model_type)
    sp, s_cfg, ss = CKPT.load_student_checkpoint(
        os.path.join(out_dir, "best_student_model.npz"))

    refs = {}
    with open(os.path.join(args.workdir, "data", "captions_clean.csv")) as f:
        for row in csv.DictReader(f):
            refs.setdefault(row["image"], []).append(row["caption"])
    names = sorted(refs)[:args.n]
    imgs = [np.asarray(
        Image.open(os.path.join(args.workdir, "data", "Images", n))
        .convert("RGB").resize((t_cfg.image_size,) * 2, Image.BILINEAR),
        np.uint8) for n in names]
    images = T.normalize(jnp.asarray(np.stack(imgs)))

    def teacher_caps(params):
        memory = TM.encode_image(params, images, t_cfg)
        seqs, scores, _ = D.beam_search_teacher_packed(
            params, memory, t_cfg, max_length=20, beam_size=5)
        return [D.beam_result_to_captions(seqs[i], scores[i], vocab, 1)[0]
                for i in range(len(names))]

    def student_caps(params):
        _, refined, _ = SM.encode_image(params, ss, images, s_cfg,
                                        train=False)
        toks = D.greedy_decode_student(params, refined, s_cfg, max_length=20)
        return [D.tokens_to_caption(np.asarray(toks[i]), vocab)
                for i in range(len(names))]

    def bleu(caps):
        return float(np.mean([
            max(bleu_n(c.split(), r.split(), 1) for r in refs[n])
            for c, n in zip(caps, names)]))

    def calibrate(pq, run_fwd, *, margin=None, calib_n=None):
        """Static activation scales on the first ``calib_n`` eval images,
        eagerly on the CPU backend (calibrate_activation_scales)."""
        host = jax.device_get(pq)
        cal_imgs = np.asarray(images[:calib_n or args.calib_n], np.float32)
        with jax.default_device(jax.devices("cpu")[0]):
            host = Q.calibrate_activation_scales(
                host, lambda q: run_fwd(q, cal_imgs),
                margin=margin or args.margin)
        return jax.tree.map(jnp.asarray, host)

    # representative decoder tokens: the model's own greedy captions for the
    # calibration images (ADVICE r3 — not a placeholder batch), decoded ONCE,
    # jitted, OUTSIDE the eager calibrate_activation_scales context
    # (ADVICE r4 #3 — it previously re-ran op-by-op per calibration pass)
    _tc = {}

    def teacher_cal_caps():
        if "caps" not in _tc:
            ims = jnp.asarray(np.asarray(images[:args.calib_n], np.float32))
            mem = TM.encode_image(tp, ims, t_cfg)
            toks = np.asarray(D.greedy_decode_teacher(tp, mem, t_cfg,
                                                      max_length=20))
            _tc["caps"] = np.concatenate(
                [np.ones((1, toks.shape[0]), np.int32),
                 toks.T.astype(np.int32)])
        return _tc["caps"]

    def teacher_cal_fwd(q, ims):
        return TM.teacher_apply(q, ims, teacher_cal_caps(), t_cfg)

    def student_cal_fwd(q, ims):
        return SM.encode_image(q, jax.device_get(ss), ims, s_cfg,
                               train=False)

    arms = [
        ("teacher_beam", teacher_caps, tp,
         Q.quantize_teacher_encoder_int8(tp), teacher_cal_fwd),
        ("teacher_beam_full", teacher_caps, tp,
         Q.quantize_teacher_full_int8(tp), teacher_cal_fwd),
        ("student_greedy", student_caps, sp,
         Q.quantize_student_encoder_int8(sp), student_cal_fwd),
    ]
    if args.sweep:
        # sweep re-measures only the student path; the teacher base arms are
        # already recorded (benchmarks/int8_quality_grid.json)
        arms = [a for a in arms if a[0] == "student_greedy"]
    res = {"workdir": args.workdir, "recipe": args.recipe,
           "n_images": len(names)}
    if os.path.exists(args.out):  # merge: keep arms a partial re-run skips
        try:
            with open(args.out) as f:
                res = {**json.load(f), **res}
        except (OSError, ValueError):
            pass
    if args.static:
        res["static_calibration"] = {"calib_n": args.calib_n,
                                     "margin": args.margin}
    for tag, fn, p, pq, cal_fwd in arms:
        c_f, c_q = fn(p), fn(pq)
        res[tag] = {
            "identical_captions": sum(a == b for a, b in zip(c_f, c_q)),
            "bleu1_f32": bleu(c_f), "bleu1_int8": bleu(c_q),
        }
        print(tag, res[tag])
        if args.static:
            if cal_fwd is teacher_cal_fwd:
                teacher_cal_caps()  # prime jitted, before the eager context
            c_s = fn(calibrate(pq, cal_fwd))
            res[tag + "_static"] = {
                "identical_captions": sum(
                    a == b for a, b in zip(c_f, c_s)),
                "bleu1_f32": bleu(c_f), "bleu1_int8_static": bleu(c_s),
            }
            print(tag + "_static", res[tag + "_static"])
    if args.sweep:
        # -- student static-quality sweep (VERDICT r4 #5) ------------------
        import copy

        c_f = student_caps(sp)
        b_f = bleu(c_f)
        sweep = {"bleu1_f32": b_f, "arms": {}}

        def record(tag, pq_cal):
            c_s = student_caps(pq_cal)
            sweep["arms"][tag] = {
                "bleu1_int8_static": bleu(c_s),
                "delta_vs_f32": bleu(c_s) - b_f,
                "identical_captions": sum(a == b for a, b in zip(c_f, c_s)),
            }
            print("sweep", tag, sweep["arms"][tag])

        base_q = Q.quantize_student_encoder_int8(sp)
        for margin in (1.0, 1.25, 1.5, 2.0):
            for calib_n in (8, 32):
                if calib_n > len(names):
                    continue
                record(f"margin{margin}_cal{calib_n}",
                       calibrate(base_q, student_cal_fwd, margin=margin,
                                 calib_n=calib_n))
        # layer-exclusion arms at the default margin/calib_n: stem conv and
        # final projection are the int8-noise-sensitive endpoints
        stem_f = copy.copy(base_q)
        stem_f = dict(stem_f, encoder=dict(
            base_q["encoder"],
            resnet=dict(base_q["encoder"]["resnet"],
                        conv1=sp["encoder"]["resnet"]["conv1"])))
        record("exclude_stem_margin1.25_cal8",
               calibrate(stem_f, student_cal_fwd, margin=1.25, calib_n=8))
        proj_f = dict(base_q, encoder=dict(
            base_q["encoder"], projection=sp["encoder"]["projection"]))
        record("exclude_projection_margin1.25_cal8",
               calibrate(proj_f, student_cal_fwd, margin=1.25, calib_n=8))
        res["student_static_sweep"] = sweep

    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
