#!/usr/bin/env python
"""End-to-end convergence demonstration on a memorizable synthetic dataset.

Trains the production-size teacher, then distills the full student, and
reports loss/BLEU trajectories + sample captions — evidence the whole system
learns, without Flickr8k (not available in this container).

Usage: python scripts/demo_training_run.py [--epochs-teacher N] [--epochs-kd N]
Writes docs/demo_run.md + saved_models under --workdir.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/ic_demo_run")
    ap.add_argument("--epochs-teacher", type=int, default=12)
    ap.add_argument("--epochs-kd", type=int, default=8)
    ap.add_argument("--images", type=int, default=192)
    ap.add_argument("--skip-teacher", action="store_true")
    ap.add_argument("--skip-kd", action="store_true",
                    help="reuse existing student checkpoint, just re-report")
    ap.add_argument("--out", default="docs/demo_run.md")
    # Flagged DEVIATIONS from the reference recipe, for the grounding demo
    # only (the reference fine-tunes a *pretrained* ResNet-50 with CE weight
    # exactly 0; from-scratch in this container that recipe learns grammar
    # before grounding — see docs/demo_run.md):
    ap.add_argument("--ce-weight", type=float, default=0.0,
                    help="ground-truth CE coefficient; taken out of alpha "
                         "(token-KD) so the weights still sum to 1")
    ap.add_argument("--encoder-lr-scale", type=float, default=None,
                    help="override the reference's 0.1 encoder LR scale "
                         "(sane for from-scratch encoders)")
    ap.add_argument("--patience", type=int, default=None)
    ap.add_argument("--beta", type=float, default=None,
                    help="feature-KD weight override (paid out of alpha); "
                         "the projected teacher features are image-grounded, "
                         "so raising beta transfers grounding to the CNN")
    ap.add_argument("--no-color-jitter", action="store_true",
                    help="KD augmentation without color jitter (keep flips). "
                         "The reference's hue jitter of 0.1 (~36 deg) "
                         "rotates the synthetic band colors ACROSS category "
                         "boundaries, decorrelating the caption's color "
                         "word from the augmented image — harmless on real "
                         "photos, lethal on a color-naming task")
    ap.add_argument("--no-refinement", action="store_true",
                    help="use_attention_refinement=False (reference "
                         "constructor option, student_model.py:263): the "
                         "decoder attends the raw CNN features directly — "
                         "measured r2: KL-dominant training drives the "
                         "refinement output to 0.99 cross-image cosine "
                         "(erases image identity) while raw stays at 0.90")
    ap.add_argument("--unfreeze-backbone", action="store_true",
                    help="train the whole ResNet (the reference freeze "
                         "assumes pretrained weights; frozen-at-random-init "
                         "layers destroy image information — measured: "
                         "0.999 cross-image feature cosine)")
    args = ap.parse_args()

    from imagecaptioner_tpu.core.runtime import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecaptioner_tpu.core.config import (
        DistillConfig, KDTrainConfig, TeacherTrainConfig)
    from imagecaptioner_tpu.data.synthetic import make_synthetic_dataset
    from imagecaptioner_tpu.train.train_student_kd import train_student_with_kd
    from imagecaptioner_tpu.train.train_teacher import train as train_teacher

    os.makedirs(args.workdir, exist_ok=True)
    data = os.path.join(args.workdir, "data")
    if not os.path.exists(os.path.join(data, "captions_clean.csv")):
        os.makedirs(data, exist_ok=True)
        make_synthetic_dataset(data, n_images=args.images,
                               captions_per_image=1, image_size=224, seed=0,
                               learnable=True)
    out = os.path.join(args.workdir, "saved_models")

    print(f"devices: {jax.devices()}")
    if args.skip_teacher and os.path.exists(
            os.path.join(out, "best_teacher_model.npz")):
        print("=== teacher: reusing existing checkpoint ===", flush=True)
    else:
        print("=== teacher ===", flush=True)
        train_teacher(
            data, output_dir=out,
            train_cfg=TeacherTrainConfig(num_epochs=args.epochs_teacher,
                                         validate_every=2,
                                         learning_rate=3e-4),
            verbose=True)

    kd_kw = dict(num_epochs=args.epochs_kd, validate_every=1)
    if args.encoder_lr_scale is not None:
        kd_kw["encoder_lr_scale"] = args.encoder_lr_scale
    if args.patience is not None:
        kd_kw["patience"] = args.patience
    d_cfg = DistillConfig()
    if args.ce_weight or args.beta is not None:
        # keep alpha+beta+gamma+ce == 1 by paying everything out of token-KD
        # alpha (CE weight is 1 - alpha - beta - gamma, losses.py)
        beta = d_cfg.beta if args.beta is None else args.beta
        d_cfg = DistillConfig(
            alpha=1.0 - args.ce_weight - beta - d_cfg.gamma, beta=beta)
        assert d_cfg.alpha >= 0.0

    if args.skip_kd and os.path.exists(
            os.path.join(out, "best_student_model.npz")):
        print("=== KD: reusing existing checkpoint ===", flush=True)
    else:
        print("=== KD ===", flush=True)
        aug = None
        if args.no_color_jitter:
            from imagecaptioner_tpu.data.transforms import AugmentConfig
            aug = AugmentConfig(hflip_prob=0.5)
        train_student_with_kd(
            data, teacher_checkpoint=os.path.join(out,
                                                  "best_teacher_model.npz"),
            output_dir=out, train_cfg=KDTrainConfig(**kd_kw),
            distill_cfg=d_cfg,
            freeze_backbone=not args.unfreeze_backbone,
            use_attention_refinement=not args.no_refinement,
            aug=aug, verbose=True)

    # sample captions from both models on train images
    from imagecaptioner_tpu.eval.evaluate_student import load_student_evaluator
    from imagecaptioner_tpu.data.dataset import CaptionDataset

    ev = load_student_evaluator(
        os.path.join(out, "best_student_model.npz"),
        os.path.join(out, "best_teacher_model.npz"),
        os.path.join(out, "vocab.json"))
    ds = CaptionDataset(data, os.path.join(data, "captions_clean.csv"),
                        vocab=ev.vocab, image_size=224)
    report = ev.compare_models_on_dataset(ds, max_samples=16,
                                          measure_latency_samples=2,
                                          verbose=False)

    # Grounding evidence (VERDICT r1 #4): the student must BEAT the best
    # *constant* caption — i.e. its captions must vary with the image.
    from imagecaptioner_tpu.eval import metrics as MET

    rows = report["comparisons"]
    refs = [r["reference"].lower().split() for r in rows]
    s_caps = [r["student"] for r in rows]
    distinct = len(set(s_caps))
    const_baseline = max(
        float(np.mean([MET.bleu_n(c, ref, 1) for ref in refs]))
        for c in ({tuple(ref) for ref in refs} | {tuple(c.lower().split())
                                                  for c in s_caps}))

    t_hist = json.load(open(os.path.join(out, "training_history.json")))
    s_hist = json.load(open(os.path.join(out,
                                         "student_training_history.json")))
    dev = []
    if args.ce_weight:
        dev.append(f"CE weight {args.ce_weight} (paid out of token-KD alpha)")
    if args.encoder_lr_scale is not None:
        dev.append(f"encoder LR scale {args.encoder_lr_scale} (ref: 0.1)")
    if args.unfreeze_backbone:
        dev.append("whole ResNet trainable (ref freezes children 0-5 of a "
                   "PRETRAINED backbone; frozen random layers carry no "
                   "image information)")
    if args.beta is not None:
        dev.append(f"feature-KD beta {args.beta} (ref: 0.2; the projected "
                   "teacher features are image-grounded, so feature KD "
                   "transfers grounding directly into the CNN)")
    if args.no_refinement:
        dev.append("use_attention_refinement=False (reference constructor "
                   "option; with KL-dominant training the refinement block "
                   "learns to erase image identity — measured 0.99 "
                   "cross-image cosine at its output vs 0.90 at its input)")
    if args.no_color_jitter:
        dev.append("color jitter disabled (reference KD aug uses hue 0.1 "
                   "~ 36 deg rotation — crosses the synthetic palette's "
                   "color-category boundaries, decorrelating the caption's "
                   "color words from the augmented image; harmless on real "
                   "photos)")
    lines = [
        "# End-to-end convergence demo (synthetic data, real TPU)",
        "",
        f"{args.images} synthetic images, 1 caption each; production-size "
        "models (ViT-S/16 512/8/4 teacher; ResNet-50 full student).",
        "Flagged deviations from the reference recipe (from-scratch "
        f"backbones, no pretrained weights in this container): "
        f"{'; '.join(dev) if dev else 'none'}.",
        "",
        "## Teacher",
        f"- train losses: {[round(x,3) for x in t_hist['train_losses']]}",
        f"- val losses:   {[round(x,3) for x in t_hist['val_losses']]}",
        "",
        "## Student (KD)",
        f"- train losses: {[round(x,3) for x in s_hist['train_losses']]}",
        f"- val losses:   {[round(x,3) for x in s_hist['val_losses']]}",
        f"- val BLEU-1 (monitoring): "
        f"{[round(x,3) for x in s_hist['val_bleu_scores']]}",
        "",
        f"## Final comparison ({len(rows)} samples)",
        f"- student BLEU-1 {report['student']['bleu1']:.3f}, "
        f"teacher BLEU-1 {report['teacher']['bleu1']:.3f}",
        f"- student METEOR {report['student']['meteor']:.3f}, "
        f"teacher METEOR {report['teacher']['meteor']:.3f}",
        f"- grounding: {distinct} distinct student captions over {len(rows)} "
        f"images; best constant-caption BLEU-1 {const_baseline:.3f} "
        f"({'BEATEN' if report['student']['bleu1'] > const_baseline else 'NOT beaten'} by the student)",
        "",
        "## Sample captions",
    ]
    for row in report["comparisons"][:8]:
        lines.append(f"- ref: `{row['reference']}`")
        lines.append(f"  - teacher: `{row['teacher']}`")
        lines.append(f"  - student: `{row['student']}`")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
