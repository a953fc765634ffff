#!/usr/bin/env python
"""Pre-training component validation — the script the reference README
instructs users to run (README.md:50,58-63) but never shipped (SURVEY §4).

Validates every KD component on synthetic data before a real run: data
pipeline, teacher forward, student forward (all three variants), projector,
distillation losses, a full train step, and greedy decode.  Exit 0 = ready.

Usage: python test_kd_pipeline.py [--full]   (--full also checks the
enhanced student and the optimized loss; slower)
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"  [ok] {name} ({time.time() - t0:.1f}s)")
        return True
    except Exception as e:
        print(f"  [FAIL] {name}: {type(e).__name__}: {e}")
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    print(f"Devices: {jax.devices()}")
    results = []

    # tiny configs so this runs in seconds on CPU or one chip
    from imagecaptioner_tpu.core.config import (
        DistillConfig, KDTrainConfig, OptimizedDistillConfig, TeacherConfig,
        compact_student_config, enhanced_student_config, full_student_config)

    IMG = 64
    t_cfg = TeacherConfig(vocab_size=64, embed_size=32, num_heads=4,
                          num_decoder_layers=2, dropout=0.0, encoder_dim=24,
                          encoder_depth=2, encoder_heads=3, image_size=IMG,
                          patch_size=16)

    state = {}

    def data_pipeline():
        from imagecaptioner_tpu.data.loader import get_loader
        from imagecaptioner_tpu.data.synthetic import make_synthetic_dataset

        tmp = tempfile.mkdtemp(prefix="kd_preflight_")
        make_synthetic_dataset(tmp, n_images=8, captions_per_image=2,
                               image_size=IMG, seed=0)
        loader, ds = get_loader(tmp, f"{tmp}/captions_clean.csv",
                                batch_size=4, max_caption_len=12,
                                image_size=IMG)
        batch = next(iter(loader))
        assert batch["images"].shape == (4, IMG, IMG, 3)
        assert batch["captions"].shape == (12, 4)
        state["batch"] = batch
        state["vocab"] = ds.vocab

    results.append(check("data pipeline (tokenizer/vocab/loader)", data_pipeline))

    def teacher_forward():
        from imagecaptioner_tpu.data import transforms as T
        from imagecaptioner_tpu.models import teacher as TM

        p = TM.teacher_init(jax.random.PRNGKey(0), t_cfg)
        images = T.normalize(jnp.asarray(state["batch"]["images"]))
        caps = jnp.asarray(state["batch"]["captions"])
        logits = TM.teacher_apply(p, images, caps[:-1], t_cfg)
        assert logits.shape == (11, 4, 64) and bool(jnp.isfinite(logits).all())
        state["teacher"] = p
        state["images"] = images

    results.append(check("teacher forward (ViT + transformer decoder)",
                         teacher_forward))

    def students_forward():
        from imagecaptioner_tpu.models import student as SM

        caps = jnp.asarray(state["batch"]["captions"])[:-1]
        variants = [full_student_config(64, embed_size=16, hidden_size=24,
                                        dropout=0.0),
                    compact_student_config(64, embed_size=16, hidden_size=16)]
        if args.full:
            variants.append(enhanced_student_config(
                64, embed_size=32, hidden_size=48, num_layers=2, dropout=0.0))
        for cfg in variants:
            p, s = SM.student_init(jax.random.PRNGKey(1), cfg)
            (logits, feats, hiddens, attns), _ = SM.student_apply(
                p, s, state["images"], caps, cfg)
            assert logits.shape[-1] == 64
            assert bool(jnp.isfinite(logits).all()), cfg.variant
        state["student_cfg"] = variants[0]
        state["student"] = SM.student_init(jax.random.PRNGKey(1), variants[0])

    results.append(check("student forwards (full/compact"
                         + ("/enhanced)" if args.full else ")"),
                         students_forward))

    def distillation():
        from imagecaptioner_tpu.distill.validate import validate_distillation_setup

        p, s = state["student"]
        caps = jnp.asarray(state["batch"]["captions"])
        projectors, d_cfg = validate_distillation_setup(
            state["teacher"], t_cfg, p, s, state["student_cfg"],
            (state["images"], caps), verbose=False)
        state["projectors"] = projectors

    results.append(check("distillation setup (projector + loss preflight)",
                         distillation))

    def decode():
        from imagecaptioner_tpu.models import student as SM
        from imagecaptioner_tpu.ops import decode as D

        p, s = state["student"]
        _, refined, _ = SM.encode_image(p, s, state["images"],
                                        state["student_cfg"])
        toks = D.greedy_decode_student(p, refined, state["student_cfg"],
                                       max_length=8)
        assert toks.shape == (4, 8)
        from imagecaptioner_tpu.models import teacher as TM

        memory = TM.encode_image(state["teacher"], state["images"][:1], t_cfg)
        seqs, scores, _ = D.beam_search_teacher(state["teacher"], memory,
                                                t_cfg, max_length=6,
                                                beam_size=3)
        assert seqs.shape[0] == 3

    results.append(check("decode (student greedy + teacher beam)", decode))

    def train_step():
        from imagecaptioner_tpu.train import optim as O, steps

        p, s = state["student"]
        params = {"student": p, "projectors": state["projectors"]}
        ts = steps.TrainState(params, O.adamw_init(params), s)
        step = steps.make_kd_train_step(
            t_cfg, state["student_cfg"], DistillConfig(),
            KDTrainConfig(batch_size=4, accumulation_steps=1),
            compute_dtype=jnp.float32)
        batch = {k: np.asarray(v)[None] for k, v in state["batch"].items()}
        ts2, metrics = step(ts, state["teacher"], batch, jnp.float32(0.0),
                            jnp.int32(0), jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["total_loss"]))

    results.append(check("jitted KD train step (fwd+bwd+AdamW)", train_step))
    # note: the train step donates its input state buffers — anything after
    # this point must use the returned state, not state["student"]

    if args.full:
        def optimized_loss():
            from imagecaptioner_tpu.distill import losses as DL

            s_out = {"logits": jnp.zeros((5, 2, 64)),
                     "encoder_features": jnp.ones((2, 49, 16))}
            t_out = {"logits": jnp.ones((5, 2, 64)),
                     "encoder_features": jnp.ones((2, 49, 16))}
            targets = jnp.ones((5, 2), jnp.int32)
            loss, _ = DL.optimized_distillation_loss(
                s_out, t_out, targets, OptimizedDistillConfig(), 0)
            assert np.isfinite(float(loss))

        results.append(check("optimized distillation loss", optimized_loss))

    ok = all(results)
    print(f"\n{'All components validated — ready to train.' if ok else 'FAILURES detected — fix before training.'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
