"""Batch captioning CLI: a directory of images -> captions JSONL.

The production serving surface the reference never had (its only serving is
the one-image-per-eager-call streamlit demo, streamlit_app.py:281-307).
One jitted program captions fixed-size batches — teacher beam search or
student greedy — with opt-in int8 encoders (ops/quant.py) and opt-in
data-parallel sharding over the device mesh (eval/serving.py factories).
The trailing partial batch pads to the compiled shape (outputs trimmed),
so the whole run compiles exactly one program.

Usage:
  python -m imagecaptioner_tpu.eval.serve \
      --model student --checkpoint saved_models/best_student_model.npz \
      --vocab saved_models/vocab.json --images data/flickr8k/Images \
      --out captions.jsonl [--batch 16] [--int8] [--data-parallel]
  python -m imagecaptioner_tpu.eval.serve --model teacher \
      --checkpoint saved_models/best_teacher_model.npz [...] [--beam-size 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from typing import List

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".tiff")


def list_images(path: str) -> List[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.lower().endswith(IMAGE_EXTS))


def main(argv=None):
    ap = argparse.ArgumentParser(description="Batch caption images")
    ap.add_argument("--model", choices=["teacher", "student"],
                    required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--vocab", required=True)
    ap.add_argument("--images", required=True,
                    help="image file or directory")
    ap.add_argument("--out", default="captions.jsonl")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--max-length", type=int, default=20)
    ap.add_argument("--beam-size", type=int, default=5,
                    help="teacher only (students are greedy, "
                         "student_model.py:314)")
    ap.add_argument("--temperature", type=float, default=1.0,
                    help="student only; != 1.0 samples")
    ap.add_argument("--int8", action="store_true",
                    help="int8 PTQ serving encoder (ops/quant.py)")
    ap.add_argument("--int8-full", action="store_true",
                    help="teacher only: int8 encoder AND transformer "
                         "decoder (halves the beam loop's weight traffic; "
                         "validate quality per-checkpoint — "
                         "scripts/bench_int8_quality.py)")
    ap.add_argument("--int8-calibrate", type=int, default=0, metavar="N",
                    help="with --int8/--int8-full: bake static activation "
                         "scales calibrated on the first N input images "
                         "(eager, CPU backend) — removes the per-layer "
                         "dynamic amax pass from the serving graph. "
                         "Decoder arms calibrate on tokens the model "
                         "actually decodes for those images (a float "
                         "greedy pass), not a placeholder batch.")
    ap.add_argument("--int8-margin", type=float, default=None,
                    help="headroom multiplier on calibrated activation "
                         "scales (out-of-range activations clip at +/-127)."
                         " Default 1.0 encoder-only, 1.25 with --int8-full "
                         "(decoder activations at serve time range wider "
                         "than any finite calibration set)")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard batches over all local devices "
                         "(batch must divide by the device count)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    if args.int8_full and args.model != "teacher":
        ap.error("--int8-full applies to the teacher's transformer decoder; "
                 "students keep float decoders (use --int8)")
    if args.int8_calibrate and not (args.int8 or args.int8_full):
        ap.error("--int8-calibrate requires --int8 or --int8-full")

    from imagecaptioner_tpu.core.runtime import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from imagecaptioner_tpu.core.config import TeacherConfig
    from imagecaptioner_tpu.data import transforms as T
    from imagecaptioner_tpu.data.vocabulary import Vocabulary
    from imagecaptioner_tpu.models import student as SM
    from imagecaptioner_tpu.models import teacher as TM
    from imagecaptioner_tpu.ops import decode as D
    from imagecaptioner_tpu.utils import checkpoint as CKPT

    vocab = Vocabulary.load(args.vocab)
    files = list_images(args.images)
    if not files:
        print(f"no images found under {args.images}")
        return 1

    def calibrate_static(qparams, size, fwd, *, margin):
        """Bake static activation scales from the first --int8-calibrate
        input images.  ``fwd(host_params, images)`` runs the serving forward;
        it executes EAGERLY on the CPU backend (eager through the TPU relay
        would pay the dispatch floor per op), so the tree round-trips
        host-side."""
        from imagecaptioner_tpu.ops.quant import calibrate_activation_scales

        n = max(1, min(args.int8_calibrate, len(files)))
        arr = np.stack([
            np.asarray(Image.open(f).convert("RGB").resize(
                (size, size), Image.BILINEAR), np.uint8)
            for f in files[:n]])
        imgs = np.asarray(T.normalize(jnp.asarray(arr)))
        host = jax.device_get(qparams)
        with jax.default_device(jax.devices("cpu")[0]):
            host = calibrate_activation_scales(host,
                                               lambda q: fwd(q, imgs),
                                               margin=margin)
        print(f"[int8] static activation scales calibrated on {n} images "
              f"(margin {margin})")
        return jax.tree.map(jnp.asarray, host)

    mesh = None
    if args.data_parallel and len(jax.devices()) > 1:
        from imagecaptioner_tpu.core import mesh as MX

        mesh = MX.create_mesh()
        if args.batch % mesh.shape[MX.DATA_AXIS]:
            raise SystemExit(
                f"--batch {args.batch} must divide by the mesh data axis "
                f"({mesh.shape[MX.DATA_AXIS]})")

    if args.model == "teacher":
        ckpt = CKPT.load_checkpoint(args.checkpoint)
        cfg = TeacherConfig(vocab_size=int(ckpt["vocab_size"]),
                            **ckpt.get("model_config", {}))
        params = jax.tree.map(jnp.asarray, ckpt["model_state_dict"]["params"])
        fparams = params
        if args.int8_full:
            from imagecaptioner_tpu.ops.quant import quantize_teacher_full_int8

            params = quantize_teacher_full_int8(params)
        elif args.int8:
            from imagecaptioner_tpu.ops.quant import (
                quantize_teacher_encoder_int8)

            params = quantize_teacher_encoder_int8(params)
        if args.int8_calibrate and (args.int8 or args.int8_full):
            # Representative decoder activations (ADVICE r3): greedy-decode
            # the calibration images with the FLOAT model (jitted, cheap)
            # and calibrate the full forward on THOSE token sequences — the
            # embeddings/hidden states beam decode actually visits, not a
            # placeholder batch.  The margin (default 1.25 for decoder
            # arms) covers beam prefixes outside the greedy set.
            from imagecaptioner_tpu.data.vocabulary import START as _START

            n_cal = max(1, min(args.int8_calibrate, len(files)))
            cal_imgs = T.normalize(jnp.asarray(np.stack(
                [np.asarray(Image.open(f).convert("RGB").resize(
                    (cfg.image_size,) * 2, Image.BILINEAR), np.uint8)
                 for f in files[:n_cal]])))
            if args.int8_full:
                cal_mem = TM.encode_image(fparams, cal_imgs, cfg)
                toks = np.asarray(D.greedy_decode_teacher(
                    fparams, cal_mem, cfg, max_length=args.max_length))
                cal_caps = np.concatenate(
                    [np.full((1, n_cal), _START, np.int32),
                     toks.T.astype(np.int32)])
            else:
                # encoder-only int8: decoder tokens cannot reach any baked
                # scale, so skip the float decode + its compile and
                # calibrate the encoder under a placeholder caption batch
                # (ADVICE r4 #2)
                cal_caps = np.full((2, n_cal), _START, np.int32)
            margin = (args.int8_margin if args.int8_margin is not None
                      else (1.25 if args.int8_full else 1.0))
            params = calibrate_static(
                params, cfg.image_size,
                lambda q, im: TM.teacher_apply(q, im, cal_caps, cfg),
                margin=margin)
        if mesh is not None:
            from imagecaptioner_tpu.eval.serving import make_dp_beam_captioner

            beam_fn = make_dp_beam_captioner(
                params, cfg, mesh, max_length=args.max_length,
                beam_size=args.beam_size)
        else:
            import functools

            @functools.partial(jax.jit)
            def beam_fn(images):
                memory = TM.encode_image(params, images, cfg)
                return D.beam_search_teacher_packed(
                    params, memory, cfg, max_length=args.max_length,
                    beam_size=args.beam_size)

        def caption_batch(images):
            seqs, scores, _ = beam_fn(images)
            return [D.beam_result_to_captions(
                np.asarray(seqs[i]), np.asarray(scores[i]), vocab, 1)[0]
                for i in range(images.shape[0])]
    else:
        params, cfg, mstate = CKPT.load_student_checkpoint(args.checkpoint)
        if args.int8:
            from imagecaptioner_tpu.ops.quant import (
                quantize_student_encoder_int8)

            params = quantize_student_encoder_int8(params)
            if args.int8_calibrate:
                mstate_h = jax.device_get(mstate)
                params = calibrate_static(
                    params, cfg.image_size,
                    lambda q, im: SM.encode_image(q, mstate_h, im, cfg,
                                                  train=False),
                    margin=(args.int8_margin if args.int8_margin is not None
                            else 1.0))
        rng = (None if args.temperature == 1.0
               else jax.random.PRNGKey(args.seed))
        if mesh is not None:
            from imagecaptioner_tpu.eval.serving import (
                make_dp_greedy_captioner)

            greedy_fn = make_dp_greedy_captioner(
                params, mstate, cfg, mesh, max_length=args.max_length,
                temperature=args.temperature)
        else:
            import functools

            @functools.partial(jax.jit)
            def greedy_fn(images):
                _, refined, _ = SM.encode_image(params, mstate, images, cfg,
                                                train=False)
                return D.greedy_decode_student(
                    params, refined, cfg, max_length=args.max_length,
                    temperature=args.temperature, rng=rng)

        def caption_batch(images):
            toks = np.asarray(greedy_fn(images))
            return [D.tokens_to_caption(toks[i], vocab)
                    for i in range(images.shape[0])]

    size = cfg.image_size

    def load(path):
        im = Image.open(path).convert("RGB").resize((size, size),
                                                    Image.BILINEAR)
        return np.asarray(im, np.uint8)

    B = args.batch
    t0 = time.perf_counter()
    n_done = 0
    with open(args.out, "w") as out:
        for s in range(0, len(files), B):
            chunk = files[s:s + B]
            arr = np.stack([load(p) for p in chunk])
            if len(chunk) < B:  # pad to the compiled batch shape
                arr = np.concatenate(
                    [arr, np.repeat(arr[-1:], B - len(chunk), axis=0)])
            images = T.normalize(jnp.asarray(arr))
            caps = caption_batch(images)[:len(chunk)]
            for p, c in zip(chunk, caps):
                out.write(json.dumps(
                    {"image": os.path.basename(p), "caption": c}) + "\n")
            n_done += len(chunk)
    dt = time.perf_counter() - t0
    print(f"captioned {n_done} images -> {args.out} "
          f"({n_done / dt:.1f} img/s wall incl. first compile)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
