#!/usr/bin/env python
"""Diagnose whether a trained student's captions can depend on the image.

Mode collapse (one caption for every image) has a measurable signature at
three stages; this prints all of them for a checkpoint:

  1. raw encoder features   — cross-image pairwise cosine (≈1.0 means the
     CNN itself carries no image information, e.g. frozen-at-random-init
     backbone stages);
  2. refined features       — same after AttentionRefinement (the decoder
     attends over THESE; round-2 finding: KL-dominant KD training drove
     refined cosine to 0.99 while raw stayed at 0.90 — the refinement block
     learned to erase image identity because predicting the teacher's
     average distribution is a strong local optimum when CE weight is 0);
  3. step-1 logits          — distribution over the first word given
     <START>: if these are ~identical across images, greedy decode is
     image-independent from token one.

Usage: python scripts/diagnose_student_grounding.py \
          --checkpoint .../best_student_model.npz --vocab .../vocab.json \
          --data-root .../data [--n 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pairwise_cos(f: np.ndarray):
    g = f.reshape(f.shape[0], -1).astype(np.float64)
    g = g / np.linalg.norm(g, axis=1, keepdims=True)
    c = g @ g.T
    iu = np.triu_indices(len(g), 1)
    return float(c[iu].mean()), float(c[iu].min())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--vocab", required=True)
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--captions-csv", default=None)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from imagecaptioner_tpu.core.runtime import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from imagecaptioner_tpu.core.config import full_student_config
    from imagecaptioner_tpu.data import transforms as T
    from imagecaptioner_tpu.data.dataset import CaptionDataset
    from imagecaptioner_tpu.data.vocabulary import START, Vocabulary
    from imagecaptioner_tpu.models import lstm as L
    from imagecaptioner_tpu.models import student as SM
    from imagecaptioner_tpu.utils import checkpoint as CKPT

    ck = CKPT.load_checkpoint(args.checkpoint)
    vocab = Vocabulary.from_json(open(args.vocab).read())
    cfg = full_student_config(len(vocab), dropout=0.0)
    p = jax.tree.map(jnp.asarray, ck["student_state_dict"]["params"])
    s = jax.tree.map(jnp.asarray, ck["student_state_dict"]["model_state"])

    csv = args.captions_csv or os.path.join(args.data_root,
                                            "captions_clean.csv")
    ds = CaptionDataset(args.data_root, csv, vocab=vocab,
                        image_size=cfg.image_size)
    imgs = np.stack([ds.load_image(i) for i in range(min(args.n, len(ds)))])
    x = T.normalize(jnp.asarray(imgs))

    @jax.jit
    def probe(x):
        raw, refined, _ = SM.encode_image(p, s, x, cfg, train=False)
        B = x.shape[0]
        from imagecaptioner_tpu.core import modules as M

        start = jnp.full((B,), START, jnp.int32)
        word = M.embedding(p["decoder"]["embedding"], start)
        word = word.astype(refined.dtype)
        hc0 = L.init_hidden(cfg.num_layers, B, cfg.hidden_size,
                            dtype=refined.dtype)
        h_top, _, attn = L.full_decoder_step(
            p["decoder"], word, hc0, refined, cfg)
        logits = L.output_projection(p["decoder"]["output_projection"],
                                     h_top, cfg)
        return raw, refined, logits, attn

    raw, refined, logits, attn = map(np.asarray, probe(x))

    ent = [-float((a * np.log(a + 1e-9)).sum()) for a in
           attn.reshape(attn.shape[0], -1)]
    report = {
        "n_images": int(imgs.shape[0]),
        "raw_feature_cos_mean_min": pairwise_cos(raw),
        "refined_feature_cos_mean_min": pairwise_cos(refined),
        "step1_logits_cos_mean_min": pairwise_cos(logits),
        "step1_attention_entropy_nats": ent,
        "attention_entropy_max_nats": float(np.log(cfg.feature_tokens)),
        "step1_argmax_words": [vocab.itos[int(i)]
                               for i in logits.argmax(axis=1)],
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
