#!/usr/bin/env python
"""Constant-caption BLEU-1 floor of a synthetic captioning task.

A parity ratio is only evidence if a CONSTANT caption can't score high
(VERDICT r3: the round-3 color-band task had a 0.648 floor).  This script
generates the task, then reports the best constant-caption BLEU-1 over:
  * every observed caption used as the constant candidate, and
  * greedy adversarial candidates built token-by-token to maximize mean
    clipped precision (length 1..16) — stronger than any observed caption.

Usage: python scripts/check_constant_floor.py [--task grid] [--n 256]
"""

from __future__ import annotations

import argparse
import collections
import csv
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def mean_bleu1(cand, refs):
    from imagecaptioner_tpu.eval.metrics import bleu_n

    return sum(bleu_n(cand, r, 1) for r in refs) / len(refs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="grid", choices=["grid", "bands"])
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from imagecaptioner_tpu.data.synthetic import make_synthetic_dataset

    with tempfile.TemporaryDirectory() as tmp:
        csv_path = make_synthetic_dataset(
            tmp, n_images=args.n, captions_per_image=1, seed=args.seed,
            learnable=True, task=args.task)
        refs = []
        with open(csv_path) as f:
            for row in csv.DictReader(f):
                refs.append(row["caption"].lower().split())

    from imagecaptioner_tpu.eval.metrics import adversarial_constant_bleu1

    floor = adversarial_constant_bleu1(refs)  # shared impl (ADVICE r4 #4)
    best_obs, best_adv = floor["best_observed"], floor["adversarial"]
    cand = floor["adversarial_tokens"]
    vocab = sorted(collections.Counter(t for r in refs for t in r))

    print(f"task={args.task} n={args.n}")
    print(f"  best observed-caption constant BLEU-1:    {best_obs:.4f}")
    print(f"  greedy adversarial constant BLEU-1:       {best_adv:.4f}"
          f"  ({' '.join(cand)})")
    lens = [len(r) for r in refs]
    print(f"  caption lengths: min {min(lens)} max {max(lens)} "
          f"mean {sum(lens)/len(lens):.1f}; vocab {len(vocab)} words")
    return 0


if __name__ == "__main__":
    sys.exit(main())
