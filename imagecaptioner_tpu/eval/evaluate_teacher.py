"""Teacher evaluation (src/evaluate_teacher.py semantics — which crashes
as-shipped on a stale import; this one runs, per SURVEY §7 'faithful quirks').

CaptionEvaluator: BLEU-1/2 n-gram precision, simplified METEOR-F1, caption
length stats, vocabulary diversity, dataset evaluation with beam-search
captioning, JSON report (``evaluation_report.json``) with sample captions.

Usage: ``python -m imagecaptioner_tpu.eval.evaluate_teacher [...]``.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from imagecaptioner_tpu.core.config import TeacherConfig
from imagecaptioner_tpu.data import transforms as T
from imagecaptioner_tpu.data.loader import get_loader
from imagecaptioner_tpu.data.vocabulary import Vocabulary
from imagecaptioner_tpu.eval import metrics as MET
from imagecaptioner_tpu.models import teacher as TM
from imagecaptioner_tpu.ops import decode as D
from imagecaptioner_tpu.utils import checkpoint as CKPT


class CaptionEvaluator:
    def __init__(self, params: Dict, cfg: TeacherConfig, vocab: Vocabulary):
        self.params = params
        self.cfg = cfg
        self.vocab = vocab

    # metric surface kept method-for-method with the reference
    def bleu_score(self, predicted: str, reference: str, n: int = 1) -> float:
        return MET.bleu_n(predicted.lower().split(), reference.lower().split(), n)

    def meteor_score_simple(self, predicted: str, reference: str) -> float:
        return MET.meteor_f1(predicted.lower().split(), reference.lower().split())

    def caption_image(self, image_nchw: jnp.ndarray, *, max_length=20,
                      beam_size=5, length_penalty=0.6,
                      num_return_sequences=1) -> List[str]:
        memory = TM.encode_image(self.params, image_nchw, self.cfg)
        seqs, scores, _ = D.beam_search_teacher(
            self.params, memory, self.cfg, max_length=max_length,
            beam_size=beam_size, length_penalty=length_penalty)
        return D.beam_result_to_captions(seqs, scores, self.vocab,
                                         num_return_sequences)

    def caption_images_batch(self, images_nchw: jnp.ndarray, *,
                             max_length=20, beam_size=5,
                             length_penalty=0.6) -> List[str]:
        """(N, 3, H, W) -> N best-beam captions in ONE dispatch via the
        packed beam (beams folded into the batch dim — token-identical to
        the per-image search, ops/decode.beam_search_teacher_packed)."""
        memory = TM.encode_image(self.params, images_nchw, self.cfg)
        seqs, scores, _ = D.beam_search_teacher_packed(
            self.params, memory, self.cfg, max_length=max_length,
            beam_size=beam_size, length_penalty=length_penalty)
        seqs, scores = jax.device_get((seqs, scores))
        return [D.beam_result_to_captions(seqs[i], scores[i], self.vocab, 1)[0]
                for i in range(seqs.shape[0])]

    def evaluate_on_dataset(self, dataset, *, max_samples: int = 500,
                            images_per_batch: int = 5, eval_batch: int = 16,
                            verbose: bool = True) -> Dict:
        """evaluate_teacher.py:93-148: beam caption vs reference.  Batched
        ``eval_batch`` images per dispatch (this rig's per-dispatch floor is
        20-130 ms — a per-image loop would spend 10-60 s on dispatch alone
        for 500 samples); the packed beam is token-identical to the
        per-image search, so report values are unchanged.  A failing batch
        degrades to the per-image path so failures stay per-image."""
        n = min(max_samples, len(dataset))
        bleu1, bleu2, meteor = [], [], []
        captions_out, refs_out = [], []
        failures = 0
        done = 0
        for start in range(0, n, eval_batch):
            items = []
            for i in range(start, min(start + eval_batch, n)):
                try:
                    items.append(dataset[i])
                except Exception as e:  # reference swallows per-image errors
                    failures += 1
                    if verbose:
                        print(f"  [warn] sample {i} failed: {e}")
            if not items:
                continue
            imgs_u8 = np.stack([np.asarray(it[0]) for it in items])
            # pad the trailing partial batch to the compiled batch shape
            # (a fresh compile costs minutes through this relay)
            pad = eval_batch - len(items) if start > 0 else 0
            if pad:
                imgs_u8 = np.concatenate(
                    [imgs_u8, np.repeat(imgs_u8[-1:], pad, axis=0)])
            images = T.normalize(jnp.asarray(imgs_u8))
            try:
                preds = self.caption_images_batch(images)[:len(items)]
            except Exception as e:
                if verbose:
                    print(f"  [warn] batch at {start} failed ({e}); "
                          "retrying per-image")
                preds = []
                for it in items:
                    try:
                        preds.append(self.caption_image(
                            T.normalize(jnp.asarray(it[0])[None]))[0])
                    except Exception as e2:
                        preds.append(None)
                        failures += 1
                        if verbose:
                            print(f"  [warn] sample failed: {e2}")
            for (img_u8, cap_ids), pred in zip(items, preds):
                if pred is None:
                    continue
                ref = " ".join(self.vocab.decode(cap_ids))
                bleu1.append(self.bleu_score(pred, ref, 1))
                bleu2.append(self.bleu_score(pred, ref, 2))
                meteor.append(self.meteor_score_simple(pred, ref))
                captions_out.append(pred)
                refs_out.append(ref)
            done = min(start + eval_batch, n)
            if verbose and done % max(1, images_per_batch * 10) < eval_batch:
                print(f"  evaluated {done}/{n}")
        total = len(bleu1)
        return {
            "num_samples": total,
            "success_rate": total / max(total + failures, 1),
            "bleu1": float(np.mean(bleu1)) if bleu1 else 0.0,
            "bleu2": float(np.mean(bleu2)) if bleu2 else 0.0,
            "meteor": float(np.mean(meteor)) if meteor else 0.0,
            "length_stats": MET.caption_length_stats(
                [c.split() for c in captions_out]),
            "diversity": MET.vocabulary_diversity(
                [c.split() for c in captions_out]),
            "samples": [
                {"generated": c, "reference": r}
                for c, r in list(zip(captions_out, refs_out))[:20]
            ],
        }

    def evaluate_single_image(self, dataset, index: int, *,
                              save_figure: Optional[str] = None) -> Dict:
        """Caption one dataset image; optionally save a matplotlib figure
        (evaluate_teacher.py:150-185 — headless: saves instead of plt.show)."""
        img_u8, cap_ids = dataset[index]
        image = T.normalize(jnp.asarray(img_u8)[None])
        pred = self.caption_image(image)[0]
        ref = " ".join(self.vocab.decode(cap_ids))
        result = {
            "generated": pred, "reference": ref,
            "bleu1": self.bleu_score(pred, ref, 1),
            "meteor": self.meteor_score_simple(pred, ref),
        }
        if save_figure:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(6, 7))
            ax.imshow(img_u8)
            ax.axis("off")
            ax.set_title(f"Generated: {pred}\nReference: {ref}", fontsize=9,
                         wrap=True)
            fig.savefig(save_figure, bbox_inches="tight", dpi=100)
            plt.close(fig)
            result["figure"] = save_figure
        return result

    def generate_report(self, dataset, output_path: str = "evaluation_report.json",
                        **kw) -> Dict:
        report = self.evaluate_on_dataset(dataset, **kw)
        os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
        with open(output_path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"Evaluation report saved to {output_path}")
        print(f"BLEU-1: {report['bleu1']:.4f}  BLEU-2: {report['bleu2']:.4f}  "
              f"METEOR: {report['meteor']:.4f}")
        return report


def load_teacher_evaluator(checkpoint_path: str, vocab_path: str
                           ) -> CaptionEvaluator:
    ckpt = CKPT.load_checkpoint(checkpoint_path)
    vocab = Vocabulary.load(vocab_path)
    cfg = TeacherConfig(vocab_size=int(ckpt["vocab_size"]),
                        **ckpt.get("model_config", {}))
    params = jax.tree.map(jnp.asarray, ckpt["model_state_dict"]["params"])
    return CaptionEvaluator(params, cfg, vocab)


def main():
    ap = argparse.ArgumentParser(description="Evaluate the teacher model")
    ap.add_argument("--checkpoint", default="saved_models/best_teacher_model.npz")
    ap.add_argument("--vocab", default="saved_models/vocab.json")
    ap.add_argument("--data-root", default="data/flickr8k")
    ap.add_argument("--captions-file", default=None)
    ap.add_argument("--max-samples", type=int, default=500)
    ap.add_argument("--output", default="evaluation_report.json")
    args = ap.parse_args()
    from imagecaptioner_tpu.core.runtime import enable_compile_cache

    enable_compile_cache()
    evaluator = load_teacher_evaluator(args.checkpoint, args.vocab)
    captions = args.captions_file or os.path.join(args.data_root,
                                                  "captions_clean.csv")
    from imagecaptioner_tpu.data.dataset import CaptionDataset
    dataset = CaptionDataset(args.data_root, captions,
                             vocab=evaluator.vocab,
                             image_size=evaluator.cfg.image_size)
    evaluator.generate_report(dataset, args.output,
                              max_samples=args.max_samples)


if __name__ == "__main__":
    main()
