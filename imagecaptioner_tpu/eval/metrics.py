"""Caption quality metrics.

Reproduces the reference's evaluator math exactly (they are simplified,
precision-only metrics — not sacrebleu):
  * BLEU-n: modified n-gram precision with count clipping
    (evaluate_teacher.py:25-46, evaluate_student.py:30-47)
  * "METEOR": unigram-overlap F1
    (evaluate_teacher.py:48-64, evaluate_student.py:53-69)
  * monitoring BLEU-1: set-intersection / len(target-set)
    (distillation_utils.py:398-409)
  * caption length stats and vocabulary diversity (evaluate_teacher.py:66-91)
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Iterable, List, Sequence


def ngram_precision(candidate: Sequence[str], reference: Sequence[str],
                    n: int) -> float:
    """Clipped n-gram precision; 0.0 when either side is shorter than n
    (evaluate_student.py:30-51)."""
    if len(candidate) < n or len(reference) < n:
        return 0.0
    cand_ngrams = Counter(tuple(candidate[i:i + n])
                          for i in range(len(candidate) - n + 1))
    ref_ngrams = Counter(tuple(reference[i:i + n])
                         for i in range(len(reference) - n + 1))
    if not cand_ngrams:
        return 0.0
    overlap = sum(min(c, ref_ngrams[g]) for g, c in cand_ngrams.items())
    return overlap / sum(cand_ngrams.values())


def bleu_n(candidate: Sequence[str], reference: Sequence[str], n: int) -> float:
    return ngram_precision(candidate, reference, n)


def adversarial_constant_bleu1(refs: Sequence[Sequence[str]],
                               extra_candidates: Iterable[Sequence[str]] = (),
                               max_len: int = 16) -> Dict:
    """Best mean BLEU-1 any CONSTANT caption achieves against ``refs`` — the
    grounding floor a trained model must beat (a benchmark a constant string
    can game is not discriminative; VERDICT r3 #3).

    Two candidate families (the single shared implementation — ADVICE r4 #4
    replaced three drifting copies in run_all.py / check_constant_floor.py /
    test_synthetic_grid.py):
      * every observed reference caption (plus ``extra_candidates``, e.g. a
        model's own outputs);
      * a greedy adversarial constant built token-by-token (append whichever
        vocab token raises the mean clipped precision most, up to
        ``max_len`` tokens) — stronger than any observed caption under the
        no-brevity-penalty reference BLEU.

    Returns ``{"best_observed", "adversarial", "adversarial_tokens",
    "floor"}`` where ``floor`` is the max of the two scores.
    """
    refs = [list(r) for r in refs]

    def mean_b1(cand):
        return sum(bleu_n(cand, r, 1) for r in refs) / len(refs)

    candidates = ({tuple(r) for r in refs}
                  | {tuple(c) for c in extra_candidates})
    best_obs = max((mean_b1(list(c)) for c in candidates), default=0.0)
    vocab = sorted({t for r in refs for t in r})
    adv: List[str] = []
    best_adv = 0.0
    for _ in range(max_len):
        sc, tok = max((mean_b1(adv + [t]), t) for t in vocab)
        if sc <= best_adv:
            break
        best_adv, adv = sc, adv + [tok]
    return {"best_observed": best_obs, "adversarial": best_adv,
            "adversarial_tokens": adv,
            "floor": max(best_obs, best_adv)}


def meteor_f1(candidate: Sequence[str], reference: Sequence[str]) -> float:
    """Unigram-overlap F1 — the reference's 'simplified METEOR'
    (evaluate_student.py:53-69)."""
    cand_set, ref_set = set(candidate), set(reference)
    if not ref_set:
        return 0.0
    overlap = len(cand_set & ref_set)
    recall = overlap / len(ref_set)
    precision = overlap / len(cand_set) if cand_set else 0.0
    if precision + recall == 0:
        return 0.0
    return 2.0 * precision * recall / (precision + recall)


def monitoring_bleu(pred_ids: Iterable[int], target_ids: Iterable[int],
                    vocab) -> float:
    """Set-intersection BLEU-1 used inside training validation
    (distillation_utils.py:398-409); ids 0/1/2 stripped."""
    pred_words = [vocab.itos[int(i)] for i in pred_ids
                  if int(i) not in (0, 1, 2) and int(i) in vocab.itos]
    target_words = [vocab.itos[int(i)] for i in target_ids
                    if int(i) not in (0, 1, 2) and int(i) in vocab.itos]
    if not target_words:
        return 0.0
    return len(set(pred_words) & set(target_words)) / len(set(target_words))


def caption_length_stats(captions: List[Sequence[str]]) -> Dict[str, float]:
    lengths = [len(c) for c in captions]
    if not lengths:
        return {"mean_length": 0.0, "min_length": 0, "max_length": 0}
    return {
        "mean_length": sum(lengths) / len(lengths),
        "min_length": min(lengths),
        "max_length": max(lengths),
    }


def vocabulary_diversity(captions: List[Sequence[str]]) -> Dict[str, object]:
    all_words = [w for c in captions for w in c]
    if not all_words:
        return {"unique_words": 0, "total_words": 0, "diversity_ratio": 0.0,
                "most_common": []}
    counts = Counter(all_words)
    return {
        "unique_words": len(counts),
        "total_words": len(all_words),
        "diversity_ratio": len(counts) / len(all_words),
        "most_common": counts.most_common(10),
    }
