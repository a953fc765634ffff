"""Data pipeline (L1): tokenizer, vocabulary, dataset, transforms, loader.

Reproduces src/data_loader.py semantics — spaCy-lowercase tokenization,
threshold-at-5 first-reached vocab ordering, fixed specials, time-major
(T, B) padded captions, silent batch cap at 16 — with a TPU-first execution
model: host decode to fixed-shape uint8, on-device fused resize / normalize /
augment, async prefetch of static-shape batches (no recompiles).
"""

from imagecaptioner_tpu.data.tokenizer import tokenize
from imagecaptioner_tpu.data.vocabulary import Vocabulary
from imagecaptioner_tpu.data.dataset import CaptionDataset
from imagecaptioner_tpu.data.loader import get_loader

__all__ = ["tokenize", "Vocabulary", "CaptionDataset", "get_loader"]
