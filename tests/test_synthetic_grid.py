"""The hard 'grid' synthetic task: discriminative-floor + pipeline contract.

The converged parity benchmark (benchmarks/run_all.py config_5_converged)
is only evidence if a constant caption can't score high: the round-3
color-band task had a 0.648 constant BLEU-1 floor (VERDICT r3).  These
tests pin the grid task's floor and its fit with the data pipeline.
"""

import collections
import csv
import os

import pytest

from imagecaptioner_tpu.data.synthetic import make_synthetic_dataset
from imagecaptioner_tpu.eval.metrics import adversarial_constant_bleu1


@pytest.fixture(scope="module")
def grid_dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("grid"))
    csv_path = make_synthetic_dataset(root, n_images=128, seed=0,
                                      learnable=True, task="grid")
    refs = []
    with open(csv_path) as f:
        for row in csv.DictReader(f):
            refs.append(row["caption"].split())
    return root, csv_path, refs


def test_grid_constant_floor_discriminative(grid_dataset):
    """No constant caption — observed or greedily constructed — may exceed
    BLEU-1 0.35 on the grid task (the r3 bands task floor was 0.648)."""
    _, _, refs = grid_dataset

    floor = adversarial_constant_bleu1(refs, max_len=12)
    assert floor["best_observed"] <= 0.35, floor
    assert floor["adversarial"] <= 0.35, floor
    assert floor["floor"] == max(floor["best_observed"], floor["adversarial"])


def test_grid_captions_deterministic_and_learnable(grid_dataset):
    """Same seed -> identical captions (the image fully determines the
    caption, so the mapping is learnable); all vocab words cross the
    freq-5 threshold (no word silently becomes <UNK>)."""
    root, csv_path, refs = grid_dataset
    counts = collections.Counter(t for r in refs for t in r)
    assert all(c >= 5 for c in counts.values()), counts
    # alternating color/shape tokens, 2-4 objects
    from imagecaptioner_tpu.data.synthetic import (_GRID_COLORS,
                                                   _GRID_SHAPES)
    for r in refs:
        assert len(r) % 2 == 0 and 4 <= len(r) <= 8
        assert all(t in _GRID_COLORS for t in r[0::2])
        assert all(t in _GRID_SHAPES for t in r[1::2])


def test_grid_through_vocab_and_dataset(grid_dataset):
    root, csv_path, refs = grid_dataset
    from imagecaptioner_tpu.data.dataset import CaptionDataset

    ds = CaptionDataset(root, csv_path, image_size=224)
    assert len(ds) == 128
    img, caption_ids = ds[0]
    assert img.shape == (224, 224, 3)
    # tokens round-trip through the vocab with no <UNK>
    words = ds.vocab.decode(list(caption_ids))
    assert words == refs[0]
