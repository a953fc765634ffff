"""Synthetic tiny datasets for tests, benchmarks, and the end-to-end smoke.

Generates a Flickr8k-shaped directory: ``root/Images/*.jpg`` + a captions CSV
with columns ``image,caption`` — enough repetitions of each word to cross the
freq-threshold so the vocab is non-trivial.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np
from PIL import Image

_WORDS = [
    "a", "dog", "runs", "on", "the", "grass", "child", "plays", "with",
    "ball", "man", "rides", "bike", "through", "park", "woman", "walks",
    "two", "dogs", "jump", "into", "water", "boy", "girl", "smiles",
]


def make_synthetic_dataset(
    root: str, *, n_images: int = 24, captions_per_image: int = 1,
    image_size: int = 224, seed: int = 0,
) -> str:
    """Create images + CSV under ``root``; returns the CSV path."""
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "Images")
    os.makedirs(img_dir, exist_ok=True)
    rows: List[str] = ["image,caption"]
    for i in range(n_images):
        name = f"img_{i:04d}.jpg"
        arr = rng.integers(0, 256, (image_size, image_size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, name))
        for _ in range(captions_per_image):
            k = int(rng.integers(4, 9))
            words = [str(_WORDS[int(w)]) for w in rng.integers(0, len(_WORDS), k)]
            rows.append(f"{name},{' '.join(words)} .")
    csv_path = os.path.join(root, "captions_clean.csv")
    with open(csv_path, "w") as f:
        f.write("\n".join(rows) + "\n")
    return csv_path
