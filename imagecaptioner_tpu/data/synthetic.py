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


# learnable mode: each image is three colored bands; the caption names them.
_PALETTE = [
    (220, 40, 40), (40, 180, 40), (40, 70, 220), (230, 210, 40),
    (40, 200, 200), (200, 40, 200), (240, 140, 30), (120, 120, 120),
]
_COLOR_WORDS = ["red", "green", "blue", "yellow",
                "cyan", "purple", "orange", "gray"]
_NOUNS = ["dog", "child", "ball", "bike", "bird", "car", "tree", "house"]
_VERBS = ["runs", "jumps", "sits", "waits", "turns", "stands", "moves", "rests"]


def make_synthetic_dataset(
    root: str, *, n_images: int = 24, captions_per_image: int = 1,
    image_size: int = 224, seed: int = 0, learnable: bool = False,
) -> str:
    """Create images + CSV under ``root``; returns the CSV path.

    ``learnable=True`` generates images whose content DETERMINES the caption
    (three colored bands -> "<color> <noun> <verb> <color> ..."), so models
    can actually learn the image->caption mapping — used by the convergence
    demo.  Default mode is random noise + random captions (vocab/shape tests).
    """
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "Images")
    os.makedirs(img_dir, exist_ok=True)
    rows: List[str] = ["image,caption"]
    for i in range(n_images):
        name = f"img_{i:04d}.jpg"
        if learnable:
            c = rng.integers(0, 8, 3)
            arr = np.zeros((image_size, image_size, 3), np.uint8)
            third = image_size // 3
            arr[:third] = _PALETTE[c[0]]
            arr[third:2 * third] = _PALETTE[c[1]]
            arr[2 * third:] = _PALETTE[c[2]]
            arr = np.clip(arr.astype(np.int16)
                          + rng.integers(-12, 13, arr.shape), 0, 255
                          ).astype(np.uint8)
            caption = (f"the {_COLOR_WORDS[c[0]]} {_NOUNS[c[1]]} "
                       f"{_VERBS[c[2]]} on the {_COLOR_WORDS[c[2]]} ground .")
            Image.fromarray(arr).save(os.path.join(img_dir, name))
            for _ in range(captions_per_image):
                rows.append(f"{name},{caption}")
        else:
            arr = rng.integers(0, 256, (image_size, image_size, 3),
                               dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(img_dir, name))
            for _ in range(captions_per_image):
                k = int(rng.integers(4, 9))
                words = [str(_WORDS[int(w)])
                         for w in rng.integers(0, len(_WORDS), k)]
                rows.append(f"{name},{' '.join(words)} .")
    csv_path = os.path.join(root, "captions_clean.csv")
    with open(csv_path, "w") as f:
        f.write("\n".join(rows) + "\n")
    return csv_path
