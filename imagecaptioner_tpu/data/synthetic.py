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


# hard "grid" mode: 2-4 colored shapes on a 3x3 grid, captioned in raster
# order with NO glue words.  Designed so the best CONSTANT caption scores
# BLEU-1 <= ~0.3 (measured ~0.26 over 256 images) — the round-3 color-band
# task had a 0.648 constant floor (VERDICT r3 "what's missing" #1), which
# left only a 0.24-wide discriminative band above the floor.
_GRID_PALETTE = [
    (220, 40, 40), (40, 180, 40), (40, 70, 220), (230, 210, 40),
    (40, 200, 200), (200, 40, 200), (240, 140, 30), (150, 150, 150),
    (120, 70, 20), (250, 180, 190), (130, 30, 220), (30, 100, 60),
]
_GRID_COLORS = ["red", "green", "blue", "yellow", "cyan", "magenta",
                "orange", "gray", "brown", "pink", "violet", "olive"]
_GRID_SHAPES = ["square", "circle", "triangle", "cross", "ring",
                "diamond", "bar", "chevron", "dot", "frame", "tee", "ell"]


def _draw_shape(cell: "np.ndarray", shape: str, color) -> None:
    """Rasterize ``shape`` in ``color`` onto a square uint8 cell (H, W, 3)."""
    h = cell.shape[0]
    yy, xx = np.mgrid[0:h, 0:h].astype(np.float32)
    cy = cx = (h - 1) / 2.0
    r = h * 0.36
    y, x = yy - cy, xx - cx
    if shape == "square":
        m = (np.abs(y) < r) & (np.abs(x) < r)
    elif shape == "circle":
        m = y * y + x * x < r * r
    elif shape == "triangle":
        m = (y > -r) & (np.abs(x) < (y + r) * 0.6)
    elif shape == "cross":
        m = ((np.abs(x) < r * 0.3) | (np.abs(y) < r * 0.3)) & \
            (np.abs(x) < r) & (np.abs(y) < r)
    elif shape == "ring":
        d2 = y * y + x * x
        m = (d2 < r * r) & (d2 > (r * 0.55) ** 2)
    elif shape == "diamond":
        m = np.abs(y) + np.abs(x) < r
    elif shape == "bar":
        m = (np.abs(y) < r * 0.35) & (np.abs(x) < r)
    elif shape == "chevron":
        m = (np.abs(y - np.abs(x) * 0.8 + r * 0.4) < r * 0.3) & \
            (np.abs(x) < r)
    elif shape == "dot":
        m = y * y + x * x < (r * 0.45) ** 2
    elif shape == "frame":
        m = (np.maximum(np.abs(y), np.abs(x)) < r) & \
            (np.maximum(np.abs(y), np.abs(x)) > r * 0.55)
    elif shape == "tee":
        m = ((np.abs(y + r * 0.65) < r * 0.3) & (np.abs(x) < r)) | \
            ((np.abs(x) < r * 0.3) & (np.abs(y) < r))
    elif shape == "ell":
        m = ((np.abs(x + r * 0.65) < r * 0.3) & (np.abs(y) < r)) | \
            ((np.abs(y - r * 0.65) < r * 0.3) & (np.abs(x) < r))
    else:  # pragma: no cover - guarded by _GRID_SHAPES
        raise ValueError(shape)
    cell[m] = color


def make_synthetic_dataset(
    root: str, *, n_images: int = 24, captions_per_image: int = 1,
    image_size: int = 224, seed: int = 0, learnable: bool = False,
    task: str = "bands",
) -> str:
    """Create images + CSV under ``root``; returns the CSV path.

    ``learnable=True`` generates images whose content DETERMINES the caption
    so models can actually learn the image->caption mapping — used by the
    convergence benchmarks.  Two learnable tasks:

    * ``task="bands"`` — three colored bands -> "the <color> <noun> <verb>
      on the <color> ground ." (round-3 task; constant-caption BLEU-1 floor
      0.648 — weakly discriminative).
    * ``task="grid"`` — 2-4 colored shapes (12 colors x 12 shapes) in
      distinct cells of a 3x3 grid, caption = "<color> <shape> <color>
      <shape> ..." in raster order.  No glue tokens and wide attribute
      pools push the constant floor to ~0.26, so a converged
      student/teacher ratio on this task is real evidence
      (scripts/check_constant_floor.py records the floor).

    Default (``learnable=False``) is random noise + random captions
    (vocab/shape tests only).
    """
    if task not in ("bands", "grid"):
        raise ValueError(f"unknown synthetic task {task!r}")
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "Images")
    os.makedirs(img_dir, exist_ok=True)
    rows: List[str] = ["image,caption"]
    for i in range(n_images):
        name = f"img_{i:04d}.jpg"
        if learnable and task == "grid":
            n_obj = int(rng.integers(2, 5))
            cells = rng.choice(9, size=n_obj, replace=False)
            cells.sort()  # raster order = caption order
            colors = rng.integers(0, len(_GRID_COLORS), n_obj)
            shapes = rng.integers(0, len(_GRID_SHAPES), n_obj)
            arr = np.full((image_size, image_size, 3), 24, np.uint8)
            cs = image_size // 3
            words = []
            for cell, ci, si in zip(cells, colors, shapes):
                r, c = divmod(int(cell), 3)
                _draw_shape(arr[r * cs:(r + 1) * cs, c * cs:(c + 1) * cs],
                            _GRID_SHAPES[si], _GRID_PALETTE[ci])
                words += [_GRID_COLORS[ci], _GRID_SHAPES[si]]
            arr = np.clip(arr.astype(np.int16)
                          + rng.integers(-10, 11, arr.shape), 0, 255
                          ).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(img_dir, name))
            for _ in range(captions_per_image):
                rows.append(f"{name},{' '.join(words)}")
        elif learnable:
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
