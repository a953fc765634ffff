"""Caption dataset: CSV of (image, caption) rows + an image directory.

Reproduces FlickrDataset semantics (data_loader.py:49-87): pandas CSV with
columns ``image,caption``, vocab built over *all* captions at construction,
``Images/<name>`` file layout, black placeholder on missing files, and
``<START> + tokens + <END>`` caption framing.

Host work is intentionally minimal (decode + resize to a fixed shape, uint8);
normalization/augmentation fuse into the jitted step (transforms.py).
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
from PIL import Image

from imagecaptioner_tpu.data.vocabulary import Vocabulary


class CaptionDataset:
    def __init__(
        self,
        root_dir: str,
        captions_file: str,
        *,
        freq_threshold: int = 5,
        image_size: int = 224,
        vocab: Optional[Vocabulary] = None,
        decode_cache_bytes: Optional[int] = None,
    ):
        self.root_dir = root_dir
        self.image_size = image_size
        self.df = pd.read_csv(captions_file)
        if len(self.df) == 0:
            raise ValueError(
                "The DataFrame is empty. Please check the captions CSV.")
        self.imgs = self.df["image"].tolist()
        self.captions = self.df["caption"].tolist()
        if vocab is None:
            vocab = Vocabulary(freq_threshold)
            vocab.build_vocabulary(self.captions)
        self.vocab = vocab
        # Decoded-uint8 cache (SURVEY §2.9 N8 / VERDICT r2 #9): training
        # re-reads the same images every epoch for tens-to-hundreds of
        # epochs, so epoch 2+ should hit RAM, not libjpeg.  Memory-bounded:
        # one 224px image is ~147 KB; the default 2 GiB budget covers ~14k
        # images (all of Flickr8k).  IC_DECODE_CACHE_BYTES overrides; 0
        # disables.
        if decode_cache_bytes is None:
            decode_cache_bytes = int(os.environ.get(
                "IC_DECODE_CACHE_BYTES", 2 << 30))
        import threading

        self._cache_budget = decode_cache_bytes
        self._cache: dict = {}
        self._cache_bytes = 0
        self._cache_lock = threading.Lock()  # thread-pool decode

    def __len__(self) -> int:
        return len(self.df)

    def select(self, indices) -> "CaptionDataset":
        """Narrow to a subset of rows IN PLACE (multi-host per-host shard).

        Call after construction so the vocabulary is still built over ALL
        captions — token ids must agree across hosts."""
        self.df = self.df.iloc[list(indices)].reset_index(drop=True)
        self.imgs = self.df["image"].tolist()
        self.captions = self.df["caption"].tolist()
        # cache entries are keyed by image NAME, so they stay valid
        return self

    def _decode_image(self, index: int) -> np.ndarray:
        img_path = os.path.join(self.root_dir, "Images", str(self.imgs[index]))
        try:
            img = Image.open(img_path).convert("RGB")
        except (FileNotFoundError, OSError):
            img = Image.new("RGB", (self.image_size, self.image_size), color="black")
        if img.size != (self.image_size, self.image_size):
            img = img.resize((self.image_size, self.image_size), Image.BILINEAR)
        return np.asarray(img, dtype=np.uint8)

    def load_image(self, index: int) -> np.ndarray:
        """uint8 (H, W, 3) at ``image_size`` — black placeholder if missing
        (data_loader.py:73-78).  Decoded results are cached in RAM up to the
        byte budget (first epoch pays the decode; later epochs are memcpy).
        Cache keyed by image NAME: Flickr-style CSVs repeat each image for
        every caption row, and one decode must serve all of them."""
        name = str(self.imgs[index])
        cached = self._cache.get(name)
        if cached is not None:
            return cached
        arr = self._decode_image(index)
        if self._cache_budget:
            # budget check under the lock: decode-pool threads racing past
            # an unlocked check could each insert and overshoot the budget
            with self._cache_lock:
                if (name not in self._cache
                        and self._cache_bytes + arr.nbytes
                        <= self._cache_budget):
                    arr.setflags(write=False)  # shared across batches
                    self._cache[name] = arr
                    self._cache_bytes += arr.nbytes
        return arr

    def cached_batch(self, indices) -> Optional[np.ndarray]:
        """Stacked uint8 (B, S, S, 3) when EVERY index is a cache hit, else
        None — the loader's fast path (pure memcpy, no decode pool)."""
        out = []
        for i in indices:
            arr = self._cache.get(str(self.imgs[int(i)]))
            if arr is None:
                return None
            out.append(arr)
        return np.stack(out)

    def encode_caption(self, index: int) -> List[int]:
        return self.vocab.encode_caption(self.captions[index])

    def __getitem__(self, index: int) -> Tuple[np.ndarray, List[int]]:
        return self.load_image(index), self.encode_caption(index)
