"""Static-shape batch loader with async host prefetch.

Replaces the torch DataLoader worker pool (SURVEY §2.9 N8).  Every batch has
identical shapes — images uint8 (B, S, S, 3) NHWC, captions int32
(max_caption_len, B) time-major, lengths int32 (B,) — so the jitted train
step never recompiles.  Reference semantics preserved:

  * silent batch-size cap at 16 (data_loader.py:117-121)
  * drop_last=True
  * captions padded with <PAD>=0, time-major (T, B) (data_loader.py:90-99)

``lengths`` carries each caption's true length (incl. <START>/<END>) so the
losses can reproduce the reference's *dynamic-length* normalizers (its KL
batchmean divides by batch_max_len * B) without dynamic shapes.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from imagecaptioner_tpu.data.dataset import CaptionDataset
from imagecaptioner_tpu.data.vocabulary import PAD


class BatchLoader:
    def __init__(
        self,
        dataset: CaptionDataset,
        *,
        batch_size: int = 32,
        max_caption_len: int = 48,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        batch_size_cap: Optional[int] = 16,
        prefetch: int = 2,
        num_workers: int = 8,
    ):
        self.dataset = dataset
        bs = min(batch_size, len(dataset))
        if batch_size_cap is not None and bs > batch_size_cap:
            bs = batch_size_cap  # reference's silent cap (data_loader.py:120-121)
        self.batch_size = bs
        self.max_caption_len = max_caption_len
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        # PIL decode releases the GIL, so a thread pool parallelizes image
        # loading like the reference's 4-8 DataLoader workers (N8) without
        # process-spawn overhead.
        self.num_workers = max(1, num_workers)
        self._pool = None
        self._rng = np.random.default_rng(seed)
        self._epoch_tokens_cache: Optional[list] = None

    def _decode_pool(self):
        if self._pool is None and self.num_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=self.num_workers,
                thread_name_prefix="ic-decode")
        return self._pool

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _encode_all(self) -> list:
        if self._epoch_tokens_cache is None:
            self._epoch_tokens_cache = [
                self.dataset.encode_caption(i) for i in range(len(self.dataset))]
        return self._epoch_tokens_cache

    def _make_batch(self, idxs: np.ndarray) -> Dict[str, np.ndarray]:
        tokens = self._encode_all()
        b = len(idxs)
        # warm path: epoch 2+ serves decoded uint8 straight from the
        # dataset's RAM cache — one memcpy, no pool round-trip
        imgs = self.dataset.cached_batch(idxs)
        if imgs is None:
            pool = self._decode_pool()
            if pool is not None:
                imgs = np.stack(list(pool.map(self.dataset.load_image,
                                              (int(i) for i in idxs))))
            else:
                imgs = np.stack([self.dataset.load_image(int(i))
                                 for i in idxs])
        caps = np.full((self.max_caption_len, b), PAD, dtype=np.int32)
        lengths = np.zeros((b,), dtype=np.int32)
        for j, i in enumerate(idxs):
            t = tokens[int(i)][: self.max_caption_len]
            caps[: len(t), j] = t
            lengths[j] = len(t)
        return {"images": imgs, "captions": caps, "lengths": lengths}

    def _index_batches(self) -> Iterator[np.ndarray]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        n_full = len(order) // self.batch_size
        for k in range(n_full):
            yield order[k * self.batch_size:(k + 1) * self.batch_size]
        if not self.drop_last and len(order) % self.batch_size:
            yield order[n_full * self.batch_size:]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        """Background-thread prefetch so host decode overlaps device compute.

        Abandoning the iterator early (e.g. the reference's 50-batch
        validation cap) must not leave the producer blocked on a full queue —
        the finally block signals it to exit, so no thread or buffered-batch
        build-up across epochs."""
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for idxs in self._index_batches():
                    if not put_or_stop(self._make_batch(idxs)):
                        return
            finally:
                put_or_stop(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            stop.set()


def device_prefetch(iterator, *, mesh=None, size: int = 2):
    """Double-buffer batches onto the device(s) ahead of consumption so host
    decode + H2D transfer overlap device compute (grain-style; SURVEY §2.9 N8).

    With a mesh, images/lengths shard over ``data`` and captions shard
    time-major; otherwise plain ``device_put``.
    """
    import collections

    import jax

    from imagecaptioner_tpu.core import mesh as MS

    def put(batch):
        if mesh is None:
            return jax.tree.map(jax.device_put, batch)
        out = dict(batch)
        ndim_im = batch["images"].ndim
        out["images"] = jax.device_put(
            batch["images"],
            MS.data_sharding(mesh, ndim_im) if ndim_im <= 4 else None)
        out["captions"] = MS.shard_time_major(mesh, batch["captions"])
        out["lengths"] = MS.shard_batch(mesh, batch["lengths"])
        return out

    buf = collections.deque()
    it = iter(iterator)
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out


def get_loader(
    root_folder: str,
    annotation_file: str = "data/flickr8k/captions_clean.csv",
    *,
    batch_size: int = 32,
    max_caption_len: int = 48,
    shuffle: bool = True,
    image_size: int = 224,
    freq_threshold: int = 5,
    seed: int = 0,
    vocab=None,
    host_shard: bool = False,
) -> Tuple[BatchLoader, CaptionDataset]:
    """Reference-compatible entry point (data_loader.py:102-125).

    ``host_shard=True``: in a multi-process run, narrow this host's dataset
    to its shard AFTER vocab construction (token ids must agree across
    hosts) — the train-loader setting for multi-host DP."""
    dataset = CaptionDataset(
        root_folder, annotation_file, freq_threshold=freq_threshold,
        image_size=image_size, vocab=vocab)
    if host_shard:
        import jax

        if jax.process_count() > 1:
            from imagecaptioner_tpu.parallel import multihost as MH

            dataset.select(MH.host_shard(len(dataset)))
    loader = BatchLoader(
        dataset, batch_size=batch_size, max_caption_len=max_caption_len,
        shuffle=shuffle, seed=seed)
    return loader, dataset
