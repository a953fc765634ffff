"""Device-resident dataset: decode once, upload once, batch in-graph.

Motivation (measured on this rig, generalizes to any TPU host): the KD
training step is ~5 ms of device time, but feeding it through a host
loader pays host->device upload for every batch every epoch plus one
dispatch per step.  Training re-reads the same images for tens to
hundreds of epochs — Flickr8k at 224px is only ~1.2 GB of uint8 — so the
TPU-native layout is the whole dataset resident in HBM: images are
uploaded ONCE, and each train step gathers its batch rows ON DEVICE from
an index array (a few hundred bytes of host traffic per step).  With
``chain_steps`` > 1 the trainers scan several steps inside one dispatch,
so an epoch compiles down to a handful of dispatches.

The reference's input pipeline (torch DataLoader workers feeding GPU
copies per step, reference src/data_loader.py:102-125) has no analogue of
this; augmentation stays on device either way (data/transforms.py).

Batch semantics are identical to data/loader.BatchLoader: the silent
batch-size cap of 16 (reference quirk), shuffle order from the same
seeded generator contract, drop_last, PAD-padded (T, B) captions with
lengths.  Equivalence is test-enforced (tests/test_device_cache.py).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from imagecaptioner_tpu.data.dataset import CaptionDataset
from imagecaptioner_tpu.data.vocabulary import PAD

__all__ = ["DeviceDataset", "gather_batch"]


def _default_budget() -> int:
    return int(os.environ.get("IC_DEVICE_DATASET_BYTES", 4 << 30))


class DeviceDataset:
    """Uploads a whole :class:`CaptionDataset` to device HBM.

    ``arrays`` (pass these as jit ARGUMENTS, never close over them — a
    captured array is embedded into the compiled program as a constant):

    - ``images``   (N, H, W, 3) uint8
    - ``captions`` (N, T) int32, PAD-padded
    - ``lengths``  (N,) int32

    With a ``mesh`` the rows are placed REPLICATED over it: each device
    gathers the full global batch in-graph and the train step's sharding
    constraints (gather_batch ``mesh`` arg) slice its data-parallel shard —
    batch composition stays bit-identical to the single-device and host
    loaders under any device count.  Replication is deliberate: the row
    gather is random-access over the whole epoch, and these datasets are
    small (budget-gated — Flickr8k at 224px is ~1.2 GB vs 16 GB of HBM per
    chip).  Row-sharded storage would trade that HBM for an all-gather per
    step.  Single-process only either way; the multi-HOST path is the
    host-sharded BatchLoader (train/common.py).
    """

    def __init__(self, dataset: CaptionDataset, *,
                 max_caption_len: int = 48,
                 byte_budget: Optional[int] = None,
                 num_workers: int = 8, mesh=None):
        import jax

        n = len(dataset)
        h = w = dataset.image_size
        budget = _default_budget() if byte_budget is None else byte_budget
        need = n * h * w * 3 + n * max_caption_len * 4 + n * 4
        if need > budget:
            raise ValueError(
                f"DeviceDataset: {need/2**30:.2f} GiB of rows exceeds the "
                f"{budget/2**30:.2f} GiB budget (IC_DEVICE_DATASET_BYTES); "
                f"use the host BatchLoader for this dataset")

        imgs = np.empty((n, h, w, 3), np.uint8)
        if num_workers > 1 and n > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=num_workers,
                                    thread_name_prefix="ic-devcache") as pool:
                for i, im in enumerate(pool.map(dataset.load_image,
                                                range(n))):
                    imgs[i] = im
        else:
            for i in range(n):
                imgs[i] = dataset.load_image(i)

        caps = np.full((n, max_caption_len), PAD, np.int32)
        lens = np.zeros((n,), np.int32)
        for i in range(n):
            t = dataset.encode_caption(i)[:max_caption_len]
            caps[i, : len(t)] = t
            lens[i] = len(t)

        self.n = n
        self.max_caption_len = max_caption_len
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            put = lambda x: jax.device_put(  # noqa: E731 — replicated
                x, NamedSharding(mesh, PartitionSpec()))
        else:
            put = jax.device_put
        self.arrays: Dict = {
            "images": put(imgs),
            "captions": put(caps),
            "lengths": put(lens),
        }
        self._rng = np.random.default_rng(0)

    def seed(self, seed: int) -> None:
        self._rng = np.random.default_rng(seed)

    def epoch_indices(self, *, batch_size: int, accumulation_steps: int = 1,
                      shuffle: bool = True, drop_last: bool = True,
                      batch_size_cap: Optional[int] = 16) -> np.ndarray:
        """(steps, A, B) int32 row indices for one epoch.

        Same contract as BatchLoader + common.stacked_batches: the
        reference's silent cap of 16 applies, trailing partial batches are
        dropped (drop_last) and trailing incomplete accumulation groups are
        always dropped (the reference only steps the optimizer on
        accumulation boundaries)."""
        if not drop_last:
            raise ValueError("device batching needs uniform shapes — "
                             "drop_last=False is not supported")
        bs = min(batch_size, self.n)
        if batch_size_cap is not None and bs > batch_size_cap:
            bs = batch_size_cap
        order = np.arange(self.n)
        if shuffle:
            self._rng.shuffle(order)
        n_batches = self.n // bs
        a = max(1, accumulation_steps)
        steps = n_batches // a
        if steps == 0:
            return np.zeros((0, a, bs), np.int32)
        used = order[: steps * a * bs]
        return used.reshape(steps, a, bs).astype(np.int32)


def gather_batch(arrays: Dict, idx, mesh=None):
    """In-graph batch assembly: idx (A, B) int32 -> the exact batch dict a
    host BatchLoader stack would have produced ((A,B,H,W,3) uint8 images,
    (A, T, B) captions, (A, B) lengths).

    Rows gather on the LEADING axis — the layout XLA gathers efficiently
    on TPU (a non-leading-axis gather runs row-at-a-time; see
    scripts/bench_beam_ablate.py for the measured pathology).

    With a ``mesh``, the assembled batch is constrained to the same
    shardings the host loader path uses (batch axis over 'data',
    train/common.put_global_batch) so the downstream train step runs data
    parallel; the dataset rows themselves stay replicated."""
    import jax.numpy as jnp

    flat = idx.reshape(-1)
    a, b = idx.shape
    imgs = jnp.take(arrays["images"], flat, axis=0)
    caps = jnp.take(arrays["captions"], flat, axis=0)  # (A*B, T)
    lens = jnp.take(arrays["lengths"], flat, axis=0)
    batch = {
        "images": imgs.reshape((a, b) + imgs.shape[1:]),
        "captions": caps.reshape(a, b, -1).transpose(0, 2, 1),  # (A, T, B)
        "lengths": lens.reshape(a, b),
    }
    if mesh is not None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        cons = lambda x, spec: jax.lax.with_sharding_constraint(  # noqa: E731
            x, NamedSharding(mesh, P(*spec)))
        batch = {
            "images": cons(batch["images"], (None, "data")),
            "captions": cons(batch["captions"], (None, None, "data")),
            "lengths": cons(batch["lengths"], (None, "data")),
        }
    return batch
