#!/usr/bin/env python
"""Host-loader throughput at real-data scale (VERDICT r1 item 9).

The reference feeds training from a torch DataLoader with 4-8 worker
*processes* (src/train_student_kd.py:141, train_student_kd_optimized.py:267).
Our BatchLoader uses a thread pool for PIL decode (threads suffice: PIL
releases the GIL) + a prefetch producer thread.  This script answers the
done-criterion "loader is not the bottleneck of a KD epoch":

  1. synthesizes a Flickr8k-like on-disk dataset (JPEGs ~500x375 + captions
     CSV — Flickr8k is 8,091 images / 5 captions each);
  2. measures steady-state loader throughput (images/s) at several worker
     counts, full decode->resize->batch path included;
  3. compares against the KD train step's consumption rate (16 img/step at
     the benchmarked steps/s — pass --steps-per-sec from
     benchmarks/results.json config #4).

Pure host work: safe to run while the TPU is busy.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORDS = ("a the dog cat man woman child ball park beach runs jumps sits "
         "plays red blue green small large two on in with and is of").split()


def synthesize_dataset(root: str, n_images: int, caps_per_image: int,
                       size=(500, 375)) -> str:
    """Write n_images JPEGs under root/Images plus a captions CSV; returns
    the CSV path."""
    from PIL import Image

    img_dir = os.path.join(root, "Images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    rows = ["image,caption"]
    for i in range(n_images):
        name = f"img_{i:05d}.jpg"
        # low-frequency noise compresses like a photo, not like static
        small = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
        img = Image.fromarray(small).resize(size, Image.BILINEAR)
        img.save(os.path.join(img_dir, name), quality=90)
        for _ in range(caps_per_image):
            cap = " ".join(rng.choice(WORDS, size=rng.integers(6, 12)))
            rows.append(f"{name},{cap}")
    csv_path = os.path.join(root, "captions.csv")
    with open(csv_path, "w") as f:
        f.write("\n".join(rows) + "\n")
    return csv_path


def measure(root: str, csv_path: str, num_workers: int,
            batch_size: int) -> dict:
    from imagecaptioner_tpu.data.dataset import CaptionDataset
    from imagecaptioner_tpu.data.loader import BatchLoader

    ds = CaptionDataset(root, csv_path)
    loader = BatchLoader(ds, batch_size=batch_size, num_workers=num_workers,
                         seed=1)

    def one_pass():
        # FULL epoch, not a truncated one: an early break used to leave the
        # decode cache covering only part of the (shuffled) dataset, so
        # "warm" pass 2 silently paid cold decodes for the rest and
        # under-reported the cache rate by ~20-50x (measured 809 vs 17k+
        # img/s pure-warm).  Dataset size is bounded by --images instead.
        it = iter(loader)
        next(it)  # warm: vocab encode cache + pool spin-up + page cache
        t0 = time.perf_counter()
        n = 0
        for batch in it:
            n += batch["images"].shape[0]
        return n, time.perf_counter() - t0

    # pass 1: libjpeg decode; pass 2: the decoded-uint8 RAM cache serves
    # repeat epochs (KD trains 30-200 epochs over the same images)
    n1, dt1 = one_pass()
    n2, dt2 = one_pass()
    return {"num_workers": num_workers,
            "images_per_sec": n1 / dt1,
            "warm_cache_images_per_sec": n2 / dt2,
            "batches_per_sec": n1 / dt1 / loader.batch_size,
            "images": n1, "seconds": dt1, "warm_seconds": dt2}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=2000)
    ap.add_argument("--caps-per-image", type=int, default=5)
    ap.add_argument("--workers", default="1,4,8")
    ap.add_argument("--steps-per-sec", type=float, default=48.2,
                    help="KD train-step rate to compare against — the "
                         "PRE-STAGED on-device rate (771.6 img/s / 16,"
                         " benchmarks/results.json config #4), not the "
                         "relay-dispatch-bound rate (VERDICT r2 weak #6: "
                         "headroom was measured against the wrong consumer)")
    ap.add_argument("--root", default=None,
                    help="reuse an existing synthesized dataset dir")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.root:
        root, csv_path = args.root, os.path.join(args.root, "captions.csv")
        if not os.path.exists(csv_path):
            csv_path = synthesize_dataset(root, args.images,
                                          args.caps_per_image)
    else:
        root = tempfile.mkdtemp(prefix="ic_loader_bench_")
        print(f"synthesizing {args.images} JPEGs under {root} ...",
              flush=True)
        csv_path = synthesize_dataset(root, args.images, args.caps_per_image)

    results = {"dataset_images": args.images, "sweep": []}
    for w in (int(x) for x in args.workers.split(",")):
        r = measure(root, csv_path, w, batch_size=16)
        results["sweep"].append(r)
        print(f"workers={w}: {r['images_per_sec']:8.1f} img/s "
              f"({r['batches_per_sec']:.2f} batches/s)", flush=True)

    best = max(results["sweep"], key=lambda r: r["images_per_sec"])
    best_warm = max(results["sweep"],
                    key=lambda r: r["warm_cache_images_per_sec"])
    consume = 16.0 * args.steps_per_sec
    results["kd_step_consumption_images_per_sec"] = consume
    results["loader_headroom_x"] = best["images_per_sec"] / consume
    results["warm_cache_headroom_x"] = (
        best_warm["warm_cache_images_per_sec"] / consume)
    results["loader_is_bottleneck"] = (
        best_warm["warm_cache_images_per_sec"] < consume)
    print(f"KD step consumes {consume:.1f} img/s -> cold headroom "
          f"{results['loader_headroom_x']:.2f}x, warm-cache headroom "
          f"{results['warm_cache_headroom_x']:.2f}x "
          f"({'BOTTLENECK' if results['loader_is_bottleneck'] else 'ok'})")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
