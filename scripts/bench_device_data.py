#!/usr/bin/env python
"""A/B: KD training epoch wall time, host loader vs device-resident dataset.

Production shapes (512/8/4 teacher, full student, 256 images x 2 captions
at 224px, batch 16, accum 2 -> 16 optimizer steps/epoch) on the real chip.
The teacher is randomly initialized — epoch cost does not depend on the
weights.

Method: each mode trains 1 epoch (t1, includes compile + first-epoch
decode/upload) and then ``1 + WARM`` epochs (t2); warm s/epoch =
(t2 - t1) / WARM.  Validation is pushed out of range so the number is the
train loop alone.  Writes benchmarks/device_data_bench.json.

Usage: python scripts/bench_device_data.py [--warm 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--warm", type=int, default=3)
    ap.add_argument("--workdir", default="/tmp/ic_devdata_bench")
    ap.add_argument("--stream-steps", type=int, default=8)
    args = ap.parse_args()

    from imagecaptioner_tpu.core.runtime import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecaptioner_tpu.core.config import KDTrainConfig, TeacherConfig
    from imagecaptioner_tpu.data.dataset import CaptionDataset
    from imagecaptioner_tpu.data.synthetic import make_synthetic_dataset
    from imagecaptioner_tpu.models import teacher as TM
    from imagecaptioner_tpu.train.train_student_kd import train_student_with_kd
    from imagecaptioner_tpu.utils import checkpoint as CKPT

    data = os.path.join(args.workdir, "data")
    if not os.path.exists(os.path.join(data, "captions_clean.csv")):
        os.makedirs(data, exist_ok=True)
        make_synthetic_dataset(data, n_images=256, captions_per_image=2,
                               image_size=224, seed=0)

    ds = CaptionDataset(data, os.path.join(data, "captions_clean.csv"),
                        freq_threshold=1)
    vocab_size = len(ds.vocab)
    t_cfg = TeacherConfig(vocab_size=vocab_size)  # production 512/8/4
    tpath = os.path.join(args.workdir, "teacher.npz")
    if not os.path.exists(tpath):
        params = TM.teacher_init(jax.random.PRNGKey(0), t_cfg)
        CKPT.save_checkpoint(tpath, dict(
            model_state_dict=dict(params=params), vocab_size=vocab_size,
            model_config={}))

    def run(mode: str, epochs: int) -> float:
        kw = dict(
            data_root=data,
            teacher_checkpoint=tpath,
            output_dir=os.path.join(args.workdir, f"out_{mode}"),
            train_cfg=KDTrainConfig(batch_size=16, accumulation_steps=2,
                                    num_epochs=epochs, validate_every=10**6,
                                    patience=10**6),
            compute_dtype=jnp.bfloat16,
            data_parallel=False,
            device_dataset=(mode == "device"),
            stream_steps=args.stream_steps,
            seed=0, verbose=False)
        t0 = time.perf_counter()
        train_student_with_kd(**kw)
        return time.perf_counter() - t0

    out = {"config": {"images": 256, "captions_per_image": 2,
                      "batch": 16, "accum": 2, "steps_per_epoch": 16,
                      "stream_steps": args.stream_steps,
                      "warm_epochs": args.warm}}

    # -- end-to-end runs (includes decode, upload, preflight, epoch-0 val;
    #    the subtraction carries the relay's run-to-run upload variance) ---
    for mode in ("host", "device"):
        run(mode, 1)  # discarded: pays the tunnel jit compiles
        t1 = run(mode, 1)
        t2 = run(mode, 1 + args.warm)
        warm = (t2 - t1) / args.warm
        out[mode] = {"first_total_s": t1, "plusN_total_s": t2,
                     "run_subtraction_s_per_epoch": warm}
        print(f"{mode}: 1-epoch run {t1:.1f}s, {1+args.warm}-epoch run "
              f"{t2:.1f}s -> subtraction {warm:.2f} s/epoch", flush=True)

    # -- steady state: direct warm-epoch timing in one process ------------
    # (what a long training run actually sustains; the subtraction above
    # cannot resolve sub-second epochs under multi-second upload variance)
    from imagecaptioner_tpu.core.config import DistillConfig, full_student_config
    from imagecaptioner_tpu.data.device_cache import DeviceDataset
    from imagecaptioner_tpu.data.loader import get_loader
    from imagecaptioner_tpu.distill.projector import create_feature_projectors
    from imagecaptioner_tpu.models import student as SM
    from imagecaptioner_tpu.train import common, optim as O, steps

    tr = KDTrainConfig(batch_size=16, accumulation_steps=2)
    s_cfg = full_student_config(
        vocab_size, decoder_impl="pallas"
        if jax.default_backend() == "tpu" else "scan")
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    s_params, s_state = SM.student_init(k1, s_cfg)
    projectors, _ = create_feature_projectors(
        k2, teacher_embed=512, student_embed=256, student_hidden=512,
        student_seq_len=49, teacher_seq_len=197)
    t_params = jax.tree.map(jnp.asarray, CKPT.load_checkpoint(
        tpath)["model_state_dict"]["params"])
    train_step = steps.make_kd_train_step(t_cfg, s_cfg, DistillConfig(), tr,
                                          compute_dtype=jnp.bfloat16)

    def fresh_state():
        p = {"student": jax.tree.map(jnp.copy, s_params),
             "projectors": jax.tree.map(jnp.copy, projectors)}
        return steps.TrainState(p, O.adamw_init(p),
                                jax.tree.map(jnp.copy, s_state))

    def host_epoch(state, loader, epoch, key):
        ms = []
        for i, stacked in enumerate(common.stacked_batches(loader, 2)):
            key, kk = jax.random.split(key)
            state, m = train_step(state, t_params, stacked,
                                  jnp.float32(epoch + i / 16.0),
                                  jnp.int32(epoch), kk)
            ms.append(m)
        jax.device_get(ms)
        return state, key

    def device_epoch(state, dd, dd_step, epoch, key):
        idx_all = dd.epoch_indices(batch_size=16, accumulation_steps=2)
        ms = []
        s = 0
        while s + args.stream_steps <= idx_all.shape[0]:
            key, kk = jax.random.split(key)
            state, m = dd_step(state, t_params, dd.arrays,
                               jnp.asarray(idx_all[s:s + args.stream_steps]),
                               jnp.float32(epoch), jnp.float32(1 / 16.0),
                               jnp.int32(epoch), kk)
            ms.append(m)
            s += args.stream_steps
        jax.device_get(ms)
        return state, key

    key = jax.random.PRNGKey(1)
    loader, _ = get_loader(data, os.path.join(data, "captions_clean.csv"),
                           batch_size=16, vocab=ds.vocab)
    state = fresh_state()
    state, key = host_epoch(state, loader, 0, key)   # warm: compile + decode
    times = []
    for e in range(1, 1 + args.warm):
        t0 = time.perf_counter()
        state, key = host_epoch(state, loader, e, key)
        times.append(time.perf_counter() - t0)
    host_ss = float(np.median(times))
    out["host"]["steady_s_per_epoch"] = host_ss
    out["host"]["steady_images_per_sec"] = 512.0 / host_ss
    print(f"host steady state: {host_ss:.2f} s/epoch "
          f"({512/host_ss:,.0f} img/s) raw={['%.2f' % t for t in times]}")

    dd = DeviceDataset(ds, max_caption_len=48)
    dd.seed(1)
    dd_step = steps.make_device_data_step(train_step, args.stream_steps)
    state = fresh_state()
    state, key = device_epoch(state, dd, dd_step, 0, key)  # warm
    times = []
    for e in range(1, 1 + args.warm):
        t0 = time.perf_counter()
        state, key = device_epoch(state, dd, dd_step, e, key)
        times.append(time.perf_counter() - t0)
    dev_ss = float(np.median(times))
    out["device"]["steady_s_per_epoch"] = dev_ss
    out["device"]["steady_images_per_sec"] = 512.0 / dev_ss
    print(f"device steady state: {dev_ss:.2f} s/epoch "
          f"({512/dev_ss:,.0f} img/s) raw={['%.2f' % t for t in times]}")

    out["speedup_steady"] = host_ss / dev_ss
    print(f"device-resident steady-state speedup: "
          f"{out['speedup_steady']:.2f}x")

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "device_data_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
