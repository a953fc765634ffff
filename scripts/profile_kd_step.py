#!/usr/bin/env python
"""Component-wise timing of the joint KD train step on the real chip.

Decides where training-path kernel/fusion work pays off (SURVEY §7 step 8):
teacher ViT forward, student encoder fwd, full student fwd, full fwd+bwd,
decoder-only fwd+bwd, and the complete KD step.  Honest methodology per
core/timing.py (distinct inputs, output-fetch sync, median marginal).

Usage: python scripts/profile_kd_step.py [--batch 16]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=24)
    ap.add_argument("--decoder-impl", default="pallas",
                    choices=["scan", "pallas"],
                    help="decoder recurrence for the KD step + decoder-only "
                         "measurements (pallas = fused fwd + reverse-time "
                         "Pallas bwd on TPU)")
    ap.add_argument("--out", default=None,
                    help="write the results JSON here too")
    args = ap.parse_args()

    from imagecaptioner_tpu.core.runtime import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecaptioner_tpu.core import timing
    from imagecaptioner_tpu.core.config import (
        DistillConfig, KDTrainConfig, TeacherConfig, full_student_config)
    from imagecaptioner_tpu.distill.projector import create_feature_projectors
    from imagecaptioner_tpu.models import student as SM
    from imagecaptioner_tpu.models import teacher as TM
    from imagecaptioner_tpu.train import optim as O, steps

    B, T = args.batch, args.seq
    V = 2994
    t_cfg = TeacherConfig(vocab_size=V)
    s_cfg = full_student_config(V, decoder_impl=args.decoder_impl)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    teacher_params = TM.teacher_init(k1, t_cfg)
    s_params, s_state = SM.student_init(k2, s_cfg)
    projectors, _ = create_feature_projectors(
        k3, teacher_embed=512, student_embed=256, student_hidden=512,
        student_seq_len=49, teacher_seq_len=197)
    dt = jnp.bfloat16

    def mk_img(i):
        return jax.random.normal(jax.random.PRNGKey(i), (B, 3, 224, 224), dt)

    def mk_pair(i):
        img = mk_img(i)
        caps = jax.random.randint(jax.random.PRNGKey(100000 + i), (T, B),
                                  1, V)
        return (img, caps)

    results = {}

    def measure(name, fn, mk, flops_item=None, items=1.0):
        stats = timing.steady_state(fn, mk, n_small=3, n_large=9, pairs=3)
        g = timing.guarded_rate(stats, items_per_call=items,
                                flops_per_item=flops_item)
        per_call = items / g["items_per_sec"]
        results[name] = {"per_call_ms": per_call * 1e3,
                         "estimator": g["estimator"]}
        print(f"{name:28s} {per_call * 1e3:8.2f} ms/call "
              f"({g['estimator']})", flush=True)

    # -- teacher forward (ViT-S 197 tokens + 4-layer decoder) ----------------
    @jax.jit
    def teacher_fwd(pair):
        img, caps = pair
        logits = TM.teacher_apply(teacher_params, img, caps, t_cfg)
        return logits[0, 0, 0]

    # -- teacher ViT encode only ---------------------------------------------
    @jax.jit
    def teacher_encode(img):
        return TM.encode_image(teacher_params, img, t_cfg)[0, 0, 0]

    from imagecaptioner_tpu.models import lstm as L

    # -- student encoder (ResNet-50 + refinement) ----------------------------
    @jax.jit
    def student_encode(img):
        raw, refined, _ = SM.encode_image(s_params, s_state, img, s_cfg,
                                          train=True,
                                          rng=jax.random.PRNGKey(0))
        return refined[0, 0, 0]

    # -- full student forward -------------------------------------------------
    @jax.jit
    def student_fwd(pair):
        img, caps = pair
        (logits, feats, hiddens, attns), _ = SM.student_apply(
            s_params, s_state, img, caps, s_cfg, train=True,
            rng=jax.random.PRNGKey(0))
        return logits[0, 0, 0]

    # -- full student fwd+bwd --------------------------------------------------
    def _loss(p, pair):
        img, caps = pair
        (logits, feats, hiddens, attns), _ = SM.student_apply(
            p, s_state, img, caps, s_cfg, train=True,
            rng=jax.random.PRNGKey(0))
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    grad_fn = jax.jit(jax.grad(_loss))

    @jax.jit
    def student_fwdbwd(pair):
        g = grad_fn(s_params, pair)
        return jax.tree.leaves(g)[0].ravel()[0]

    # -- decoder-only fwd+bwd (fixed features) --------------------------------
    feats0 = jnp.zeros((B, 49, s_cfg.embed_size), dt)

    def _dec_apply(p, feats, caps):
        if args.decoder_impl == "pallas":
            from imagecaptioner_tpu.ops.pallas_lstm import (
                pallas_full_decoder_scan_train)

            return pallas_full_decoder_scan_train(
                p["decoder"], feats, caps, s_cfg, train=True,
                rng=jax.random.PRNGKey(0))
        return L.full_decoder_apply(p["decoder"], feats, caps, s_cfg,
                                    train=True, rng=jax.random.PRNGKey(0))

    def _dec_loss(p, pair):
        img, caps = pair
        logits, h, a = _dec_apply(p, feats0 + img[0, 0, 0, 0], caps)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    dec_grad = jax.jit(jax.grad(_dec_loss))

    @jax.jit
    def decoder_fwdbwd(pair):
        g = dec_grad(s_params, pair)
        return jax.tree.leaves(g)[0].ravel()[0]

    # -- complete KD step ------------------------------------------------------
    tr = KDTrainConfig(batch_size=B, accumulation_steps=1)
    step = steps.make_kd_train_step(t_cfg, s_cfg, DistillConfig(), tr,
                                    compute_dtype=dt)
    # the step donates its TrainState — give it COPIES so the component
    # measurements below can still close over the original s_params
    params = jax.tree.map(jnp.copy,
                          {"student": s_params, "projectors": projectors})
    state = steps.TrainState(params, O.adamw_init(params),
                             jax.tree.map(jnp.copy, s_state))

    def kd_batch(i):
        rng = np.random.default_rng(i)
        return {
            "images": rng.integers(0, 255, (1, B, 224, 224, 3),
                                   dtype=np.uint8),
            "captions": rng.integers(1, V, (1, T, B)).astype(np.int32),
            "lengths": np.full((1, B), T, np.int32),
        }

    # state is donated, so time a sequentially-dependent chain (final-loss
    # fetch is a true sync; every batch distinct)
    import time as _time

    state, m = step(state, teacher_params, kd_batch(0), jnp.float32(1e-4),
                    jnp.int32(0), jax.random.PRNGKey(3))
    _ = jax.device_get(m["total_loss"])  # compile+warmup
    batches = [kd_batch(1 + i) for i in range(8)]
    t0 = _time.perf_counter()
    for i, b in enumerate(batches):
        state, m = step(state, teacher_params, b, jnp.float32(1e-4),
                        jnp.int32(i), jax.random.fold_in(jax.random.PRNGKey(4), i))
    _ = jax.device_get(m["total_loss"])
    per = (_time.perf_counter() - t0) / len(batches)
    results["kd_train_step_total"] = {"per_call_ms": per * 1e3,
                                      "estimator": "sequential_chain"}
    print(f"{'kd_train_step_total':28s} {per * 1e3:8.2f} ms/call "
          f"(sequential_chain)", flush=True)

    # -- optimizer update alone (per-leaf AdamW over student+projectors) -----
    opt_params = jax.tree.map(jnp.copy,
                              {"student": s_params, "projectors": projectors})
    opt_state0 = O.adamw_init(opt_params)

    @jax.jit
    def opt_update(seed):
        # distinct pseudo-grads per call (relay dedupes identical calls)
        grads = jax.tree.map(
            lambda p: (p * 0 + seed).astype(p.dtype), opt_params)
        new_p, _ = O.adamw_update(grads, opt_state0, opt_params,
                                  lr=jnp.float32(1e-4))
        return jax.tree.leaves(new_p)[0].ravel()[0]

    def mk_seed(i):
        return jnp.float32(i) * 1e-6

    measure("optimizer_update_only", opt_update, mk_seed)

    # same, but with the KD step's real trainable mask (frozen-backbone
    # leaves compile to identity — the production cost)
    kd_mask = {"student": SM.student_trainable_mask(s_params, s_cfg),
               "projectors": jax.tree.map(lambda _: True, projectors)}

    @jax.jit
    def opt_update_masked(seed):
        grads = jax.tree.map(
            lambda p: (p * 0 + seed).astype(p.dtype), opt_params)
        new_p, _ = O.adamw_update(grads, opt_state0, opt_params,
                                  lr=jnp.float32(1e-4), trainable=kd_mask)
        return jax.tree.leaves(new_p)[0].ravel()[0]

    measure("optimizer_update_kd_mask", opt_update_masked, mk_seed)

    # -- KD losses alone (KL/feature/hidden over (T,B,V) logits) -------------
    from imagecaptioner_tpu.distill import losses as DL
    d_cfg = DistillConfig()

    @jax.jit
    def kd_losses(pair):
        img, caps = pair
        s_log = (jnp.zeros((T, B, V), jnp.float32)
                 + img[0, 0, 0, 0].astype(jnp.float32))
        t_log = s_log * 0.99
        proj_f = jnp.zeros((B, 49, 512), jnp.float32) + img[0, 0, 1, 0]
        t_feat = jnp.zeros((B, 49, 512), jnp.float32) + img[0, 0, 2, 0]
        total, parts = DL.distillation_loss(
            {"logits": s_log, "encoder_features": proj_f},
            {"logits": t_log, "encoder_features": t_feat},
            caps, d_cfg, lengths=jnp.full((B,), T, jnp.int32))
        return total

    measure("kd_losses_only", kd_losses, mk_pair)

    measure("teacher_vit_encode", teacher_encode, mk_img, 4.6e9, B)
    measure("teacher_forward_full", teacher_fwd, mk_pair, 4.6e9, B)
    measure("student_encode", student_encode, mk_img, 4.1e9, B)
    measure("student_forward_full", student_fwd, mk_pair, 4.1e9, B)
    measure("student_fwd_bwd", student_fwdbwd, mk_pair, 1.23e10, B)
    measure("decoder_only_fwd_bwd", decoder_fwdbwd, mk_pair, None, B)

    results["_config"] = {"batch": B, "seq": T,
                          "decoder_impl": args.decoder_impl}
    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
