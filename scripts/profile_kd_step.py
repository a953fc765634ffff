#!/usr/bin/env python
"""Component-wise timing of the joint KD train step on the real chip.

Decides where training-path kernel/fusion work pays off (SURVEY §7 step 8):
teacher ViT forward, student encoder fwd, full student fwd, full fwd+bwd,
decoder-only fwd+bwd, and the complete KD step.  Honest methodology per
core/timing.py (distinct inputs, output-fetch sync, median marginal), with
every component streamed x8 per dispatch (lax.map; the KD step via a
donation-safe lax.scan chain) so the relay's 20-130 ms dispatch floor
amortizes out of the ~1-10 ms component estimates.

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

    # Relay-health bookends: the shared relay's load drifts minute-to-minute
    # (observed 2-6x), and a profile whose components were measured under
    # different load disagrees with itself.  Record calibration before and
    # after so the JSON carries its own validity evidence.
    calib_before = timing.relay_calibration()
    print(f"relay calibration (before): {calib_before:.1f} ms/pair "
          f"(calm ~{timing.CALIBRATION_CALM_MS_PER_PAIR})", flush=True)

    # Each component is tiny (1-5 ms) next to this relay's 20-130 ms
    # per-dispatch floor, so single-call marginal estimates carry +-2 ms of
    # dispatch noise (observed run-to-run: student_encode "costing" more
    # than the full forward).  Stream STREAM_K inner calls per dispatch via
    # lax.map — same treatment as bench.py / run_all.py serving numbers —
    # so the floor amortizes and the marginal estimator sees device rate.
    STREAM_K = 8

    def measure(name, fn, mk, flops_item=None, items=1.0):
        streamed = jax.jit(lambda stk: jax.lax.map(fn, stk))

        def mk_stream(i):
            xs = [mk(i * STREAM_K + j) for j in range(STREAM_K)]
            return jax.tree.map(lambda *ls: jnp.stack(ls), *xs)

        stats = timing.steady_state(streamed, mk_stream,
                                    n_small=3, n_large=9, pairs=3)
        g = timing.guarded_rate(stats, items_per_call=items * STREAM_K,
                                flops_per_item=flops_item)
        per_call = items / g["items_per_sec"]
        results[name] = {"per_call_ms": per_call * 1e3,
                         "estimator": f"median_marginal_streamed{STREAM_K}"}
        print(f"{name:28s} {per_call * 1e3:8.2f} ms/call "
              f"(streamed x{STREAM_K}, {g['estimator']})", flush=True)

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

    # -- student fwd+bwd under the PRODUCTION trainable mask ------------------
    # The KD step zeroes frozen-backbone grads before any use, so XLA
    # dead-code-eliminates the ResNet backward from the compiled step; the
    # full-tree probe above differentiates everything and measures MORE work
    # than the step contains.  This probe applies the same mask inside the
    # jit so DCE matches production.
    kd_trainable = SM.student_trainable_mask(s_params, s_cfg)

    @jax.jit
    def student_fwdbwd_masked(pair):
        g = jax.grad(_loss)(s_params, pair)
        g = jax.tree.map(lambda gr, t: gr if t else jnp.zeros_like(gr),
                         g, kd_trainable)
        return sum(jnp.sum(l) for l in jax.tree.leaves(g))

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

    # state is donated, so chain K sequentially-dependent steps inside ONE
    # dispatch (lax.scan over stacked distinct batches) — the same
    # device-rate methodology as run_all.py's `run_impl_streamed`; a
    # per-dispatch python loop would measure the relay's 20-130 ms floor,
    # not the ~10 ms step.
    import functools
    import time as _time

    K_STEPS, N_CALLS = 8, 4

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_chain(st, stacked, rngs):
        def body(carry, xs):
            b, r = xs
            carry, m = step(carry, teacher_params, b, jnp.float32(1e-4),
                            jnp.int32(0), r)
            return carry, m["total_loss"]
        st, losses = jax.lax.scan(body, st, (stacked, rngs))
        return st, losses[-1]

    def stacked_batches(seed):
        r = np.random.default_rng(seed)
        return jax.device_put({
            "images": r.integers(0, 255, (K_STEPS, 1, B, 224, 224, 3),
                                 dtype=np.uint8),
            "captions": r.integers(1, V, (K_STEPS, 1, T, B)).astype(np.int32),
            "lengths": np.full((K_STEPS, 1, B), T, np.int32),
        })

    calls = [(stacked_batches(100 + i),
              jax.random.split(jax.random.PRNGKey(200 + i), K_STEPS))
             for i in range(N_CALLS + 1)]
    jax.block_until_ready(calls)
    state, loss = step_chain(state, *calls[0])
    _ = jax.device_get(loss)  # compile+warmup
    t0 = _time.perf_counter()
    for c in calls[1:]:
        state, loss = step_chain(state, *c)
    _ = jax.device_get(loss)
    per = (_time.perf_counter() - t0) / (N_CALLS * K_STEPS)
    results["kd_train_step_total"] = {
        "per_call_ms": per * 1e3,
        "estimator": f"scan_chain_streamed{K_STEPS}"}
    print(f"{'kd_train_step_total':28s} {per * 1e3:8.2f} ms/call "
          f"(scan_chain_streamed{K_STEPS})", flush=True)

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
    measure("student_fwd_bwd_kd_mask", student_fwdbwd_masked, mk_pair,
            None, B)
    measure("decoder_only_fwd_bwd", decoder_fwdbwd, mk_pair, None, B)

    calib_after = timing.relay_calibration()
    print(f"relay calibration (after): {calib_after:.1f} ms/pair", flush=True)
    results["_relay_calibration"] = {
        "before_ms_per_pair": calib_before,
        "after_ms_per_pair": calib_after,
        "calm_ms_per_pair": timing.CALIBRATION_CALM_MS_PER_PAIR,
    }
    results["_note"] = (
        "kd_train_step_total (scan-chained, one dispatch per 8 steps) is "
        "stable run-to-run; the per-COMPONENT entries retain ~2x "
        "multiplicative noise from relay micro-bursts even when the "
        "calibration bookends read calm — trust their ordering and "
        "magnitude, not their second digit.  A freshly-compiled entry's "
        "first measurement can read high (tunnel spin-up); re-run with the "
        "compile cache warm before recording.")
    results["_config"] = {"batch": B, "seq": T,
                          "decoder_impl": args.decoder_impl}
    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
