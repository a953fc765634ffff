#!/usr/bin/env python
"""The five BASELINE.json benchmark configs as one runner (SURVEY §7 step 10).

  1. compact-student greedy smoke, one 224x224 image, CPU
  2. full-student batch-16 greedy inference (scan + fused-Pallas paths)
  3. teacher beam search with 197-token memory
  4. joint KD train step (a=0.7 KL T=4, b=0.2 feature, g=0.1 hidden, bf16)
  5. short end-to-end KD run on a synthetic Flickr8k-shaped set with
     BLEU/METEOR eval (full 30-epoch runs are a flag away)

Emits benchmarks/results.json: per-config images/sec (or steps/sec), p50
latency.  Timing discipline: distinct inputs per call, device_get sync
(see bench.py).

Usage: python -m benchmarks.run_all [--configs 1,2,3,4,5] [--epochs N]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def _measure(fn, make_input, *, items_per_call=1.0, flops_per_item=None,
             n_small=4, n_large=16, pairs=3):
    """Robust steady-state rate: interleaved small/large pairs with disjoint
    inputs, median marginal, physics guard (core/timing.py — the round-1
    two-point estimator produced impossible >peak numbers)."""
    from imagecaptioner_tpu.core import timing

    stats = timing.steady_state(fn, make_input, n_small=n_small,
                                n_large=n_large, pairs=pairs)
    g = timing.guarded_rate(stats, items_per_call=items_per_call,
                            flops_per_item=flops_per_item)
    g["p50_latency_s"] = items_per_call / g["items_per_sec"]
    return g


def config_1():
    """Compact-student greedy smoke on CPU (one image).

    Runs in a subprocess: forcing jax_platforms=cpu is only possible before
    backend init, and the other configs need the TPU backend in this process.
    """
    import subprocess
    import sys

    from imagecaptioner_tpu.core.runtime import cpu_cache_dir

    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = cpu_cache_dir()
    code = (
        "import jax, json; jax.config.update('jax_platforms', 'cpu'); "
        "from benchmarks.run_all import _config_compact_smoke; "
        "print('RESULT::' + json.dumps(_config_compact_smoke()))"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT::"):
            return json.loads(line[len("RESULT::"):])
    raise RuntimeError(f"config_1 subprocess failed (rc={proc.returncode}):\n"
                       f"{proc.stdout[-2000:]}")


def _config_compact_smoke():
    import jax
    import jax.numpy as jnp

    from imagecaptioner_tpu.core.config import compact_student_config
    from imagecaptioner_tpu.models import student as SM
    from imagecaptioner_tpu.ops import decode as D

    cfg = compact_student_config(2994, embed_size=128, hidden_size=256)
    params, state = SM.student_init(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def caption(img):
        _, refined, _ = SM.encode_image(params, state, img, cfg)
        return D.greedy_decode_student(params, refined, cfg, max_length=20)

    def mk(i):
        return jax.random.normal(jax.random.PRNGKey(i), (1, 3, 224, 224))

    m = _measure(caption, mk, n_small=2, n_large=6, pairs=3)
    return {"name": "compact_student_greedy_smoke_cpu",
            "p50_latency_s": m["p50_latency_s"],
            "images_per_sec": m["items_per_sec"],
            "measurement": m}


def config_2():
    import jax
    import jax.numpy as jnp

    from imagecaptioner_tpu.core import precision as P
    from imagecaptioner_tpu.core.config import full_student_config
    from imagecaptioner_tpu.models import student as SM
    from imagecaptioner_tpu.ops import decode as D

    cfg = full_student_config(2994, dropout=0.0)
    params, state = SM.student_init(jax.random.PRNGKey(0), cfg)
    params = P.bf16_compute(params)
    on_tpu = jax.default_backend() != "cpu"

    def mk(i):
        return jax.random.normal(jax.random.PRNGKey(i), (16, 3, 224, 224),
                                 jnp.bfloat16)

    @jax.jit
    def scan_path(img):
        _, refined, _ = SM.encode_image(params, state, img, cfg)
        return D.greedy_decode_student(params, refined, cfg, max_length=20)

    # ResNet-50 fwd ~4.1 GFLOP/image (encoder only, generous ceiling)
    flops = 4.1e9 if on_tpu else None
    m_scan = _measure(scan_path, mk, items_per_call=16.0,
                      flops_per_item=flops)
    out = {"name": "full_student_batch16_greedy",
           "scan": {"p50_latency_s": m_scan["p50_latency_s"],
                    "images_per_sec": m_scan["items_per_sec"],
                    "measurement": m_scan}}
    if on_tpu:
        from imagecaptioner_tpu.ops.pallas_greedy import (
            pallas_greedy_decode_student)

        @jax.jit
        def pallas_path(img):
            _, refined, _ = SM.encode_image(params, state, img, cfg)
            return pallas_greedy_decode_student(params, refined, cfg,
                                                max_length=20)

        m_p = _measure(pallas_path, mk, items_per_call=16.0,
                       flops_per_item=flops)
        out["pallas"] = {"p50_latency_s": m_p["p50_latency_s"],
                         "images_per_sec": m_p["items_per_sec"],
                         "measurement": m_p}

        # --- serving-style streamed greedy sweep (same treatment as the
        # beam sweep in config_3 and bench.py): K batch-B captioning calls
        # per dispatch via lax.map, through the canonical serving
        # dispatcher (fused kernel + VMEM gate + loud fallback), so the
        # relay's 20-130 ms per-dispatch floor amortizes and the number is
        # sustained serving throughput, not single-dispatch latency. ---
        sweep = {}
        for B in (16, 32, 64):
            Ks = max(1, 256 // B)  # ~256 images per dispatch

            @jax.jit
            def greedy_stream(stacked, _B=B):  # (Ks, B, 3, 224, 224)
                def one(img):
                    _, refined, _ = SM.encode_image(params, state, img, cfg)
                    return D.best_greedy_decode_student(
                        params, refined, cfg, max_length=20)
                return jax.lax.map(one, stacked)

            def mk_s(i, _B=B, _Ks=Ks):
                return jax.random.normal(
                    jax.random.PRNGKey(400000 + 100 * _B + i),
                    (_Ks, _B, 3, 224, 224), jnp.bfloat16)

            mg = _measure(greedy_stream, mk_s,
                          items_per_call=float(B * Ks),
                          flops_per_item=flops, n_small=2, n_large=8)
            sweep[f"B{B}xK{Ks}"] = {
                "images_per_sec": mg["items_per_sec"],
                "p50_latency_s": mg["p50_latency_s"],
                "measurement": mg}
        best = max(sweep.values(), key=lambda d: d["images_per_sec"])
        out["serving_greedy_sweep"] = sweep
        out["serving_greedy_images_per_sec"] = best["images_per_sec"]
    return out


def config_3():
    import jax
    import jax.numpy as jnp

    from imagecaptioner_tpu.core import precision as P
    from imagecaptioner_tpu.core.config import TeacherConfig
    from imagecaptioner_tpu.models import teacher as TM
    from imagecaptioner_tpu.ops import decode as D

    cfg = TeacherConfig(vocab_size=2994)
    params = P.bf16_compute(TM.teacher_init(jax.random.PRNGKey(0), cfg))

    @jax.jit
    def beam(img):
        memory = TM.encode_image(params, img, cfg)
        return D.beam_search_teacher(params, memory, cfg, max_length=20,
                                     beam_size=5)[0]

    def mk(i):
        return jax.random.normal(jax.random.PRNGKey(i), (1, 3, 224, 224),
                                 jnp.bfloat16)

    # ViT-S/16 fwd ~4.6 GFLOP/image (encoder only, generous ceiling)
    m1 = _measure(beam, mk, items_per_call=1.0, flops_per_item=4.6e9,
                  n_small=2, n_large=8)

    # batched (vmapped) beam: 8 images per call
    @jax.jit
    def beam8(imgs):
        memory = TM.encode_image(params, imgs, cfg)
        return D.beam_search_teacher_batched(params, memory, cfg,
                                             max_length=20, beam_size=5)[0]

    def mk8(i):
        return jax.random.normal(jax.random.PRNGKey(i), (8, 3, 224, 224),
                                 jnp.bfloat16)

    m8 = _measure(beam8, mk8, items_per_call=8.0, flops_per_item=4.6e9,
                  n_small=2, n_large=8)

    # Serving-style stream: one dispatch processes K batched-8 beam searches
    # via lax.map, amortizing the relay's per-dispatch floor (measured
    # ~120-130 ms/call regardless of B or even of running the decode loop —
    # benchmarks/beam_diagnosis.json; round-1's "weak batched scaling" was
    # entirely that floor).
    K = 4

    @jax.jit
    def beam_stream(stacked):  # (K, 8, 3, 224, 224)
        def one(imgs):
            memory = TM.encode_image(params, imgs, cfg)
            return D.beam_search_teacher_batched(params, memory, cfg,
                                                 max_length=20, beam_size=5)[0]
        return jax.lax.map(one, stacked)

    def mk_stream(i):
        return jax.random.normal(jax.random.PRNGKey(200000 + i),
                                 (K, 8, 3, 224, 224), jnp.bfloat16)

    ms = _measure(beam_stream, mk_stream, items_per_call=8.0 * K,
                  flops_per_item=4.6e9, n_small=2, n_large=8)

    # --- serving-style PACKED beam sweep (VERDICT r2 #4): the packed beam
    # folds the K beams into the batch dim so each decode step is one
    # MXU-shaped GEMM set instead of K-wide vmapped slivers, and the stream
    # amortizes the relay's per-dispatch floor over Ks batched searches ---
    sweep = {}
    # With the KV-reorder gather replaced by a permutation matmul the packed
    # step is ~0.25 ms at N=8 (benchmarks/beam_ablation.json), so a dispatch
    # must carry ~128 images to amortize the relay's 20-130 ms floor.  The
    # dense permutation's quadratic-in-N cost is gone (block-diagonal
    # reorder), so the sweep extends to N=64 to re-probe large-N scaling.
    for N in (8, 16, 32, 64):
        Ks = max(1, 128 // N)  # ~128 images per dispatch across the sweep

        @jax.jit
        def beam_packed_stream(stacked, _N=N):  # (Ks, N, 3, 224, 224)
            def one(imgs):
                memory = TM.encode_image(params, imgs, cfg)
                return D.beam_search_teacher_packed(
                    params, memory, cfg, max_length=20, beam_size=5)[0]
            return jax.lax.map(one, stacked)

        def mk_packed(i, _N=N, _Ks=Ks):
            return jax.random.normal(
                jax.random.PRNGKey(300000 + 100 * _N + i),
                (_Ks, _N, 3, 224, 224), jnp.bfloat16)

        mp = _measure(beam_packed_stream, mk_packed,
                      items_per_call=float(N * Ks), flops_per_item=4.6e9,
                      n_small=2, n_large=8)
        sweep[f"N{N}xK{Ks}"] = {
            "images_per_sec": mp["items_per_sec"],
            "p50_latency_s": mp["p50_latency_s"],
            "measurement": mp}
    best = max(sweep.values(), key=lambda d: d["images_per_sec"])
    return {"name": "teacher_beam_search_197tok",
            "p50_latency_s": m1["p50_latency_s"],
            "images_per_sec": m1["items_per_sec"],
            "batched8_images_per_sec": m8["items_per_sec"],
            "streamed_batched_images_per_sec": ms["items_per_sec"],
            "serving_beam_sweep": sweep,
            "packed_beam_images_per_sec": best["images_per_sec"],
            "measurement": {"single": m1, "batched8": m8,
                            "streamed": ms}}


def config_4(enhanced_repeats: int = 0):
    """``enhanced_repeats > 0``: skip everything except the enhanced
    scan-vs-pallas STREAMED arms and run each that many times, recording the
    spread next to the margin that decides the decoder default
    (train/common.recorded_decoder_impl; VERDICT r4 weak #7 — the r4 gate
    rested on a single 5.8%% margin on a rig with 2-6x wall variance)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from imagecaptioner_tpu.core.config import (
        DistillConfig, KDTrainConfig, TeacherConfig, full_student_config)
    from imagecaptioner_tpu.distill.projector import create_feature_projectors
    from imagecaptioner_tpu.models import student as SM
    from imagecaptioner_tpu.models import teacher as TM
    from imagecaptioner_tpu.train import optim as O, steps

    from imagecaptioner_tpu.core import timing

    t_cfg = TeacherConfig(vocab_size=2994)
    tr = KDTrainConfig(batch_size=16, accumulation_steps=1)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    teacher_params = TM.teacher_init(k1, t_cfg)
    rng = np.random.default_rng(0)

    def _variant_cfg(variant, decoder_impl):
        from imagecaptioner_tpu.core.config import (compact_student_config,
                                                    enhanced_student_config)

        factory = {"full": full_student_config,
                   "compact": compact_student_config,
                   "enhanced": enhanced_student_config}[variant]
        return factory(2994, decoder_impl=decoder_impl)

    def run_impl(decoder_impl, n_steps=8, variant="full"):
        """On-device step time: batches are PRE-STAGED on device before the
        clock starts — a (1,16,224,224,3) uint8 batch is ~2.4 MB, which
        through this rig's ~9 MB/s relay upload costs ~270 ms/step and would
        bury the compute being compared (a real pipeline overlaps upload via
        device_prefetch).  Steps are sequentially dependent (state threads
        through), so syncing the final loss is a true sync, and every batch
        is distinct data."""
        s_cfg = _variant_cfg(variant, decoder_impl)
        s_params, s_state = SM.student_init(k2, s_cfg)
        projectors, _ = create_feature_projectors(
            k3, teacher_embed=512, student_embed=s_cfg.embed_size,
            student_hidden=s_cfg.hidden_size,
            student_seq_len=s_cfg.feature_tokens, teacher_seq_len=197)
        params = {"student": s_params, "projectors": projectors}
        state = steps.TrainState(params, O.adamw_init(params), s_state)
        step = steps.make_kd_train_step(t_cfg, s_cfg, DistillConfig(), tr,
                                        compute_dtype=jnp.bfloat16)
        batches = [
            jax.device_put({
                "images": rng.integers(0, 255, (1, 16, 224, 224, 3),
                                       dtype=np.uint8),
                "captions": rng.integers(1, 2994, (1, 24, 16)).astype(np.int32),
                "lengths": np.full((1, 16), 24, np.int32),
            })
            for _ in range(n_steps + 1)
        ]
        jax.block_until_ready(batches)
        state, m = step(state, teacher_params, batches[0], jnp.float32(0.0),
                        jnp.int32(0), jax.random.PRNGKey(1))
        _ = jax.device_get(m["total_loss"])  # compile+warmup
        t0 = time.perf_counter()
        for i, b in enumerate(batches[1:]):
            state, m = step(state, teacher_params, b, jnp.float32(i * 1e-3),
                            jnp.int32(0),
                            jax.random.fold_in(jax.random.PRNGKey(2), i))
        _ = jax.device_get(m["total_loss"])
        per = (time.perf_counter() - t0) / (len(batches) - 1)
        return {"p50_latency_s": per, "steps_per_sec": 1.0 / per,
                "images_per_sec": 16.0 / per}

    def run_impl_streamed(decoder_impl, variant="full", k_steps=8,
                          n_calls=4, tr_step=None, batch=16):
        """Device-rate measurement: K sequentially-dependent train steps are
        chained inside ONE dispatch (lax.scan over stacked batches), because
        per-dispatch wall time through this rig's relay is a load-dependent
        20-130 ms floor that buries a ~10 ms step when each step is its own
        dispatch (the per-call numbers above are relay-bound, not
        device-bound).  On a local TPU host dispatch is ~100 us and the
        per-step rate approaches this streamed number."""
        import functools

        s_cfg = _variant_cfg(variant, decoder_impl)
        s_params, s_state = SM.student_init(k2, s_cfg)
        projectors, _ = create_feature_projectors(
            k3, teacher_embed=512, student_embed=s_cfg.embed_size,
            student_hidden=s_cfg.hidden_size,
            student_seq_len=s_cfg.feature_tokens, teacher_seq_len=197)
        params = {"student": s_params, "projectors": projectors}
        state = steps.TrainState(params, O.adamw_init(params), s_state)
        if tr_step is None and batch != 16:
            tr_step = KDTrainConfig(batch_size=batch, accumulation_steps=1)
        step = steps.make_kd_train_step(t_cfg, s_cfg, DistillConfig(),
                                        tr_step or tr,
                                        compute_dtype=jnp.bfloat16)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def chain(st, tp, stacked, rngs, scheds):
            def body(carry, xs):
                b, r, s = xs
                carry, m = step(carry, tp, b, s, jnp.int32(0), r)
                return carry, m["total_loss"]
            st, losses = jax.lax.scan(body, st, (stacked, rngs, scheds))
            return st, losses[-1]

        def stacked_batch(seed):
            r = np.random.default_rng(seed)
            return jax.device_put({
                "images": r.integers(0, 255, (k_steps, 1, batch, 224, 224, 3),
                                     dtype=np.uint8),
                "captions": r.integers(
                    1, 2994, (k_steps, 1, 24, batch)).astype(np.int32),
                "lengths": np.full((k_steps, 1, batch), 24, np.int32),
            })

        calls = [(stacked_batch(100 + i),
                  jax.random.split(jax.random.PRNGKey(200 + i), k_steps),
                  jnp.linspace(1e-4, 2e-4, k_steps))
                 for i in range(n_calls + 1)]
        jax.block_until_ready(calls)
        state, loss = chain(state, teacher_params, *calls[0])
        _ = jax.device_get(loss)  # compile+warmup
        t0 = time.perf_counter()
        for c in calls[1:]:
            state, loss = chain(state, teacher_params, *c)
        _ = jax.device_get(loss)
        per = (time.perf_counter() - t0) / (n_calls * k_steps)
        return {"p50_latency_s": per, "steps_per_sec": 1.0 / per,
                "images_per_sec": batch / per,
                "k_steps_per_dispatch": k_steps, "batch": batch}

    if enhanced_repeats:
        import statistics

        reps = {"pallas": [], "scan": []}
        for i in range(enhanced_repeats):
            for impl in ("pallas", "scan"):  # interleaved: drift hits both
                r = run_impl_streamed(impl, variant="enhanced")
                reps[impl].append(r["images_per_sec"])
                print(f"enhanced {impl} rep {i}: "
                      f"{r['images_per_sec']:,.0f} img/s")
        rec = {"name": "enhanced_decoder_gate_repeats"}
        for impl, xs in reps.items():
            rec[impl + "_img_s"] = xs
            rec[impl + "_mean"] = statistics.mean(xs)
            rec[impl + "_spread_frac"] = ((max(xs) - min(xs))
                                          / statistics.mean(xs))
        rec["winner"] = ("pallas" if rec["pallas_mean"] > rec["scan_mean"]
                         else "scan")
        rec["margin_frac"] = abs(rec["pallas_mean"] - rec["scan_mean"]) / max(
            rec["pallas_mean"], rec["scan_mean"])
        return rec

    out = {"name": "joint_kd_train_step_b16_bf16",
           "physics_max_images_per_sec": timing.physics_max_rate(1.6e10)}
    out["scan"] = run_impl("scan")
    # fused trainable Pallas LSTM decoders (custom VJP) — TPU only
    if jax.default_backend() == "tpu":
        out["pallas"] = run_impl("pallas")
        # the optimized KD trainer's production student (VERDICT r2 #6)
        out["compact_pallas"] = run_impl("pallas", variant="compact")
        out["compact_scan"] = run_impl("scan", variant="compact")
        # the enhanced student's trainable kernel (VERDICT r3 weak #5: it
        # shipped as a default with no recorded arm)
        out["enhanced_pallas"] = run_impl("pallas", variant="enhanced")
        out["enhanced_scan"] = run_impl("scan", variant="enhanced")
        # dispatch-amortized device rates (see run_impl_streamed docstring)
        out["pallas_streamed"] = run_impl_streamed("pallas")
        out["compact_pallas_streamed"] = run_impl_streamed(
            "pallas", variant="compact")
        out["compact_scan_streamed"] = run_impl_streamed(
            "scan", variant="compact")
        out["enhanced_pallas_streamed"] = run_impl_streamed(
            "pallas", variant="enhanced")
        out["enhanced_scan_streamed"] = run_impl_streamed(
            "scan", variant="enhanced")
        # flagged deviation: frozen teacher's forward in bf16 (KD targets
        # still fp32) — the teacher was the single largest step component
        # (4.5 of 10.5 ms, benchmarks/kd_step_profile.json)
        tr_bf16 = KDTrainConfig(batch_size=16, accumulation_steps=1,
                                teacher_bf16=True)
        out["pallas_streamed_teacher_bf16"] = run_impl_streamed(
            "pallas", tr_step=tr_bf16)
        out["compact_pallas_streamed_teacher_bf16"] = run_impl_streamed(
            "pallas", variant="compact", tr_step=tr_bf16)
        # flagged deviation: batch-size scaling beyond the reference's
        # loader cap of 16 (src/data_loader.py:117-121, a preserved quirk in
        # data/loader.py) — records what the chip does at serving-scale
        # batches.  decoder_impl follows the production auto policy (the
        # trainable Pallas kernel's VMEM budget may fall back to the XLA
        # scan at large B*T; the fallback logs, ops/pallas_lstm.py).
        for b in (64, 128):
            out[f"pallas_streamed_b{b}"] = run_impl_streamed(
                "pallas", k_steps=4, batch=b)
        # deeper stream (k=32): recorded for honesty — it is SLOWER than
        # k=8. Per-HLO profiling shows scan-chaining itself costs ~66% on
        # device (un-chained step 4.67 ms, in-chain 7.75 ms/step: carry
        # copies + reduced weight prefetch inside the while body, growing
        # with k; benchmarks/kd_step_hlo_profile.json + docs/round3_notes).
        # The chain exists only to amortize THIS RIG's 20-130 ms dispatch
        # floor; a real deployment dispatches un-chained at 4.67 ms/step.
        out["pallas_streamed_k32"] = run_impl_streamed(
            "pallas", k_steps=32, n_calls=2)
    best = out.get("pallas_streamed", out.get("pallas", out["scan"]))
    out.update({k: best[k] for k in
                ("p50_latency_s", "steps_per_sec", "images_per_sec")})
    return out


def config_5_converged(workdir: str, *, epochs_teacher: int = 12,
                       epochs_kd: int = 200, images: int = 256,
                       recipe: str = "grounded", reuse: bool = True,
                       task: str = "grid", teacher_recipe: str = "reference",
                       student_variant: str = "full",
                       resume_kd: bool = False):
    """Converged end-to-end KD benchmark recording captioning parity.

    The reference's headline claim is a student at 85-95% of teacher BLEU-1
    (/root/reference/README.md:109), measured by its evaluator
    (/root/reference/src/evaluate_student.py:272-378).  This config trains the
    production 512/8/4 teacher + full student on a >=256-image learnable
    synthetic set to the BLEU plateau and records student_bleu1,
    teacher_bleu1, and their ratio — the re-runnable version of the round-2
    demo (docs/demo_run.md), which proved convergence but was never a
    recorded benchmark.

    ``recipe``:
      * "grounded" — the flagged-deviation recipe required for from-scratch
        backbones on the synthetic color task (CE weight 0.5 paid out of
        token-KD alpha, encoder LR scale 1.0, whole backbone trainable, no
        attention refinement, no color jitter).  Every deviation is diagnosed
        in docs/demo_run.md.
      * "reference" — the reference's exact recipe (CE weight 0, frozen
        backbone prefix, refinement on, hue-0.1 jitter).  Best-effort: it
        assumes PRETRAINED backbones, unavailable in this container.
      * "kd_dominant" — grounded model setup but CE weight 0.2 (token-KD
        alpha 0.5 dominates): demonstrates that token-level KD itself — not
        the supervised CE signal — transfers on the discriminative task
        (VERDICT r4 #1).

    ``teacher_recipe``:
      * "reference" — reference-style teacher (TEACHER_TRAIN_AUG jitter,
        encoder lr x0.1), the r4 teacher.
      * "grid" — grid-suited flagged-deviation recipe: NO augmentation
        (grid captions are raster-order, so hflip reorders content words;
        hue jitter crosses the color categories the captions name — the
        same diagnosis as docs/demo_run.md), encoder lr scale 1.0 (the ViT
        trains from scratch), patience off.  Targets a SATURATED teacher so
        the parity ratio is measured against a strong teacher
        (/root/reference/README.md:109).

    The grid teacher is trained once under ``workdir/teacher_grid`` and
    shared by every recipe/variant arm that uses it.

    ``reuse=True`` skips stages whose checkpoints exist in ``workdir`` so a
    completed run can be re-reported without re-training (recorded in the
    output as ``teacher_reused``/``kd_reused`` with null train times).
    ``resume_kd=True`` instead CONTINUES KD from the final student
    checkpoint up to ``epochs_kd`` total epochs.  NOTE: the trainer
    rewrites ``student_training_history.json`` per segment, so a resumed
    record's ``kd_epochs_to_val_bleu`` / ``val_bleu_curve_tail`` count
    epochs WITHIN the resumed segment (offset by the previous budget).
    """
    import numpy as np

    from imagecaptioner_tpu.core.config import (
        DistillConfig, KDTrainConfig, TeacherTrainConfig)
    from imagecaptioner_tpu.data.synthetic import make_synthetic_dataset
    from imagecaptioner_tpu.train.train_teacher import train as train_teacher
    from imagecaptioner_tpu.train.train_student_kd import train_student_with_kd

    from imagecaptioner_tpu.data.transforms import AugmentConfig

    assert recipe in ("grounded", "reference", "kd_dominant"), recipe
    assert teacher_recipe in ("reference", "grid"), teacher_recipe
    os.makedirs(workdir, exist_ok=True)
    data = os.path.join(workdir, "data")
    if not os.path.exists(os.path.join(data, "captions_clean.csv")):
        os.makedirs(data, exist_ok=True)
        make_synthetic_dataset(data, n_images=images, captions_per_image=1,
                               image_size=224, seed=0, learnable=True,
                               task=task)
    suffix = ("" if teacher_recipe == "reference" else "_strongT") + (
        "" if student_variant == "full" else f"_{student_variant}")
    out = os.path.join(workdir, f"saved_models_{recipe}{suffix}")
    if teacher_recipe == "grid":
        teacher_dir = os.path.join(workdir, "teacher_grid")
    else:
        teacher_dir = out
    teacher_ckpt = os.path.join(teacher_dir, "best_teacher_model.npz")
    student_ckpt = os.path.join(out, "best_student_model.npz")

    teacher_reused = bool(reuse and os.path.exists(teacher_ckpt))
    t0 = time.perf_counter()
    if not teacher_reused:
        t_kw = dict(num_epochs=epochs_teacher, validate_every=2,
                    learning_rate=3e-4)
        t_aug = None
        if teacher_recipe == "grid":
            # flagged deviations (docstring above): saturate the teacher
            t_kw.update(patience=10 ** 6, encoder_lr_scale=1.0)
            t_aug = AugmentConfig()  # identity: resize+normalize only
        train_teacher(data, output_dir=teacher_dir,
                      train_cfg=TeacherTrainConfig(**t_kw), aug=t_aug,
                      verbose=True)
    t_teacher = None if teacher_reused else time.perf_counter() - t0

    kd_kw = dict(num_epochs=epochs_kd, validate_every=1, patience=10 ** 6)
    d_cfg = DistillConfig()
    aug = None
    model_kw: dict = dict(student_variant=student_variant)
    ce_weight = 0.0
    if recipe in ("grounded", "kd_dominant"):
        ce_weight = 0.5 if recipe == "grounded" else 0.2
        d_cfg = DistillConfig(alpha=1.0 - ce_weight - d_cfg.beta - d_cfg.gamma)
        kd_kw["encoder_lr_scale"] = 1.0
        if teacher_recipe == "grid":
            aug = AugmentConfig()  # raster-order captions: no hflip either
        else:
            aug = AugmentConfig(hflip_prob=0.5)  # ref flips, no color jitter
        model_kw.update(freeze_backbone=False, use_attention_refinement=False)
    kd_reused = bool(reuse and os.path.exists(student_ckpt)
                     and not resume_kd)
    kd_resumed_from = None
    if resume_kd:
        final_ckpt = os.path.join(out, "final_student_model.npz")
        if os.path.exists(final_ckpt):
            model_kw["resume_from"] = final_ckpt
            kd_resumed_from = final_ckpt
    t0 = time.perf_counter()
    if not kd_reused:
        train_student_with_kd(
            data, teacher_checkpoint=teacher_ckpt, output_dir=out,
            train_cfg=KDTrainConfig(**kd_kw), distill_cfg=d_cfg, aug=aug,
            verbose=True, **model_kw)
    t_kd = None if kd_reused else time.perf_counter() - t0

    # ---- full-set evaluation: the parity ratio the reference claims --------
    from imagecaptioner_tpu.data.dataset import CaptionDataset
    from imagecaptioner_tpu.eval import metrics as MET
    from imagecaptioner_tpu.eval.evaluate_student import load_student_evaluator

    ev = load_student_evaluator(student_ckpt, teacher_ckpt,
                                os.path.join(out, "vocab.json"))
    ds = CaptionDataset(data, os.path.join(data, "captions_clean.csv"),
                        vocab=ev.vocab, image_size=224)
    report = ev.compare_models_on_dataset(ds, max_samples=len(ds),
                                          measure_latency_samples=2,
                                          verbose=False)
    s_bleu1 = report["student"]["bleu1"]
    t_bleu1 = report["teacher"]["bleu1"]

    # grounding evidence: the student must BEAT the best constant caption.
    # Candidates: every observed caption, plus a greedy adversarial constant
    # built token-by-token (stronger than any observed caption under the
    # no-brevity-penalty BLEU; see scripts/check_constant_floor.py).
    rows = report["comparisons"]
    refs = [r["reference"].lower().split() for r in rows]
    s_caps = [r.get("student", "") for r in rows]
    floor = MET.adversarial_constant_bleu1(
        refs, extra_candidates=[c.lower().split() for c in s_caps])
    const_baseline = floor["floor"]
    hist = json.load(open(os.path.join(out,
                                       "student_training_history.json")))
    curve = hist["val_bleu_scores"]

    def epochs_to(thresh):
        for i, b in enumerate(curve):
            if b >= thresh:
                return i + 1
        return None

    return {
        "name": "end_to_end_kd_run_converged",
        "recipe": recipe,
        "teacher_recipe": teacher_recipe,
        "student_variant": student_variant,
        "ce_weight": ce_weight,
        "task": task,
        "images": images,
        "epochs": {"teacher": epochs_teacher, "kd": epochs_kd},
        # provenance: reused stages record null train time + the flag
        # (VERDICT r4 weak #5 — microseconds next to epochs:40 misled)
        "teacher_reused": teacher_reused,
        "kd_reused": kd_reused,
        "kd_resumed_from": kd_resumed_from,
        "teacher_train_s": t_teacher, "kd_train_s": t_kd,
        "kd_epochs_to_val_bleu": {"0.5": epochs_to(0.5),
                                  "0.7": epochs_to(0.7),
                                  "0.85": epochs_to(0.85)},
        "student_bleu1": s_bleu1,
        "teacher_bleu1": t_bleu1,
        "bleu1_ratio": s_bleu1 / t_bleu1 if t_bleu1 else None,
        "student_bleu2": report["student"]["bleu2"],
        "teacher_bleu2": report["teacher"]["bleu2"],
        "bleu2_ratio": (report["student"]["bleu2"] / report["teacher"]["bleu2"]
                        if report["teacher"]["bleu2"] else None),
        "student_meteor": report["student"]["meteor"],
        "teacher_meteor": report["teacher"]["meteor"],
        "meteor_ratio": (report["student"]["meteor"]
                         / report["teacher"]["meteor"]
                         if report["teacher"]["meteor"] else None),
        "num_eval_samples": report["num_samples"],
        "distinct_student_captions": len(set(s_caps)),
        "best_constant_caption_bleu1": const_baseline,
        "beats_constant_baseline": bool(s_bleu1 > const_baseline),
        "val_bleu_curve_tail": [round(x, 3)
                                for x in hist["val_bleu_scores"][-20:]],
        "reference_claim": "student at 85-95% of teacher BLEU-1 "
                           "(/root/reference/README.md:109)",
    }


def config_5(epochs: int):
    import jax.numpy as jnp

    from imagecaptioner_tpu.data.synthetic import make_synthetic_dataset
    from imagecaptioner_tpu.train.train_teacher import train as train_teacher
    from imagecaptioner_tpu.train.train_student_kd import train_student_with_kd
    from imagecaptioner_tpu.core.config import KDTrainConfig, TeacherTrainConfig

    tmp = tempfile.mkdtemp(prefix="bench_e2e_")
    make_synthetic_dataset(tmp, n_images=64, captions_per_image=2,
                           image_size=224, seed=0)
    out = os.path.join(tmp, "saved_models")
    t0 = time.perf_counter()
    train_teacher(tmp, output_dir=out, num_epochs=1,
                  train_cfg=TeacherTrainConfig(batch_size=12,
                                               accumulation_steps=1,
                                               num_epochs=1,
                                               validate_every=1),
                  compute_dtype=jnp.bfloat16, verbose=False)
    t_teacher = time.perf_counter() - t0
    t0 = time.perf_counter()
    train_student_with_kd(
        tmp, teacher_checkpoint=f"{out}/best_teacher_model.npz",
        output_dir=out, num_epochs=epochs,
        train_cfg=KDTrainConfig(batch_size=16, accumulation_steps=2,
                                num_epochs=epochs, validate_every=1),
        compute_dtype=jnp.bfloat16, verbose=False)
    t_kd = time.perf_counter() - t0
    hist = json.load(open(f"{out}/student_training_history.json"))
    return {"name": "end_to_end_kd_run",
            "teacher_epoch_s": t_teacher, "kd_total_s": t_kd,
            "kd_s_per_epoch": t_kd / max(epochs, 1),
            "final_val_bleu": hist["val_bleu_scores"][-1]
            if hist["val_bleu_scores"] else None}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="2,3,4")
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--output", default="benchmarks/results.json")
    # converged config-5 mode (the recorded parity benchmark)
    ap.add_argument("--converged", action="store_true",
                    help="run config 5 as the converged parity benchmark "
                         "(trains to the BLEU plateau; hours on the relay)")
    ap.add_argument("--workdir", default="/tmp/ic_converged_bench")
    ap.add_argument("--epochs-teacher", type=int, default=12)
    ap.add_argument("--epochs-kd", type=int, default=200)
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--recipe", default="grounded",
                    choices=["grounded", "reference", "kd_dominant"])
    ap.add_argument("--teacher-recipe", default="reference",
                    choices=["reference", "grid"],
                    help="grid = saturated jitter-free teacher (r5; shared "
                         "under workdir/teacher_grid)")
    ap.add_argument("--student-variant", default="full",
                    choices=["full", "compact", "enhanced"])
    ap.add_argument("--resume-kd", action="store_true",
                    help="continue KD from the final student checkpoint up "
                         "to --epochs-kd total epochs")
    ap.add_argument("--task", default="grid", choices=["grid", "bands"],
                    help="synthetic task for --converged (grid = the "
                         "discriminative r4 task, constant floor ~0.27; "
                         "bands = the r3 task, floor 0.648)")
    ap.add_argument("--no-reuse", action="store_true",
                    help="retrain even if checkpoints exist in --workdir")
    ap.add_argument("--enhanced-repeats", type=int, default=0,
                    help="run ONLY the enhanced decoder-gate streamed arms "
                         "this many times each and record the spread under "
                         "results['4']['enhanced_gate_repeats']")
    args = ap.parse_args()

    from imagecaptioner_tpu.core.runtime import enable_compile_cache

    enable_compile_cache()
    wanted = {int(x) for x in args.configs.split(",")}
    # merge into the existing record so a partial re-run (e.g. --configs 4)
    # keeps the other configs' numbers
    results = {}
    if os.path.exists(args.output):
        try:
            with open(args.output) as f:
                results = json.load(f)
        except (OSError, ValueError):
            results = {}
    if args.enhanced_repeats:
        rec = config_4(enhanced_repeats=args.enhanced_repeats)
        results.setdefault("4", {})["enhanced_gate_repeats"] = rec
        print(json.dumps(rec))
        wanted = set()
    for i, fn in [(1, config_1), (2, config_2), (3, config_3),
                  (4, config_4)]:
        if i in wanted:
            print(f"running config {i}...")
            results[str(i)] = fn()
            print(json.dumps(results[str(i)]))
    if 5 in wanted:
        print("running config 5...")
        if args.converged:
            # key scheme: "5" = r4 headline (grounded, reference-style
            # teacher, full student); strong-teacher / KD-dominant /
            # per-variant arms record under their own keys so no arm ever
            # clobbers another
            if args.recipe == "reference":
                key = "5_reference_recipe"
            elif args.student_variant != "full":
                key = f"5_{args.student_variant}"
            elif args.recipe == "kd_dominant":
                key = "5_kd_dominant"
            elif args.teacher_recipe == "grid":
                key = "5_strong_teacher"
            else:
                key = "5"
            results[key] = config_5_converged(
                args.workdir, epochs_teacher=args.epochs_teacher,
                epochs_kd=args.epochs_kd, images=args.images,
                recipe=args.recipe, reuse=not args.no_reuse,
                task=args.task, teacher_recipe=args.teacher_recipe,
                student_variant=args.student_variant,
                resume_kd=args.resume_kd)
        else:
            key = "5"
            results[key] = config_5(args.epochs)
        print(json.dumps(results[key]))
    # re-merge the file just before writing: concurrent arm runs (two
    # trainings sharing one workdir) otherwise lose each other's records
    # (classic lost update — bit the r5 compact arm)
    if os.path.exists(args.output):
        try:
            with open(args.output) as f:
                results = {**json.load(f), **results}
        except (OSError, ValueError):
            pass
    results["_note"] = (
        "Measured through a shared TPU relay; run-to-run variance is 2-6x "
        "with relay load. Methodology: distinct inputs per call, device_get "
        "sync, interleaved small/large pairs with median-marginal estimator, "
        "physics guard at the calibrated ~125 TFLOP/s ceiling, raw totals "
        "reported (core/timing.py). bench.py is the canonical headline "
        "measurement.")
    os.makedirs(os.path.dirname(args.output), exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
    print(f"results -> {args.output}")


if __name__ == "__main__":
    main()
