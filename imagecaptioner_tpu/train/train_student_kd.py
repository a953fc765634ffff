"""Flagship KD entry point (src/train_student_kd.py:88-438 semantics).

Trains the full CNN-LSTM student against a frozen teacher checkpoint with the
multi-level DistillationLoss.  Reference behaviors preserved: hardcoded
defaults (lr 2e-4, batch 16, accum 2, num_epochs=1 — the code says 1 even
though the README says 30), preflight validate_distillation_setup, 3 param
groups (encoder x0.1 / decoder / others), clip 1.0 over student+projectors,
cosine-warm-restarts stepped fractionally, validation every 2 epochs with
sampled monitoring-BLEU, best/final checkpoints with the reference's logical
keys, ``student_training_history.json``.

Usage: ``python -m imagecaptioner_tpu.train.train_student_kd [...]``.
"""

from __future__ import annotations

import argparse
import os
from collections import defaultdict
from dataclasses import replace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from imagecaptioner_tpu.core.config import (
    DistillConfig, KDTrainConfig, TeacherConfig, compact_student_config,
    enhanced_student_config, full_student_config)
from imagecaptioner_tpu.data.loader import get_loader
from imagecaptioner_tpu.distill.validate import validate_distillation_setup
from imagecaptioner_tpu.eval.metrics import monitoring_bleu
from imagecaptioner_tpu.models import student as SM
from imagecaptioner_tpu.models import teacher as TM
from imagecaptioner_tpu.train import common, optim as O, steps
from imagecaptioner_tpu.utils import checkpoint as CKPT


def load_teacher(teacher_checkpoint: str, vocab_size: int):
    """Load a teacher trained by train_teacher.  The reference hard-codes the
    512/8/4/0.15 architecture at every load site (train_student_kd.py:159-171);
    here the checkpoint's model_config reconstructs it."""
    ckpt = CKPT.load_checkpoint(teacher_checkpoint)
    mc = ckpt.get("model_config", {})
    cfg = TeacherConfig(vocab_size=int(ckpt["vocab_size"]),
                        **{k: v for k, v in mc.items()})
    params = jax.tree.map(jnp.asarray, ckpt["model_state_dict"]["params"])
    return params, cfg


def validate_student(eval_step, params, model_state, teacher_params,
                     val_loader, vocab, *, epoch=0, max_batches=50,
                     mesh=None):
    """validate_student_model (train_student_kd.py:29-86): loss over
    <=max_batches, monitoring BLEU on 2 samples x first 5 batches.

    With a ``mesh``, host-local val batches are assembled into GLOBAL eval
    batches (multi-host: every process contributes its host_shard; eval work
    is divided, not duplicated) and the eval step's replicated outputs make
    loss/preds host-fetchable on every process."""
    losses, bleus, n = [], [], 0
    for bi, batch in enumerate(val_loader):
        if bi >= max_batches:
            break
        if mesh is not None:
            batch = common.put_global_batch(mesh, batch, stacked=False)
        with common.step_context(mesh):
            loss, _, preds, cap_tgt = eval_step(params, model_state,
                                                teacher_params, batch,
                                                jnp.int32(epoch))
        b = int(preds.shape[1])  # global batch when mesh is active
        losses.append(float(loss) * b)
        n += b
        if bi < 5:
            cap_tgt = np.asarray(cap_tgt)
            for i in range(min(2, preds.shape[1])):
                bleus.append(monitoring_bleu(
                    np.asarray(preds[:, i]), cap_tgt[:, i], vocab))
    avg_loss = sum(losses) / max(n, 1)
    avg_bleu = float(np.mean(bleus)) if bleus else 0.0
    return avg_loss, avg_bleu


def train_student_with_kd(
    data_root: str = "data/flickr8k",
    captions_file: Optional[str] = None,
    teacher_checkpoint: str = "saved_models/best_teacher_model.npz",
    output_dir: str = "saved_models",
    *,
    train_cfg: Optional[KDTrainConfig] = None,
    distill_cfg: Optional[DistillConfig] = None,
    num_epochs: Optional[int] = None,
    max_caption_len: int = 48,
    image_size: int = 224,
    compute_dtype=jnp.bfloat16,
    seed: int = 0,
    max_steps_per_epoch: Optional[int] = None,
    resume_from: Optional[str] = None,
    data_parallel: bool = True,
    metrics_jsonl: Optional[str] = None,
    freeze_backbone: bool = True,
    use_attention_refinement: Optional[bool] = None,
    student_variant: str = "full",
    student_cfg_overrides: Optional[dict] = None,
    aug=None,
    device_dataset: bool = False,
    stream_steps: int = 8,
    verbose: bool = True,
):
    tr = train_cfg or KDTrainConfig()
    if num_epochs is not None:
        tr = replace(tr, num_epochs=num_epochs)
    d_cfg = distill_cfg or DistillConfig()
    captions_file = captions_file or os.path.join(data_root, "captions_clean.csv")

    common.distributed_init_from_env()
    train_loader, dataset = get_loader(
        data_root, captions_file, batch_size=tr.batch_size,
        max_caption_len=max_caption_len, shuffle=True, seed=seed,
        image_size=image_size, host_shard=True)
    # val is host-sharded too: multi-host validation assembles GLOBAL eval
    # batches from per-process shards instead of every process duplicating
    # the full val pass (single-process: host_shard is a no-op)
    val_loader, _ = get_loader(
        data_root, captions_file, batch_size=tr.batch_size,
        max_caption_len=max_caption_len, shuffle=False, vocab=dataset.vocab,
        image_size=image_size, host_shard=True)
    vocab = dataset.vocab
    vocab_size = len(vocab)

    teacher_params, t_cfg = load_teacher(teacher_checkpoint, vocab_size)
    # Trainable fused Pallas decoders exist for all three variants, but the
    # DEFAULT per variant is the recorded measurement winner — the compact
    # kernel measured SLOWER than lax.scan (common.recorded_decoder_impl,
    # VERDICT r3 weak #4; IC_DECODER_IMPL overrides).
    decoder_impl = common.recorded_decoder_impl(student_variant)
    # use_attention_refinement=None -> the variant's own default (True for
    # full, the reference trainer's setting); an explicit bool applies to
    # ANY variant.  tr.dropout is the reference trainer's knob for the FULL
    # student only (train_student_kd.py:96-111) — other variants keep their
    # own dropout defaults (override via student_cfg_overrides).
    refine_kw = ({} if use_attention_refinement is None
                 else {"use_attention_refinement": use_attention_refinement})
    if student_variant == "full":
        s_cfg = full_student_config(
            vocab_size, dropout=tr.dropout, freeze_backbone=freeze_backbone,
            decoder_impl=decoder_impl, **refine_kw)
    elif student_variant in ("compact", "enhanced"):
        # reference's run_optimized_training.py:20-22 advertises these
        # students for KD but never wires them into a trainer; here they are
        # first-class — variant defaults (core/config.py), same KD machinery
        factory = (compact_student_config if student_variant == "compact"
                   else enhanced_student_config)
        s_cfg = factory(vocab_size, freeze_backbone=freeze_backbone,
                        decoder_impl=decoder_impl, **refine_kw)
    else:
        raise ValueError(f"unknown student_variant {student_variant!r}")
    if student_cfg_overrides:
        s_cfg = replace(s_cfg, **student_cfg_overrides)

    key = jax.random.PRNGKey(seed)
    k_init, k_proj, key = jax.random.split(key, 3)
    s_params, s_state = SM.student_init(k_init, s_cfg)
    if verbose:
        print(f"Student parameters: {SM.count_parameters(s_params):,}")

    # Preflight (train_student_kd.py:198-202): builds the projectors; the
    # returned loss config is rebuilt with explicit weights, like :205-211.
    sample = next(iter(val_loader))
    from imagecaptioner_tpu.data import transforms as T
    sample_images = T.normalize(jnp.asarray(sample["images"][:2]))
    sample_caps = jnp.asarray(sample["captions"][:, :2])
    projectors, _ = validate_distillation_setup(
        teacher_params, t_cfg, s_params, s_state, s_cfg,
        (sample_images, sample_caps), key=k_proj, verbose=verbose)

    params = {"student": s_params, "projectors": projectors}
    opt = steps.make_kd_opt(params, s_cfg, tr)  # kept for resume coercion
    state = steps.TrainState(params, O.adamw_init(params), s_state)
    start_epoch = 0
    if resume_from is not None:
        ck = CKPT.load_checkpoint(resume_from)
        params = {
            "student": jax.tree.map(jnp.asarray,
                                    ck["student_state_dict"]["params"]),
            "projectors": jax.tree.map(jnp.asarray,
                                       ck["projectors_state_dict"]),
        }
        state = steps.TrainState(
            params,
            opt.coerce_state_tree(ck["optimizer_state_dict"]),
            jax.tree.map(jnp.asarray, ck["student_state_dict"]["model_state"]))
        start_epoch = int(ck["epoch"]) + 1
        if verbose:
            print(f"Resumed from {resume_from} at epoch {start_epoch}")
    aug_kw = {} if aug is None else {"aug": aug}
    train_step = steps.make_kd_train_step(
        t_cfg, s_cfg, d_cfg, tr, compute_dtype=compute_dtype, **aug_kw)

    # divisibility must be judged on the loader's EFFECTIVE batch
    # (get_loader silently caps at 16 and at dataset size)
    mesh = common.maybe_mesh(train_loader.batch_size, data_parallel)
    eval_step = steps.make_kd_eval_step(
        t_cfg, s_cfg, d_cfg, compute_dtype=compute_dtype, mesh=mesh)
    if mesh is not None:
        from imagecaptioner_tpu.core import mesh as MS

        state = MS.replicate(mesh, state)
        teacher_params = MS.replicate(mesh, teacher_params)
        if verbose:
            print(f"[dp] training over {mesh}")

    os.makedirs(output_dir, exist_ok=True)
    vocab.save(os.path.join(output_dir, "vocab.json"))

    steps_per_epoch = max(len(train_loader) // tr.accumulation_steps, 1)

    # Device-resident dataset (data/device_cache.py): decode + upload the
    # whole training set ONCE, gather batches in-graph, and chain
    # ``stream_steps`` optimizer steps per dispatch — an epoch becomes a
    # handful of dispatches moving only index bytes.  Single-process /
    # single-device (under DP the per-host loader assembles global batches).
    device_data = None
    if device_dataset:
        if jax.process_count() > 1:
            raise ValueError(
                "device_dataset=True is single-process (rows replicate over "
                "the local mesh); multi-host training uses the host loader")
        from imagecaptioner_tpu.data.device_cache import DeviceDataset

        device_data = DeviceDataset(dataset, max_caption_len=max_caption_len,
                                    mesh=mesh)
        device_data.seed(seed)
        dd_step = steps.make_device_data_step(train_step, stream_steps, mesh)
        dd_step1 = (dd_step if stream_steps == 1
                    else steps.make_device_data_step(train_step, 1, mesh))
        if verbose:
            print(f"[device-data] {device_data.n} rows resident on device"
                  f"{' (replicated, DP)' if mesh is not None else ''}; "
                  f"{stream_steps} chained steps/dispatch")
    stopper = common.EarlyStopping(tr.patience, mode="min")
    train_losses, val_losses, val_bleu_scores = [], [], []
    loss_components_history = defaultdict(list)
    best_val = float("inf")
    from imagecaptioner_tpu.utils.logging import MetricLogger

    mlog = MetricLogger(metrics_jsonl)

    def ckpt_tree(epoch, extra):
        return dict(
            epoch=epoch,
            student_state_dict=dict(params=state.params["student"],
                                    model_state=state.model_state),
            projectors_state_dict=state.params["projectors"],
            optimizer_state_dict=dict(step=state.opt_state.step,
                                      mu=state.opt_state.mu,
                                      nu=state.opt_state.nu),
            scheduler_state_dict=dict(last_epoch_time=float(epoch)),
            vocab_size=vocab_size,
            model_config=dict(embed_size=s_cfg.embed_size,
                              hidden_size=s_cfg.hidden_size,
                              num_layers=s_cfg.num_layers,
                              dropout=s_cfg.dropout,
                              use_attention_refinement=(
                                  s_cfg.use_attention_refinement),
                              model_type=s_cfg.variant),
            distillation_config=dict(alpha=d_cfg.alpha, beta=d_cfg.beta,
                                     gamma=d_cfg.gamma,
                                     temperature=d_cfg.temperature),
            **extra,
        )

    for epoch in range(start_epoch, tr.num_epochs):
        step_metrics = []  # device arrays; one host fetch per epoch
        nb = 0
        if device_data is not None:
            idx_all = device_data.epoch_indices(
                batch_size=train_loader.batch_size,
                accumulation_steps=tr.accumulation_steps)
            n_steps = idx_all.shape[0]
            if max_steps_per_epoch is not None:
                n_steps = min(n_steps, max_steps_per_epoch)
            dsched = jnp.float32(1.0 / steps_per_epoch)
            s = 0
            while s < n_steps:
                k = min(stream_steps, n_steps - s)
                key, k_step = jax.random.split(key)
                sched0 = jnp.float32(epoch + s / steps_per_epoch)
                if k == stream_steps:
                    with common.step_context(mesh):
                        state, ms = dd_step(
                            state, teacher_params, device_data.arrays,
                            jnp.asarray(idx_all[s:s + k]), sched0, dsched,
                            jnp.int32(epoch), k_step)
                    step_metrics.append(ms)  # dict of (k,) arrays
                    nb += k
                    s += k
                else:  # trailing partial chunk: per-step program
                    with common.step_context(mesh):
                        state, ms = dd_step1(
                            state, teacher_params, device_data.arrays,
                            jnp.asarray(idx_all[s:s + 1]), sched0, dsched,
                            jnp.int32(epoch), k_step)
                    step_metrics.append(ms)
                    nb += 1
                    s += 1
        else:
            for idx, stacked in enumerate(
                    common.stacked_batches(train_loader,
                                           tr.accumulation_steps,
                                           mesh=mesh)):
                if (max_steps_per_epoch is not None
                        and idx >= max_steps_per_epoch):
                    break
                sched_t = jnp.float32(epoch + idx / steps_per_epoch)
                key, k_step = jax.random.split(key)
                with common.step_context(mesh):
                    state, metrics = train_step(state, teacher_params,
                                                stacked, sched_t,
                                                jnp.int32(epoch), k_step)
                step_metrics.append(metrics)
                nb += 1
                if verbose and idx % 50 == 0:  # sync only at log boundaries
                    m = jax.device_get(metrics)
                    common.log_progress(epoch, idx, m, float(m["lr"]),
                                        steps_per_epoch)
        fetched = common.flatten_step_metrics(jax.device_get(step_metrics))
        for si, m in enumerate(fetched):
            mlog.log_step(epoch * steps_per_epoch + si, m, epoch=epoch)
        epoch_losses = [float(m["total_loss"]) for m in fetched]
        epoch_components = defaultdict(float)
        for m in fetched:
            for k in ("total_loss", "ce_loss", "token_kd_loss",
                      "feature_kd_loss", "hidden_kd_loss"):
                epoch_components[k] += float(m[k])
        avg_train = float(np.mean(epoch_losses)) if epoch_losses else float("nan")
        train_losses.append(avg_train)
        for k, v in epoch_components.items():
            loss_components_history[k].append(v / max(nb, 1))

        if epoch % tr.validate_every == 0:
            val_loss, val_bleu = validate_student(
                eval_step, state.params, state.model_state, teacher_params,
                val_loader, vocab, epoch=epoch, mesh=mesh)
            val_losses.append(val_loss)
            val_bleu_scores.append(val_bleu)
            if verbose:
                print(f"\nEpoch {epoch+1}:")
                print(f"  Train Loss: {avg_train:.4f}")
                print(f"  Val Loss: {val_loss:.4f}")
                print(f"  Val BLEU-1: {val_bleu:.4f}")
            if stopper.update(val_loss):
                best_val = val_loss
                # async: snapshot now, write off the critical path (the npz
                # write is ~a minute for large models on a slow host);
                # wait_for_saves() below guarantees the file before return
                CKPT.save_checkpoint_async(
                    os.path.join(output_dir, "best_student_model.npz"),
                    ckpt_tree(epoch, dict(val_loss=val_loss,
                                          val_bleu=val_bleu)))
                if verbose:
                    print(f"  New best model saved! Val Loss: {val_loss:.4f}, "
                          f"BLEU: {val_bleu:.4f}")
            if stopper.should_stop:
                if verbose:
                    print(f"Early stopping triggered after {tr.patience} "
                          "epochs without improvement")
                break
        elif verbose:
            print(f"Epoch {epoch+1}: Train Loss: {avg_train:.4f}")

    CKPT.wait_for_saves()
    CKPT.save_checkpoint(
        os.path.join(output_dir, "final_student_model.npz"),
        ckpt_tree(tr.num_epochs, dict(
            train_losses=train_losses, val_losses=val_losses,
            val_bleu_scores=val_bleu_scores,
            loss_components=dict(loss_components_history))))
    common.write_history(
        os.path.join(output_dir, "student_training_history.json"),
        dict(train_losses=train_losses, val_losses=val_losses,
             val_bleu_scores=val_bleu_scores,
             loss_components=dict(loss_components_history),
             hyperparameters=dict(
                 learning_rate=tr.learning_rate, batch_size=tr.batch_size,
                 embed_size=s_cfg.embed_size, hidden_size=s_cfg.hidden_size,
                 alpha=d_cfg.alpha, beta=d_cfg.beta, gamma=d_cfg.gamma,
                 temperature=d_cfg.temperature)))
    mlog.close()
    if verbose:
        print("\nTraining completed!")
        print(f"Best validation loss: {best_val:.4f}")
    return state, s_cfg, vocab


def main():
    ap = argparse.ArgumentParser(description="Train the student with KD")
    ap.add_argument("--data-root", default="data/flickr8k")
    ap.add_argument("--captions-file", default=None)
    ap.add_argument("--teacher-checkpoint",
                    default="saved_models/best_teacher_model.npz")
    ap.add_argument("--output-dir", default="saved_models")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume-from", default=None)
    ap.add_argument("--student", default="full",
                    choices=["full", "compact", "enhanced"],
                    help="student variant to distill into (the reference "
                         "advertises compact/enhanced but only ever trains "
                         "the full student here)")
    ap.add_argument("--no-data-parallel", dest="data_parallel",
                    action="store_false",
                    help="force single-device training even with a "
                         "multi-device mesh available")
    ap.add_argument("--device-dataset", action="store_true",
                    help="decode+upload the whole training set to HBM once "
                         "and batch in-graph (single device; see "
                         "data/device_cache.py)")
    ap.add_argument("--stream-steps", type=int, default=8,
                    help="with --device-dataset: optimizer steps chained "
                         "per dispatch")
    args = ap.parse_args()
    from imagecaptioner_tpu.core.runtime import enable_compile_cache

    enable_compile_cache()
    train_student_with_kd(
        args.data_root, args.captions_file, args.teacher_checkpoint,
        args.output_dir, num_epochs=args.epochs, seed=args.seed,
        image_size=args.image_size,
        resume_from=args.resume_from, student_variant=args.student,
        device_dataset=args.device_dataset, stream_steps=args.stream_steps,
        data_parallel=args.data_parallel)


if __name__ == "__main__":
    main()
