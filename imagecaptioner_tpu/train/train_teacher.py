"""Teacher training entry point (src/train_teacher.py:52-290 semantics).

Reference behaviors preserved: hardcoded-default hyperparameters (batch 12,
accum 3, lr 1e-4, 25 epochs, clip 0.5, label smoothing 0.1, encoder lr x0.1,
CosineAnnealingWarmRestarts stepped fractionally per batch), val loader over
the same full CSV unshuffled (no real split), validate every 2 epochs, early
stop patience 5, best/final checkpoints with the reference's logical keys,
``training_history.json``.

TPU-first: the whole accumulate->clip->update cycle is one jitted step;
augmentation runs on-device; batches shard over the mesh data axis.

Usage: ``python -m imagecaptioner_tpu.train.train_teacher [--data-root ...]``.
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from imagecaptioner_tpu.core.config import TeacherConfig, TeacherTrainConfig
from imagecaptioner_tpu.data.loader import get_loader
from imagecaptioner_tpu.models import teacher as TM
from imagecaptioner_tpu.train import common, optim as O, steps
from imagecaptioner_tpu.utils import checkpoint as CKPT


def train(
    data_root: str = "data/flickr8k",
    captions_file: Optional[str] = None,
    output_dir: str = "saved_models",
    *,
    train_cfg: Optional[TeacherTrainConfig] = None,
    teacher_cfg_overrides: Optional[dict] = None,
    num_epochs: Optional[int] = None,
    max_caption_len: int = 48,
    image_size: int = 224,
    aug=None,
    compute_dtype=jnp.bfloat16,
    seed: int = 0,
    max_steps_per_epoch: Optional[int] = None,
    resume_from: Optional[str] = None,
    data_parallel: bool = True,
    verbose: bool = True,
):
    tr = train_cfg or TeacherTrainConfig()
    if num_epochs is not None:
        from dataclasses import replace
        tr = replace(tr, num_epochs=num_epochs)
    captions_file = captions_file or os.path.join(data_root, "captions_clean.csv")

    common.distributed_init_from_env()
    # Data: train shuffled; val = same full CSV unshuffled (train_teacher.py:93-110)
    train_loader, dataset = get_loader(
        data_root, captions_file, batch_size=tr.batch_size,
        max_caption_len=max_caption_len, shuffle=True, seed=seed,
        image_size=image_size, host_shard=True)
    # host-sharded so multi-host validation divides (not duplicates) the
    # val pass; no-op single-process
    val_loader, _ = get_loader(
        data_root, captions_file, batch_size=tr.batch_size,
        max_caption_len=max_caption_len, shuffle=False, vocab=dataset.vocab,
        image_size=image_size, host_shard=True)
    vocab = dataset.vocab
    vocab_size = len(vocab)
    if verbose:
        print(f"Vocabulary size: {vocab_size}")

    overrides = dict(teacher_cfg_overrides or {})
    overrides.setdefault("image_size", image_size)
    t_cfg = TeacherConfig(vocab_size=vocab_size, **overrides)
    key = jax.random.PRNGKey(seed)
    k_init, key = jax.random.split(key)
    params = TM.teacher_init(k_init, t_cfg)
    if verbose:
        print(f"Total parameters: {TM.count_parameters(params):,}")

    # per-leaf AdamW with donation measured ~3x faster than the flat
    # (raveled) variant on TPU — see optim.FlatAdamW docstring
    opt = steps.make_teacher_opt(params, t_cfg, tr)  # kept for resume coercion
    state = steps.TrainState(params, O.adamw_init(params), {})
    start_epoch = 0
    if resume_from is not None:
        # resumable training — a capability the reference lacks (SURVEY §5.3)
        ck = CKPT.load_checkpoint(resume_from)
        params = jax.tree.map(jnp.asarray, ck["model_state_dict"]["params"])
        state = steps.TrainState(
            params,
            opt.coerce_state_tree(ck["optimizer_state_dict"]),
            jax.tree.map(jnp.asarray, ck["model_state_dict"]["model_state"]))
        start_epoch = int(ck["epoch"]) + 1
        if verbose:
            print(f"Resumed from {resume_from} at epoch {start_epoch}")
    # ``aug=None`` keeps the reference-style TEACHER_TRAIN_AUG; passing an
    # AugmentConfig overrides it (e.g. the jitter-free grid recipe — a
    # flagged deviation, see benchmarks/run_all.py config_5_converged)
    step_kw = {} if aug is None else {"aug": aug}
    train_step = steps.make_teacher_train_step(t_cfg, tr,
                                               compute_dtype=compute_dtype,
                                               **step_kw)

    # divisibility must be judged on the loader's EFFECTIVE batch
    # (get_loader silently caps at 16 and at dataset size)
    mesh = common.maybe_mesh(train_loader.batch_size, data_parallel)
    eval_step = steps.make_teacher_eval_step(t_cfg, tr,
                                             compute_dtype=compute_dtype,
                                             mesh=mesh)
    if mesh is not None:
        from imagecaptioner_tpu.core import mesh as MS

        state = MS.replicate(mesh, state)
        if verbose:
            print(f"[dp] training over {mesh}")

    os.makedirs(output_dir, exist_ok=True)
    vocab.save(os.path.join(output_dir, "vocab.json"))

    steps_per_epoch = max(len(train_loader) // tr.accumulation_steps, 1)
    stopper = common.EarlyStopping(tr.patience, mode="min")
    train_losses, val_losses = [], []
    best_val = float("inf")

    def validate(params):
        losses = []
        for batch in val_loader:
            if mesh is not None:
                batch = common.put_global_batch(mesh, batch, stacked=False)
            with common.step_context(mesh):
                losses.append(float(eval_step(params, batch)))
        return float(np.mean(losses)) if losses else float("nan")

    def ckpt_tree(epoch, extra):
        return dict(
            epoch=epoch,
            model_state_dict=dict(params=state.params,
                                  model_state=state.model_state),
            optimizer_state_dict=dict(step=state.opt_state.step,
                                      mu=state.opt_state.mu,
                                      nu=state.opt_state.nu),
            scheduler_state_dict=dict(last_epoch_time=float(epoch)),
            vocab_size=vocab_size,
            # full config so consumers never hard-code the architecture
            # (the reference hard-codes 512/8/4 at every load site)
            model_config=dict(
                embed_size=t_cfg.embed_size, num_heads=t_cfg.num_heads,
                num_decoder_layers=t_cfg.num_decoder_layers,
                dropout=t_cfg.dropout, encoder_dim=t_cfg.encoder_dim,
                encoder_depth=t_cfg.encoder_depth,
                encoder_heads=t_cfg.encoder_heads,
                encoder_mlp_ratio=t_cfg.encoder_mlp_ratio,
                patch_size=t_cfg.patch_size, image_size=t_cfg.image_size),
            **extra,
        )

    for epoch in range(start_epoch, tr.num_epochs):
        epoch_losses = []  # device arrays; fetched once per epoch (no
        # per-step host syncs — each one is a device round-trip)
        for idx, stacked in enumerate(
                common.stacked_batches(train_loader, tr.accumulation_steps,
                                       mesh=mesh)):
            if max_steps_per_epoch is not None and idx >= max_steps_per_epoch:
                break
            epoch_time = jnp.float32(epoch + idx / steps_per_epoch)
            key, k_step = jax.random.split(key)
            with common.step_context(mesh):
                state, metrics = train_step(state, stacked, epoch_time,
                                            k_step)
            epoch_losses.append(metrics["loss"])
        epoch_losses = [float(x) for x in jax.device_get(epoch_losses)]
        avg_train = float(np.mean(epoch_losses)) if epoch_losses else float("nan")
        train_losses.append(avg_train)

        if epoch % tr.validate_every == 0:
            val_loss = validate(state.params)
            val_losses.append(val_loss)
            if verbose:
                print(f"Epoch {epoch+1}: Train Loss: {avg_train:.4f}, "
                      f"Val Loss: {val_loss:.4f}")
            if stopper.update(val_loss):
                best_val = val_loss
                # snapshot now, write in the background (utils/checkpoint);
                # wait_for_saves() below runs before the final save/return
                CKPT.save_checkpoint_async(
                    os.path.join(output_dir, "best_teacher_model.npz"),
                    ckpt_tree(epoch, dict(val_loss=val_loss)))
                if verbose:
                    print(f"New best model saved with validation loss: "
                          f"{val_loss:.4f}")
            if stopper.should_stop:
                if verbose:
                    print(f"Early stopping triggered after {tr.patience} "
                          "epochs without improvement")
                break
        elif verbose:
            print(f"Epoch {epoch+1}: Train Loss: {avg_train:.4f}")

    CKPT.wait_for_saves()
    CKPT.save_checkpoint(
        os.path.join(output_dir, "final_teacher_model.npz"),
        ckpt_tree(tr.num_epochs, dict(train_losses=train_losses,
                                      val_losses=val_losses)))
    common.write_history(
        os.path.join(output_dir, "training_history.json"),
        dict(train_losses=train_losses, val_losses=val_losses))
    if verbose:
        print("Training completed. Final model saved.")
        print(f"Best validation loss: {best_val:.4f}")
    return state, t_cfg, vocab


def main():
    ap = argparse.ArgumentParser(description="Train the ViT captioning teacher")
    ap.add_argument("--data-root", default="data/flickr8k")
    ap.add_argument("--captions-file", default=None)
    ap.add_argument("--output-dir", default="saved_models")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--resume-from", default=None)
    args = ap.parse_args()
    from imagecaptioner_tpu.core.runtime import enable_compile_cache

    enable_compile_cache()
    train(args.data_root, args.captions_file, args.output_dir,
          num_epochs=args.epochs, seed=args.seed,
          resume_from=args.resume_from)


if __name__ == "__main__":
    main()
