"""Checkpoint-resume: continuing a run restores params/optimizer and
progresses epochs (capability the reference lacks, SURVEY §5.3)."""

import json

import jax.numpy as jnp
import pytest

from imagecaptioner_tpu.core.config import TeacherTrainConfig

TINY = dict(embed_size=32, num_heads=4, num_decoder_layers=2, dropout=0.0,
            encoder_dim=24, encoder_depth=2, encoder_heads=3)


def test_teacher_resume(tmp_path):
    from imagecaptioner_tpu.data.synthetic import make_synthetic_dataset
    from imagecaptioner_tpu.train.train_teacher import train

    data = tmp_path / "data"
    data.mkdir()
    make_synthetic_dataset(str(data), n_images=16, captions_per_image=1,
                           image_size=64, seed=0)
    out = str(tmp_path / "m")
    cfg = TeacherTrainConfig(batch_size=8, accumulation_steps=1, num_epochs=2,
                             validate_every=1)
    train(str(data), output_dir=out, train_cfg=cfg,
          teacher_cfg_overrides=TINY, image_size=64, max_caption_len=16,
          compute_dtype=jnp.float32, max_steps_per_epoch=1, verbose=False)
    hist1 = json.load(open(f"{out}/training_history.json"))
    assert len(hist1["train_losses"]) == 2

    # resume from the final checkpoint for 2 more epochs
    from dataclasses import replace

    state, t_cfg, vocab = train(
        str(data), output_dir=out, train_cfg=replace(cfg, num_epochs=4),
        teacher_cfg_overrides=TINY, image_size=64, max_caption_len=16,
        compute_dtype=jnp.float32, max_steps_per_epoch=1,
        resume_from=f"{out}/final_teacher_model.npz", verbose=False)
    hist2 = json.load(open(f"{out}/training_history.json"))
    # resumed run starts at epoch 3 (final ckpt records epoch=num_epochs)
    assert len(hist2["train_losses"]) >= 1
    assert int(state.opt_state.step) > 0
