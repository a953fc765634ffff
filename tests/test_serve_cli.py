"""Batch-captioning CLI (eval/serve.py): teacher beam and student greedy
over an image directory, with the int8 and trailing-partial-batch paths."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecaptioner_tpu.core.config import TeacherConfig, compact_student_config
from imagecaptioner_tpu.data.vocabulary import Vocabulary
from imagecaptioner_tpu.eval import serve
from imagecaptioner_tpu.models import student as SM
from imagecaptioner_tpu.models import teacher as TM
from imagecaptioner_tpu.utils import checkpoint as CKPT


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    vocab = Vocabulary(freq_threshold=1)
    vocab.build_vocabulary(["a dog runs fast", "a cat sits still"])
    vocab.save(str(root / "vocab.json"))
    V = len(vocab)

    t_kw = dict(embed_size=32, num_heads=4, num_decoder_layers=2, dropout=0.0,
                encoder_dim=24, encoder_depth=2, encoder_heads=3,
                patch_size=16, image_size=32)
    t_cfg = TeacherConfig(vocab_size=V, **t_kw)
    tp = TM.teacher_init(jax.random.PRNGKey(0), t_cfg)
    CKPT.save_checkpoint(str(root / "teacher.npz"), dict(
        model_state_dict=dict(params=tp, model_state={}),
        vocab_size=V, model_config=t_kw))

    s_cfg = compact_student_config(V, embed_size=16, hidden_size=16,
                                   dropout=0.0, image_size=32)
    sp, ss = SM.student_init(jax.random.PRNGKey(1), s_cfg)
    CKPT.save_checkpoint(str(root / "student.npz"), dict(
        student_state_dict=dict(params=sp, model_state=ss),
        vocab_size=V,
        model_config=dict(embed_size=16, hidden_size=16, num_layers=1,
                          dropout=0.0, use_attention_refinement=False,
                          image_size=32, model_type="compact")))

    imgdir = root / "imgs"
    imgdir.mkdir()
    from PIL import Image

    rng = np.random.default_rng(0)
    for i in range(5):  # 5 images: batch 4 leaves a trailing partial batch
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                        .astype("uint8")).save(imgdir / f"im{i}.png")
    return root


def _read(path):
    return [json.loads(ln) for ln in open(path)]


def test_serve_student_greedy(artifacts):
    out = str(artifacts / "student.jsonl")
    rc = serve.main([
        "--model", "student", "--checkpoint", str(artifacts / "student.npz"),
        "--vocab", str(artifacts / "vocab.json"),
        "--images", str(artifacts / "imgs"), "--out", out,
        "--batch", "4", "--max-length", "6"])
    assert rc == 0
    rows = _read(out)
    assert len(rows) == 5
    assert {r["image"] for r in rows} == {f"im{i}.png" for i in range(5)}
    assert all(isinstance(r["caption"], str) for r in rows)


def test_serve_teacher_beam_int8(artifacts):
    out = str(artifacts / "teacher.jsonl")
    rc = serve.main([
        "--model", "teacher", "--checkpoint", str(artifacts / "teacher.npz"),
        "--vocab", str(artifacts / "vocab.json"),
        "--images", str(artifacts / "imgs"), "--out", out,
        "--batch", "4", "--max-length", "6", "--beam-size", "3", "--int8"])
    assert rc == 0
    rows = _read(out)
    assert len(rows) == 5


def test_serve_teacher_int8_full_static_calibration(artifacts):
    """--int8-full --int8-calibrate: static scales baked from the model's
    OWN greedy-decoded tokens for the calibration images (ADVICE r3: the
    placeholder all-ones caption batch calibrated the decoder on
    activations beam decode never sees)."""
    out = str(artifacts / "teacher_int8_static.jsonl")
    rc = serve.main([
        "--model", "teacher", "--checkpoint", str(artifacts / "teacher.npz"),
        "--vocab", str(artifacts / "vocab.json"),
        "--images", str(artifacts / "imgs"), "--out", out,
        "--batch", "4", "--max-length", "6", "--beam-size", "3",
        "--int8-full", "--int8-calibrate", "2"])
    assert rc == 0
    assert len(_read(out)) == 5


def test_serve_student_int8_matches_layout(artifacts):
    """--int8 runs end-to-end through the same CLI (quantized encoder)."""
    out = str(artifacts / "student_int8.jsonl")
    rc = serve.main([
        "--model", "student", "--checkpoint", str(artifacts / "student.npz"),
        "--vocab", str(artifacts / "vocab.json"),
        "--images", str(artifacts / "imgs"), "--out", out,
        "--batch", "5", "--max-length", "6", "--int8"])
    assert rc == 0
    assert len(_read(out)) == 5
