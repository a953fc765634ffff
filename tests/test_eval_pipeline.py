"""Evaluators, report schemas, demo path, pipeline prereq checks."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecaptioner_tpu.core.config import TeacherConfig, full_student_config
from imagecaptioner_tpu.data.synthetic import make_synthetic_dataset
from imagecaptioner_tpu.data.dataset import CaptionDataset
from imagecaptioner_tpu.data.vocabulary import Vocabulary
from imagecaptioner_tpu.eval import metrics as MET
from imagecaptioner_tpu.eval.evaluate_student import (
    StudentEvaluator, load_student_evaluator)
from imagecaptioner_tpu.eval.evaluate_teacher import (
    CaptionEvaluator, load_teacher_evaluator)
from imagecaptioner_tpu.eval.latency import measure_inference_time
from imagecaptioner_tpu.models import student as SM
from imagecaptioner_tpu.models import teacher as TM
from imagecaptioner_tpu.utils import checkpoint as CKPT

TINY = dict(embed_size=32, num_heads=4, num_decoder_layers=2, dropout=0.0,
            encoder_dim=24, encoder_depth=2, encoder_heads=3, image_size=64,
            patch_size=16)


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """Random-init teacher+student checkpoints + synthetic data + vocab."""
    root = tmp_path_factory.mktemp("evalwork")
    data = root / "data"
    data.mkdir()
    make_synthetic_dataset(str(data), n_images=8, captions_per_image=2,
                           image_size=64, seed=0)
    ds = CaptionDataset(str(data), str(data / "captions_clean.csv"),
                        freq_threshold=2, image_size=64)
    vocab = ds.vocab
    out = root / "saved_models"
    out.mkdir()
    vocab.save(str(out / "vocab.json"))

    t_cfg = TeacherConfig(vocab_size=len(vocab), **TINY)
    t_p = TM.teacher_init(jax.random.PRNGKey(0), t_cfg)
    CKPT.save_checkpoint(str(out / "best_teacher_model.npz"), dict(
        epoch=0, model_state_dict=dict(params=t_p, model_state={}),
        optimizer_state_dict={}, scheduler_state_dict={}, val_loss=1.0,
        vocab_size=len(vocab),
        model_config=dict(embed_size=32, num_heads=4, num_decoder_layers=2,
                          dropout=0.0, encoder_dim=24, encoder_depth=2,
                          encoder_heads=3, encoder_mlp_ratio=4.0,
                          patch_size=16, image_size=64)))

    s_cfg = full_student_config(len(vocab), embed_size=16, hidden_size=24,
                                dropout=0.0)
    s_p, s_s = SM.student_init(jax.random.PRNGKey(1), s_cfg)
    CKPT.save_checkpoint(str(out / "best_student_model.npz"), dict(
        epoch=0, student_state_dict=dict(params=s_p, model_state=s_s),
        projectors_state_dict={}, optimizer_state_dict={},
        val_loss=1.0, val_bleu=0.0, vocab_size=len(vocab),
        model_config=dict(embed_size=16, hidden_size=24, num_layers=2,
                          dropout=0.0)))
    return root, out, ds, vocab, t_cfg, s_cfg


def test_metrics_edge_cases():
    assert MET.bleu_n([], ["a"], 1) == 0.0
    assert MET.bleu_n(["a"], [], 1) == 0.0
    assert MET.bleu_n(["a", "b"], ["a", "b"], 2) == 1.0
    assert MET.bleu_n(["a"], ["a", "b"], 2) == 0.0  # cand shorter than n
    assert MET.meteor_f1(["a", "b"], ["a", "b"]) == 1.0
    assert MET.meteor_f1([], ["a"]) == 0.0
    assert MET.meteor_f1(["x"], ["a"]) == 0.0

    class V:
        itos = {0: "<PAD>", 1: "<START>", 2: "<END>", 4: "dog", 5: "runs"}

    assert MET.monitoring_bleu([4, 5, 2], [4, 2, 0], V()) == 1.0
    assert MET.monitoring_bleu([5], [4], V()) == 0.0


def test_teacher_evaluator_report(artifacts, tmp_path):
    root, out, ds, vocab, t_cfg, _ = artifacts
    ev = load_teacher_evaluator(str(out / "best_teacher_model.npz"),
                                str(out / "vocab.json"))
    assert ev.cfg.image_size == 64
    report = ev.generate_report(ds, str(tmp_path / "evaluation_report.json"),
                                max_samples=3, verbose=False)
    assert set(report) >= {"num_samples", "bleu1", "bleu2", "meteor",
                           "length_stats", "diversity", "samples",
                           "success_rate"}
    assert report["num_samples"] == 3
    saved = json.load(open(tmp_path / "evaluation_report.json"))
    assert saved["bleu1"] == report["bleu1"]


def test_student_evaluator_comparison_report(artifacts, tmp_path):
    root, out, ds, vocab, t_cfg, s_cfg = artifacts
    ev = load_student_evaluator(str(out / "best_student_model.npz"),
                                str(out / "best_teacher_model.npz"),
                                str(out / "vocab.json"))
    report = ev.generate_comparison_report(
        ds, str(tmp_path / "student_vs_teacher_report.json"),
        max_samples=2, measure_latency_samples=1, verbose=False)
    assert set(report["summary"]) >= {
        "bleu1_ratio", "speedup", "compression_ratio",
        "student_parameters", "teacher_parameters"}
    assert report["student"]["success_rate"] == 1.0
    assert report["teacher"]["success_rate"] == 1.0
    assert len(report["sample_comparisons"]) == 2
    for row in report["sample_comparisons"]:
        assert {"reference", "student", "teacher"} <= set(row)


def test_latency_harness():
    import jax.numpy as jnp

    f = jax.jit(lambda x: (x * x).sum())
    stats = measure_inference_time(
        f, lambda i: jnp.full((32, 32), float(i)), num_runs=5, warmup=2)
    assert stats["num_runs"] == 5
    assert stats["min_s"] <= stats["p50_s"] <= stats["max_s"]


def test_steady_state_estimator():
    """Median-marginal estimator + physics guard (core/timing.py)."""
    import jax.numpy as jnp

    from imagecaptioner_tpu.core import timing

    f = jax.jit(lambda x: (x * 2.0).sum())
    stats = timing.steady_state(f, lambda i: jnp.full((8, 8), float(i)),
                                n_small=2, n_large=4, pairs=3)
    assert stats["per_call_marginal"] > 0
    assert stats["per_call_total"] > 0
    assert len(stats["raw"]) == 3

    # guard: an impossible marginal rate must not survive as the headline
    fake = {"per_call_marginal": 1e-12, "per_call_total": 1e-3,
            "raw": []}
    g = timing.guarded_rate(fake, items_per_call=1.0, flops_per_item=4.1e9)
    assert g["items_per_sec"] <= timing.physics_max_rate(4.1e9)
    assert "physics" in g["estimator"] or "total_based" in g["estimator"]


def test_relay_calibration_probe():
    """The relay-health probe runs (tiny dims on CPU) and returns ms > 0."""
    from imagecaptioner_tpu.core import timing

    ms = timing.relay_calibration(trials=1, chain=2, dim=64)
    assert ms > 0.0


def test_streamlit_demo_cli(artifacts):
    root, out, ds, vocab, t_cfg, _ = artifacts
    import streamlit_app as APP

    res = APP.demo_caption_image(
        os.path.join(str(root / "data"), "Images", "img_0000.jpg"),
        checkpoint_path=str(out / "best_teacher_model.npz"),
        vocab_path=str(out / "vocab.json"))
    assert set(res) == {"teacher", "student"}
    assert isinstance(res["teacher"], str)
    assert isinstance(res["student"], str)


def test_pipeline_prereq_checks(artifacts, capsys):
    root, out, *_ = artifacts
    import run_kd_pipeline as P

    ok = P.check_prerequisites(str(out / "best_teacher_model.npz"),
                               str(root / "data"),
                               str(root / "data" / "captions_clean.csv"))
    assert ok
    bad = P.check_prerequisites(str(out / "missing.npz"), str(root / "data"),
                                str(root / "data" / "captions_clean.csv"))
    assert not bad


def test_load_student_evaluator_enhanced_dispatch(artifacts, tmp_path):
    """An 'enhanced' checkpoint must reconstruct the enhanced architecture
    (round-1 VERDICT: it silently fell back to full_student_config)."""
    from imagecaptioner_tpu.core.config import enhanced_student_config

    root, out, ds, vocab, t_cfg, _ = artifacts
    e_cfg = enhanced_student_config(len(vocab), embed_size=16, hidden_size=24,
                                    num_layers=2, dropout=0.0)
    e_p, e_s = SM.student_init(jax.random.PRNGKey(3), e_cfg)
    ckpt = tmp_path / "best_student_model.npz"
    CKPT.save_checkpoint(str(ckpt), dict(
        epoch=0, student_state_dict=dict(params=e_p, model_state=e_s),
        projectors_state_dict={}, optimizer_state_dict={},
        val_loss=1.0, val_bleu=0.0, vocab_size=len(vocab),
        model_config=dict(embed_size=16, hidden_size=24, num_layers=2,
                          dropout=0.0, use_attention_refinement=True,
                          model_type="enhanced")))
    ev = load_student_evaluator(str(ckpt),
                                str(out / "best_teacher_model.npz"),
                                str(out / "vocab.json"))
    assert ev.s_cfg.variant == "enhanced"
    assert ev.s_cfg.feature_tokens == 64
    img_u8, _ = ds[0]
    from imagecaptioner_tpu.data import transforms as T
    image = T.normalize(jnp.asarray(img_u8)[None])
    cap = ev.student_caption(image, max_length=5)
    assert isinstance(cap, str)


def test_teacher_evaluator_batched_matches_per_image(artifacts):
    """The batched evaluate_on_dataset (packed beam, eval_batch per
    dispatch) must report the same captions/metrics as a per-image loop —
    token parity packed-vs-single is the contract (test_beam_batched.py)."""
    import jax.numpy as jnp

    from imagecaptioner_tpu.data import transforms as T

    root, out, ds, vocab, t_cfg, _ = artifacts
    ev = load_teacher_evaluator(str(out / "best_teacher_model.npz"),
                                str(out / "vocab.json"))
    rep = ev.evaluate_on_dataset(ds, max_samples=6, eval_batch=4,
                                 verbose=False)
    per_image = []
    for i in range(6):
        img_u8, cap_ids = ds[i]
        per_image.append(ev.caption_image(
            T.normalize(jnp.asarray(img_u8)[None]))[0])
    got = [s["generated"] for s in rep["samples"]]
    assert got == per_image
    assert rep["num_samples"] == 6 and rep["success_rate"] == 1.0
