"""int8 PTQ serving path (ops/quant.py): quantization math, the conv/dense
dispatch on ``weight_q`` dicts, and end-to-end encoder accuracy bounds.

Beyond-reference capability (the reference serves fp16-AMP at best): the
serving encoders run int8 on the MXU, opt-in, with the decoders kept float.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecaptioner_tpu.core import modules as M
from imagecaptioner_tpu.ops import quant as Q

V = 64


def test_weight_quant_per_channel_bound():
    w = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 3, 3)) * \
        jnp.arange(1, 9).reshape(8, 1, 1, 1)  # very different channel scales
    w_q, scale = Q.quantize_weight_int8(w)
    assert w_q.dtype == jnp.int8 and scale.shape == (8,)
    deq = w_q.astype(jnp.float32) * scale.reshape(8, 1, 1, 1)
    # symmetric round-to-nearest: per-channel error <= scale/2
    err = jnp.max(jnp.abs(deq - w), axis=(1, 2, 3))
    assert bool(jnp.all(err <= scale / 2 + 1e-6))


def test_activation_quant_dynamic_per_example():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 5, 3)) * 7.3
    # example 1 has 10x the range of example 0: per-example scales differ
    x = x * jnp.asarray([1.0, 10.0]).reshape(2, 1, 1, 1)
    x_q, s = Q.quantize_activation_int8(x)
    assert x_q.dtype == jnp.int8 and s.shape == (2, 1, 1, 1)
    assert float(s[1, 0, 0, 0]) > 5 * float(s[0, 0, 0, 0])
    err = jnp.max(jnp.abs(x_q.astype(jnp.float32) * s - x),
                  axis=(1, 2, 3), keepdims=True)
    assert bool(jnp.all(err <= s / 2 + 1e-6))
    # all-zero input: scale stays finite
    zq, zs = Q.quantize_activation_int8(jnp.zeros((4, 4)))
    assert bool(jnp.all(zs == 1.0)) and not bool(jnp.any(zq))


def test_conv2d_dispatches_on_weight_q():
    key = jax.random.PRNGKey(2)
    p = M.conv2d_init(key, 16, 32, 3)
    x = jax.random.normal(key, (2, 8, 8, 16))
    ref = M.conv2d(p, x, stride=1, padding=1)
    pq = Q.quantize_params_int8(p, min_elements=1)
    assert "weight_q" in pq and "weight" not in pq
    out = M.conv2d(pq, x, stride=1, padding=1)  # same entry point
    direct = Q.conv2d_int8(pq, x, stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               rtol=0, atol=0)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_grouped_conv_int8_matches_float():
    """Depthwise convs (MobileNet/EfficientNet) quantize correctly."""
    key = jax.random.PRNGKey(3)
    C = 32
    p = M.conv2d_init(key, C, C, 3, groups=C)
    x = jax.random.normal(key, (2, 8, 8, C))
    ref = M.conv2d(p, x, stride=1, padding=1, groups=C)
    pq = Q.quantize_params_int8(p, min_elements=1)
    out = M.conv2d(pq, x, stride=1, padding=1, groups=C)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel


def test_dense_dispatches_on_weight_q():
    key = jax.random.PRNGKey(4)
    p = M.linear_init(key, 64, 128)
    x = jax.random.normal(key, (5, 64))
    ref = M.dense(p, x)
    pq = Q.quantize_params_int8(p, min_elements=1)
    out = M.dense(pq, x)
    rel = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel
    # bf16 activations keep their dtype through the int8 path
    out16 = M.dense(pq, x.astype(jnp.bfloat16))
    assert out16.dtype == jnp.bfloat16


def test_small_and_nonmatrix_leaves_pass_through():
    tree = {
        "tiny": M.linear_init(jax.random.PRNGKey(5), 4, 4),       # 16 elems
        "norm": M.layer_norm_init(8),
        "big": M.linear_init(jax.random.PRNGKey(6), 128, 64),
    }
    q = Q.quantize_params_int8(tree)  # default threshold
    assert "weight" in q["tiny"] and "weight_q" not in q["tiny"]
    assert "weight_q" in q["big"]
    assert Q.count_quantized(q) == 1
    # input tree untouched
    assert "weight" in tree["big"]
    # bf16 trees quantize too (bench.py casts params bf16 before quantizing)
    bf = jax.tree.map(lambda x: x.astype(jnp.bfloat16), tree)
    qbf = Q.quantize_params_int8(bf)
    assert qbf["big"]["weight_q"].dtype == jnp.int8
    assert qbf["big"]["w_scale"].dtype == jnp.float32


@pytest.mark.parametrize("variant", ["full", "compact"])
def test_student_encoder_int8_accuracy_and_decode(variant):
    """Quantized encoder features stay within a few percent of f32 and the
    greedy decode still runs end-to-end through the unchanged entry points.
    (Measured at random init: full 1.8%, compact ~3%; bound is loose.)"""
    from imagecaptioner_tpu.core.config import (compact_student_config,
                                                full_student_config)
    from imagecaptioner_tpu.models import student as SM
    from imagecaptioner_tpu.ops import decode as D

    factory = (full_student_config if variant == "full"
               else compact_student_config)
    cfg = factory(V, dropout=0.0, image_size=64)
    p, s = SM.student_init(jax.random.PRNGKey(0), cfg)
    pq = Q.quantize_student_encoder_int8(p)
    assert Q.count_quantized(pq) >= 20
    # decoder/refinement/projection stay float
    assert Q.count_quantized({"d": pq["decoder"]}) == 0
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64)) * 0.5
    _, ref_f, _ = SM.encode_image(p, s, x, cfg, train=False)
    _, ref_q, _ = SM.encode_image(pq, s, x, cfg, train=False)
    rel = float(jnp.linalg.norm(ref_q - ref_f) / jnp.linalg.norm(ref_f))
    assert rel < 0.10, rel
    toks = D.greedy_decode_student(pq, ref_q, cfg, max_length=6)
    assert toks.shape == (2, 6)
    assert bool(jnp.all((toks >= 0) & (toks < V)))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_int8_composes_with_dp_serving():
    """Quantized params replicate over the mesh and the DP-sharded greedy
    captioner is token-identical to single-device int8: per-EXAMPLE
    activation scales reduce shard-locally, so GSPMD partitioning over the
    data axis changes nothing."""
    from imagecaptioner_tpu.core import mesh as MS
    from imagecaptioner_tpu.core.config import compact_student_config
    from imagecaptioner_tpu.eval import serving as SV
    from imagecaptioner_tpu.models import student as SM
    from imagecaptioner_tpu.ops import decode as D

    cfg = compact_student_config(V, embed_size=16, hidden_size=16,
                                 dropout=0.0, image_size=64)
    p, s = SM.student_init(jax.random.PRNGKey(0), cfg)
    pq = Q.quantize_student_encoder_int8(p)
    images = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 64, 64))

    mesh = MS.create_mesh(shape=(8, 1))
    fn = SV.make_dp_greedy_captioner(pq, s, cfg, mesh, max_length=8)
    toks_dp = np.asarray(jax.device_get(fn(images)))

    _, refined, _ = SM.encode_image(pq, s, images, cfg, train=False)
    toks = np.asarray(jax.device_get(D.greedy_decode_student(
        pq, refined, cfg, max_length=8)))
    np.testing.assert_array_equal(toks_dp, toks)


def test_teacher_encoder_int8_accuracy():
    from imagecaptioner_tpu.core.config import TeacherConfig
    from imagecaptioner_tpu.models import teacher as TM

    cfg = TeacherConfig(vocab_size=V, embed_size=64, num_heads=4,
                        num_decoder_layers=1, dropout=0.0, encoder_dim=48,
                        encoder_depth=2, encoder_heads=4, image_size=64)
    p = TM.teacher_init(jax.random.PRNGKey(0), cfg)
    pq = Q.quantize_teacher_encoder_int8(p)
    assert Q.count_quantized(pq) >= 4  # patch embed + block projections
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64)) * 0.5
    m_f = TM.encode_image(p, img, cfg)
    m_q = TM.encode_image(pq, img, cfg)
    rel = float(jnp.linalg.norm(m_q - m_f) / jnp.linalg.norm(m_f))
    assert rel < 0.10, rel


def test_mha_in_proj_int8_dispatch():
    """mha=True rewrites packed in_proj matrices; the modules MHA and the
    transformer decode-step projections dispatch on the new keys and stay
    within int8 error of float.  _proj_q must equal _proj_qkv[0] exactly in
    the int8 path too (same x quantization, same weight rows)."""
    from imagecaptioner_tpu.models import transformer as TD

    E = 64
    p = M.mha_init(jax.random.PRNGKey(7), E)
    # give the zero-init biases some signal so the bias path is exercised
    p["in_proj_bias"] = 0.1 * jax.random.normal(jax.random.PRNGKey(8), (3 * E,))
    pq = Q.quantize_params_int8(p, min_elements=1, mha=True)
    assert "in_proj_weight_q" in pq and "in_proj_weight" not in pq
    assert pq["in_proj_scale"].shape == (3 * E,)
    assert "weight_q" in pq["out_proj"]  # nested dense still rewritten
    assert Q.count_quantized(pq) == 2
    # mha=False (the default) leaves in_proj alone
    pq0 = Q.quantize_params_int8(p, min_elements=1)
    assert "in_proj_weight" in pq0

    x = jax.random.normal(jax.random.PRNGKey(9), (2, 5, E))
    out_f, _ = M.multi_head_attention(p, x, x, x, num_heads=4)
    out_q, _ = M.multi_head_attention(pq, x, x, x, num_heads=4)
    rel = float(jnp.linalg.norm(out_q - out_f) / jnp.linalg.norm(out_f))
    assert rel < 0.10, rel

    q3, k3, v3 = TD._proj_qkv(pq, x)
    qf, kf, vf = TD._proj_qkv(p, x)
    for a, b in ((q3, qf), (k3, kf), (v3, vf)):
        rel = float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))
        assert rel < 0.05, rel
    np.testing.assert_array_equal(np.asarray(TD._proj_q(pq, x)),
                                  np.asarray(q3))


def test_teacher_full_int8_logits_and_beam():
    """quantize_teacher_full_int8 quantizes the transformer decoder (packed
    in_proj included) and the vocab head; full-forward logits stay within a
    few percent and the packed beam search runs end-to-end through the
    cached decode step's int8 dispatch."""
    from imagecaptioner_tpu.core.config import TeacherConfig
    from imagecaptioner_tpu.models import teacher as TM
    from imagecaptioner_tpu.ops import decode as D

    cfg = TeacherConfig(vocab_size=V, embed_size=64, num_heads=4,
                        num_decoder_layers=2, dropout=0.0, encoder_dim=48,
                        encoder_depth=2, encoder_heads=4, image_size=64)
    p = TM.teacher_init(jax.random.PRNGKey(0), cfg)
    pq = Q.quantize_teacher_full_int8(p)
    # encoder-only arm leaves the decoder float; the full arm quantizes it
    enc_only = Q.quantize_teacher_encoder_int8(p)
    assert Q.count_quantized({"d": enc_only["decoder"]}) == 0
    n_dec = Q.count_quantized({"d": pq["decoder"]})
    assert n_dec >= 2 * 4  # per layer: self in_proj+out, cross in_proj, FFN
    assert "weight_q" in pq["fc_out"]

    img = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64)) * 0.5
    caps = jax.random.randint(jax.random.PRNGKey(2), (6, 2), 1, V)
    lf = TM.teacher_apply(p, img, caps, cfg)
    lq = TM.teacher_apply(pq, img, caps, cfg)
    rel = float(jnp.linalg.norm(lq - lf) / jnp.linalg.norm(lf))
    assert rel < 0.15, rel

    mem = TM.encode_image(pq, img, cfg)
    seqs, scores, lens = D.beam_search_teacher_packed(
        pq, mem, cfg, max_length=6, beam_size=3)
    assert seqs.shape[:2] == (2, 3)
    assert bool(jnp.all((seqs >= 0) & (seqs < V)))
    assert bool(jnp.all(jnp.isfinite(scores[:, 0])))


def _count_static_scales(tree) -> int:
    n = 0

    def walk(p):
        nonlocal n
        if isinstance(p, dict):
            if "x_scale" in p or "in_proj_x_scale" in p:
                n += 1
            for v in p.values():
                walk(v)
        elif isinstance(p, (list, tuple)):
            for v in p:
                walk(v)

    walk(tree)
    return n


def test_calibrated_static_scales_student():
    """calibrate_activation_scales bakes a static x_scale into every
    quantized layer the calibration forward touches; the static path stays
    within int8 error of float, jits, and the input (dynamic) tree is left
    untouched.  On the calibration batch itself, static scales equal the
    dynamic per-example scale of the worst example, so features move only
    by quantization-grid rounding."""
    from imagecaptioner_tpu.core.config import full_student_config
    from imagecaptioner_tpu.models import student as SM

    cfg = full_student_config(V, dropout=0.0, image_size=64)
    p, s = SM.student_init(jax.random.PRNGKey(0), cfg)
    pq = Q.quantize_student_encoder_int8(p)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64)) * 0.5

    pc = Q.calibrate_activation_scales(
        pq, lambda q: SM.encode_image(q, s, x, cfg, train=False))
    n_q = Q.count_quantized(pc)
    assert _count_static_scales(pc) == n_q and n_q >= 20
    assert _count_static_scales(pq) == 0  # input tree untouched

    _, ref_f, _ = SM.encode_image(p, s, x, cfg, train=False)
    _, ref_c, _ = SM.encode_image(pc, s, x, cfg, train=False)
    rel = float(jnp.linalg.norm(ref_c - ref_f) / jnp.linalg.norm(ref_f))
    assert rel < 0.10, rel

    # static path compiles (no concretization of x_scale at trace time)
    f = jax.jit(lambda q, xx: SM.encode_image(q, s, xx, cfg, train=False)[1])
    out = f(pc, x)
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))

    # margin scales every baked value
    pm = Q.calibrate_activation_scales(
        pq, lambda q: SM.encode_image(q, s, x, cfg, train=False), margin=2.0)

    def collect(t, out):
        if isinstance(t, dict):
            if "x_scale" in t:
                out.append(np.asarray(t["x_scale"]))
            for v in t.values():
                collect(v, out)
        elif isinstance(t, (list, tuple)):
            for v in t:
                collect(v, out)
        return out

    ones, twos = collect(pc, []), collect(pm, [])
    assert len(ones) == len(twos) > 0
    np.testing.assert_allclose(np.asarray(twos), 2.0 * np.asarray(ones),
                               rtol=1e-6)


def test_calibrated_static_scales_teacher_mha():
    """Packed MHA in_proj dicts gain in_proj_x_scale (recorded against the
    PACKED weight across the q/k/v inputs) and the full-int8 teacher forward
    + packed beam still run within error bounds on the static path."""
    from imagecaptioner_tpu.core.config import TeacherConfig
    from imagecaptioner_tpu.models import teacher as TM
    from imagecaptioner_tpu.ops import decode as D

    cfg = TeacherConfig(vocab_size=V, embed_size=64, num_heads=4,
                        num_decoder_layers=2, dropout=0.0, encoder_dim=48,
                        encoder_depth=2, encoder_heads=4, image_size=64)
    p = TM.teacher_init(jax.random.PRNGKey(0), cfg)
    pq = Q.quantize_teacher_full_int8(p)
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64)) * 0.5
    caps = jax.random.randint(jax.random.PRNGKey(2), (6, 2), 1, V)

    pc = Q.calibrate_activation_scales(
        pq, lambda q: TM.teacher_apply(q, img, caps, cfg))

    def has_in_proj_scale(t):
        if isinstance(t, dict):
            if "in_proj_x_scale" in t:
                return True
            return any(has_in_proj_scale(v) for v in t.values())
        if isinstance(t, (list, tuple)):
            return any(has_in_proj_scale(v) for v in t)
        return False

    assert has_in_proj_scale(pc["decoder"])
    # the teacher-forward calibration reaches every quantized layer
    assert _count_static_scales(pc) == Q.count_quantized(pc)

    lf = TM.teacher_apply(p, img, caps, cfg)
    lc = TM.teacher_apply(pc, img, caps, cfg)
    rel = float(jnp.linalg.norm(lc - lf) / jnp.linalg.norm(lf))
    assert rel < 0.15, rel

    mem = TM.encode_image(pc, img, cfg)
    seqs, scores, lens = D.beam_search_teacher_packed(
        pc, mem, cfg, max_length=6, beam_size=3)
    assert seqs.shape[:2] == (2, 3)
    assert bool(jnp.all(jnp.isfinite(scores[:, 0])))


def test_calibration_refuses_traced_forward():
    from imagecaptioner_tpu.core.config import compact_student_config
    from imagecaptioner_tpu.models import student as SM

    cfg = compact_student_config(V, dropout=0.0, image_size=64)
    p, s = SM.student_init(jax.random.PRNGKey(0), cfg)
    pq = Q.quantize_student_encoder_int8(p)
    x = jnp.zeros((2, 3, 64, 64))
    # disable_jit() makes jit a no-op, but vmap still traces — a transformed
    # forward hands the recorder a tracer: that must be a loud error, not
    # silently-missing scales
    vf = jax.vmap(
        lambda xx: SM.encode_image(pq, s, xx[None], cfg, train=False)[1])
    with pytest.raises(RuntimeError, match="eagerly"):
        Q.calibrate_activation_scales(pq, lambda q: vf(x))
