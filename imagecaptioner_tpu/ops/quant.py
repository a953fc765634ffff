"""Post-training int8 quantization for the serving encoders.

Why: the greedy serving headline is a ResNet-50 forward that already runs at
the bf16 conv roofline (112 TF/s measured on-chip vs the rig's ~125 TF/s
bf16 calibration — benchmarks/serving_hlo_profile.json), so the one
remaining order-unity serving lever on this hardware is the MXU's int8 path
(v5e: 394 int8 TOPS vs 197 bf16 TFLOP/s).  The reference has no analogue
(fp16 AMP only, SURVEY §2.9 N5); this is a beyond-parity, opt-in serving
mode.

Scheme (dynamic PTQ, no calibration set needed):
  * weights: symmetric per-OUTPUT-CHANNEL int8, scale = amax(|w|, axis=in)/127
    (torch layouts: conv OIHW -> axis O; dense (out, in) -> axis out)
  * activations: symmetric per-TENSOR int8, scale computed on the fly
    (one amax reduce per layer — negligible next to the conv)
  * accumulate int8 x int8 -> int32 on the MXU, dequantize with
    s_x * s_w[o], add the f32 bias, return in the activation float dtype

Integration: :func:`quantize_params_int8` rewrites ``{"weight": w}`` param
dicts in place of selected conv/dense leaves to ``{"weight_q": int8,
"w_scale": f32}``; ``core.modules.conv2d`` / ``dense`` dispatch on the
``weight_q`` key, so every backbone (ResNet-50 / MobileNetV2 /
EfficientNet-B3 / ViT) serves quantized without touching its apply code.
Training paths never see quantized trees (the transform is applied to a
serving copy of the params).

BatchNorm, LayerNorm, biases, and the LSTM decoders stay in float: the
decoders are Pallas-kernel territory and numerically load-bearing
(argmax over near-tie logits), while the encoder's conv stack is where all
the FLOPs are (serving_hlo_profile.json: 2.30 of 2.61 ms).

The TEACHER's transformer decoder can also be quantized
(:func:`quantize_teacher_full_int8`): its beam decode loop re-reads every
decoder weight each token step (~24 MB bf16/step at the 512/8/4 config —
in_proj + out_proj + FFN x4 layers + the vocab head) and the loop is
HBM-bound (benchmarks/beam_byte_ledger.json), so int8 halves that traffic
term.  MEASURED OUTCOME: the arm is SLOWER end to end at every recorded
shape (dynamic beam 2,294 vs 2,617 img/s; static decode loop 1.99 vs
1.83 ms at N=8) — the added quant/dequant ops outweigh the byte saving at
the beam's tiny (N*K, E) per-step shapes — so it stays opt-in and is NOT
the recommended serving mode; the greedy ENCODER arms are where int8 pays
(+24% with static scales, `greedy_int8_static`).  Packed MHA
``in_proj_weight`` matrices get their own keys (``in_proj_weight_q`` +
``in_proj_scale``; per-output-row scales stay q/k/v-consistent because
axis 0 is the packed output); ``transformer._proj_qkv``/``_proj_q`` and
``modules.multi_head_attention`` dispatch on them.  Embeddings, norms, and
the KV caches stay float.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

# weights smaller than this stay float: no measurable speedup, and the tiny
# layers (SE squeeze, 1x1 shortcuts at low channel counts) are where 8-bit
# noise is proportionally largest
MIN_QUANT_ELEMENTS = 4096


def quantize_weight_int8(w: jnp.ndarray):
    """Symmetric per-output-channel int8: returns (w_q int8, scale f32 (O,)).

    Works for conv OIHW (reduce over I,H,W) and dense (out, in) (reduce over
    in) — axis 0 is the output channel in both torch storage layouts
    (CLAUDE.md architecture invariant)."""
    w = w.astype(jnp.float32)
    reduce_axes = tuple(range(1, w.ndim))
    amax = jnp.max(jnp.abs(w), axis=reduce_axes)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    shaped = scale.reshape((-1,) + (1,) * (w.ndim - 1))
    w_q = jnp.clip(jnp.round(w / shaped), -127, 127).astype(jnp.int8)
    return w_q, scale


def quantize_activation_int8(x: jnp.ndarray):
    """Symmetric per-EXAMPLE dynamic int8: returns (x_q int8, scale f32
    (B, 1, ..., 1)).  Per-example rather than per-tensor for two reasons:
    tighter scales (an outlier image doesn't coarsen its batchmates'
    quantization), and under batch-over-'data' DP sharding the amax reduces
    shard-locally — no cross-device collective per quantized layer."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=tuple(range(1, x.ndim)), keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    x_q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return x_q, scale


def _quantize_activation(p: Dict, x: jnp.ndarray):
    """Dispatch: calibrated static ``x_scale`` when the dict carries one
    (cheap, producer-fusable), else dynamic per-example quantization.  Also
    feeds the calibration recorder when one is active."""
    record_calibration_amax(p["weight_q"], x)
    xs = p.get("x_scale")
    if xs is None:
        return quantize_activation_int8(x)
    xf = x.astype(jnp.float32)
    x_q = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    return x_q, xs


# ---------------------------------------------------------------------------
# Static (calibrated) activation scales
#
# The dynamic per-example quantization above costs one full extra HBM pass
# per quantized layer (amax reduce + rescale of the activation) — measured
# 484 us of the int8 greedy serve's 2,523 us (19%,
# benchmarks/serving_hlo_profile.json greedy_int8 "loop fusion"), which eats
# most of the int8 conv win.  A calibrated tree carries a per-layer static
# ``x_scale`` instead: the reduce_max pass disappears and the remaining
# clip(round(x/s)) is a producer-fusable elementwise op.
# Trade-off: per-TENSOR static scales are coarser than per-example dynamic
# ones and an out-of-calibration-range activation clips; validate quality
# per-checkpoint (scripts/bench_int8_quality.py --static).
# ---------------------------------------------------------------------------

_CALIB: Optional[dict] = None


def record_calibration_amax(w_ref, x) -> None:
    """Inside :func:`calibrate_activation_scales`, fold ``amax(|x|)`` into
    the record keyed by the identity of the weight array the activation is
    about to multiply; a no-op otherwise.  Must run EAGERLY (the calibration
    context wraps the forward in ``jax.disable_jit()``)."""
    if _CALIB is None:
        return
    try:
        amax = float(jnp.max(jnp.abs(x.astype(jnp.float32))))
    except (jax.errors.TracerArrayConversionError, jax.errors.ConcretizationTypeError):
        raise RuntimeError(
            "activation calibration saw a traced value — run the forward "
            "eagerly (calibrate_activation_scales wraps it in "
            "jax.disable_jit(); don't jit inside the `run` callback)")
    key = id(w_ref)
    if amax > _CALIB.get(key, 0.0):
        _CALIB[key] = amax


def calibrate_activation_scales(qtree, run, *, margin: float = 1.0):
    """Bake static activation scales into a quantized tree.

    ``run(qtree)`` must execute the serving forward(s) over a calibration
    batch (a handful of representative images); it runs EAGERLY under
    ``jax.disable_jit()`` so per-layer activation maxima are concrete — use
    the CPU backend for speed through the relay.  Returns a NEW tree where
    every quantized dict the forward touched gains ``x_scale`` (packed MHA
    dicts gain ``in_proj_x_scale``): scale = observed_amax * margin / 127.
    Layers the calibration forward never reached keep dynamic quantization.
    """
    global _CALIB
    if _CALIB is not None:
        raise RuntimeError("calibrate_activation_scales is not reentrant")
    _CALIB = {}
    try:
        with jax.disable_jit():
            run(qtree)
        rec = dict(_CALIB)
    finally:
        _CALIB = None

    def scale_of(amax: float):
        a = amax * margin
        return jnp.asarray(a / 127.0 if a > 0 else 1.0, jnp.float32)

    def walk(p):
        if isinstance(p, dict):
            out = {k: walk(v) for k, v in p.items()}
            if "weight_q" in p and id(p["weight_q"]) in rec:
                out["x_scale"] = scale_of(rec[id(p["weight_q"])])
            if "in_proj_weight_q" in p and id(p["in_proj_weight_q"]) in rec:
                out["in_proj_x_scale"] = scale_of(
                    rec[id(p["in_proj_weight_q"])])
            return out
        if isinstance(p, (list, tuple)):
            return type(p)(walk(v) for v in p)
        return p

    return walk(qtree)


def quantize_params_int8(tree, *, min_elements: Optional[int] = None,
                         mha: bool = False,
                         exclude: Tuple[str, ...] = ()):
    """Rewrite every conv/dense ``{"weight": ...}`` dict in ``tree`` to its
    int8 form ``{"weight_q", "w_scale", [bias]}``.  Returns a new tree; the
    input is not mutated.  Dicts whose weight is too small pass through
    unchanged, as do norms (1-D weights), LSTM packed weights (different
    keys), and EMBEDDINGS: a 2-D weight quantizes only when the dict also
    has a bias — every dense layer in this codebase does (torch nn.Linear
    defaults), while embedding dicts are bias-less and are consumed by
    ``modules.embedding``'s direct ``p["weight"]`` take, which an int8
    rewrite would break.

    ``mha=True`` additionally rewrites packed MHA ``in_proj_weight``
    matrices to ``in_proj_weight_q`` + ``in_proj_scale`` (the (3E,) scale
    vector splits into q/k/v thirds exactly like the weight rows);
    consumers dispatch on the ``in_proj_weight_q`` key.

    ``exclude``: dict keys whose subtrees stay FLOAT (e.g. ``("conv1",)``
    keeps a ResNet stem unquantized — the layer-exclusion arms of the
    static-int8 quality sweep, scripts/bench_int8_quality.py --exclude).
    """
    thr = MIN_QUANT_ELEMENTS if min_elements is None else min_elements

    def rewrite(p):
        if isinstance(p, dict):
            if exclude and any(k in exclude for k in p):
                return {k: (v if k in exclude else rewrite(v))
                        for k, v in p.items()}
            if (mha and "in_proj_weight" in p
                    and hasattr(p["in_proj_weight"], "ndim")
                    and p["in_proj_weight"].size >= thr):
                w_q, scale = quantize_weight_int8(p["in_proj_weight"])
                out = {k: rewrite(v) for k, v in p.items()
                       if k != "in_proj_weight"}
                out["in_proj_weight_q"] = w_q
                out["in_proj_scale"] = scale
                return out
            if ("weight" in p and hasattr(p["weight"], "ndim")
                    and (p["weight"].ndim == 4
                         or (p["weight"].ndim == 2 and "bias" in p))
                    and p["weight"].size >= thr):
                w_q, scale = quantize_weight_int8(p["weight"])
                out = {k: v for k, v in p.items() if k != "weight"}
                out["weight_q"] = w_q
                out["w_scale"] = scale
                return out
            return {k: rewrite(v) for k, v in p.items()}
        if isinstance(p, (list, tuple)):
            return type(p)(rewrite(v) for v in p)
        return p

    return rewrite(tree)


def count_quantized(tree) -> int:
    """Number of int8 weight leaves in a quantized tree (for logging/tests)."""
    n = 0

    def walk(p):
        nonlocal n
        if isinstance(p, dict):
            if "weight_q" in p or "in_proj_weight_q" in p:
                n += 1
            for v in p.values():
                walk(v)
        elif isinstance(p, (list, tuple)):
            for v in p:
                walk(v)

    walk(tree)
    return n


def quantize_student_encoder_int8(params, *, exclude: Tuple[str, ...] = ()):
    """Serving copy of a student param tree with the CNN ENCODER quantized
    (the conv stack is ~90% of serving device time); the refinement MHA,
    decoder, and projectors stay float.  ``exclude`` names encoder subtrees
    kept float (see quantize_params_int8)."""
    return dict(params,
                encoder=quantize_params_int8(params["encoder"],
                                             exclude=exclude))


def quantize_teacher_encoder_int8(params):
    """Serving copy of a teacher param tree with the ViT encoder (patch
    embed + block projections/MLPs) quantized; the transformer DECODER stays
    float.  This is the conservative arm (recorded quality:
    benchmarks/int8_quality.json); :func:`quantize_teacher_full_int8` also
    quantizes the decode loop's weights."""
    return dict(params, encoder=quantize_params_int8(params["encoder"]))


def quantize_teacher_full_int8(params):
    """Serving copy of a teacher param tree with encoder AND transformer
    decoder quantized, packed MHA in_proj matrices included.  Halves the
    beam loop's per-step weight re-read — but MEASURED SLOWER than the
    float decoder at every recorded shape (module docstring; quant/dequant
    op overhead dominates at the beam's tiny per-step shapes), so this arm
    is opt-in evidence, not the recommendation.  Embedding, norms, and KV
    caches stay float; beam ordering quality must be validated
    per-checkpoint (scripts/bench_int8_quality.py records
    ``teacher_beam_full`` / ``--static`` arms)."""
    return quantize_params_int8(params, mha=True)


def conv2d_int8(
    p: Dict, x: jnp.ndarray, *, stride: int = 1, padding: int = 0,
    groups: int = 1,
) -> jnp.ndarray:
    """int8 x int8 -> int32 conv with dynamic activation quantization.
    Drop-in for core.modules.conv2d on a ``weight_q`` param dict: NHWC
    input, torch OIHW weight, float output in ``x``'s dtype."""
    out_dtype = x.dtype
    x_q, s_x = _quantize_activation(p, x)
    w = jnp.transpose(p["weight_q"], (2, 3, 1, 0))  # OIHW -> HWIO
    y = jax.lax.conv_general_dilated(
        x_q, w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s_x * p["w_scale"])  # (O,) broadcasts on C
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(out_dtype)


def dense_int8(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """int8 x int8 -> int32 matmul with dynamic activation quantization.
    Drop-in for core.modules.dense on a ``weight_q`` dict ((out, in) torch
    layout)."""
    out_dtype = x.dtype
    x_q, s_x = _quantize_activation(p, x)
    y = jax.lax.dot_general(
        x_q, p["weight_q"],
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s_x * p["w_scale"])
    if "bias" in p:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(out_dtype)
