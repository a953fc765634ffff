"""torch .pth <-> JAX pytree checkpoint conversion.

The reference ships torch state_dicts (timm ViT teacher, torchvision
ResNet-50/MobileNetV2 students).  Because this framework stores parameters in
torch layouts (core/modules.py), conversion is pure re-keying — no transposes.

Both directions are provided: ``*_from_torch`` (import pretrained/reference
weights) and ``*_to_torch`` (export for the reference tooling).  Round-trip
tests in tests/test_torch_convert.py.

Key conventions implemented (verified against the reference modules):
  teacher  — ``encoder.*`` timm vit_small keys, ``encoder_projection``,
             ``embedding``, ``decoder.layers.{i}.*`` (torch
             TransformerDecoder), ``pre_output_norm``, ``fc_out``
             (teacher_model.py:30-77)
  full     — ``encoder.resnet.{seq_idx}.*`` (torchvision resnet children in
             an nn.Sequential: 0=conv1, 1=bn1, 4..7=layer1..4),
             ``encoder.projection.{0,3}``, ``attention_refinement.*``,
             ``decoder.*`` incl. ``lstm.weight_ih_l{i}`` and
             ``output_projection.{0,3}`` (student_model.py)
  compact  — ``encoder.backbone.{i}.*`` torchvision MobileNetV2 features
             (InvertedResidual ``conv.{j}`` sub-indices),
             ``encoder.projection.0``, ``decoder.*`` (student_model_compact.py)
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from imagecaptioner_tpu.core.config import StudentConfig, TeacherConfig


def _np(x):
    return np.asarray(x)


# ---------------------------------------------------------------------------
# Generic helpers: map my pytree <-> flat torch key dict
# ---------------------------------------------------------------------------


def _lin(prefix):
    return {"weight": f"{prefix}.weight", "bias": f"{prefix}.bias"}


def _lin_nobias(prefix):
    return {"weight": f"{prefix}.weight"}


def _ln(prefix):
    return {"weight": f"{prefix}.weight", "bias": f"{prefix}.bias"}


def _bn(prefix):
    return ({"weight": f"{prefix}.weight", "bias": f"{prefix}.bias"},
            {"running_mean": f"{prefix}.running_mean",
             "running_var": f"{prefix}.running_var"})


def _mha(prefix):
    return {
        "in_proj_weight": f"{prefix}.in_proj_weight",
        "in_proj_bias": f"{prefix}.in_proj_bias",
        "out_proj": _lin(f"{prefix}.out_proj"),
    }


def _apply_keymap(keymap, sd: Dict[str, np.ndarray]):
    """Replace torch-key strings in a nested keymap with the tensors."""
    if isinstance(keymap, dict):
        return {k: _apply_keymap(v, sd) for k, v in keymap.items()}
    if isinstance(keymap, list):
        return [_apply_keymap(v, sd) for v in keymap]
    return _np(sd[keymap])


def _export_keymap(keymap, tree, out: Dict[str, np.ndarray]):
    if isinstance(keymap, dict):
        for k, v in keymap.items():
            _export_keymap(v, tree[k], out)
    elif isinstance(keymap, list):
        for v, t in zip(keymap, tree):
            _export_keymap(v, t, out)
    else:
        out[keymap] = _np(tree)


# ---------------------------------------------------------------------------
# Teacher
# ---------------------------------------------------------------------------


def teacher_keymap(cfg: TeacherConfig):
    enc = {
        "patch_embed": {"proj": _lin("encoder.patch_embed.proj")},
        "cls_token": "encoder.cls_token",
        "pos_embed": "encoder.pos_embed",
        "blocks": [
            {
                "norm1": _ln(f"encoder.blocks.{i}.norm1"),
                "attn": {"qkv": _lin(f"encoder.blocks.{i}.attn.qkv"),
                         "proj": _lin(f"encoder.blocks.{i}.attn.proj")},
                "norm2": _ln(f"encoder.blocks.{i}.norm2"),
                "mlp": {"fc1": _lin(f"encoder.blocks.{i}.mlp.fc1"),
                        "fc2": _lin(f"encoder.blocks.{i}.mlp.fc2")},
            }
            for i in range(cfg.encoder_depth)
        ],
        "norm": _ln("encoder.norm"),
    }
    km = {
        "encoder": enc,
        "embedding": _lin_nobias("embedding"),
        "decoder": [
            {
                "self_attn": _mha(f"decoder.layers.{i}.self_attn"),
                "multihead_attn": _mha(f"decoder.layers.{i}.multihead_attn"),
                "linear1": _lin(f"decoder.layers.{i}.linear1"),
                "linear2": _lin(f"decoder.layers.{i}.linear2"),
                "norm1": _ln(f"decoder.layers.{i}.norm1"),
                "norm2": _ln(f"decoder.layers.{i}.norm2"),
                "norm3": _ln(f"decoder.layers.{i}.norm3"),
            }
            for i in range(cfg.num_decoder_layers)
        ],
        "pre_output_norm": _ln("pre_output_norm"),
        "fc_out": _lin("fc_out"),
    }
    if cfg.encoder_dim != cfg.embed_size:
        km["encoder_projection"] = _lin("encoder_projection")
    return km


def teacher_from_torch(sd: Dict[str, np.ndarray], cfg: TeacherConfig):
    """timm patch_embed flattens (B,E,H,W)->(B,L,E) like ours; cls/pos keys
    are direct.  Patch conv weight stays OIHW."""
    return _apply_keymap(teacher_keymap(cfg), sd)


def teacher_to_torch(params, cfg: TeacherConfig) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    _export_keymap(teacher_keymap(cfg), params, out)
    return out


# ---------------------------------------------------------------------------
# Full student (ResNet-50)
# ---------------------------------------------------------------------------

_RESNET_STAGE_BLOCKS = [3, 4, 6, 3]


def _resnet_keymap():
    """Mine conv1/bn1/layer{L}[b] <-> torch Sequential indices
    (0=conv1, 1=bn1, 2=relu, 3=maxpool, 4..7=layers)."""
    p = {"conv1": _lin_nobias("encoder.resnet.0")}
    s = {}
    p["bn1"], s["bn1"] = _bn("encoder.resnet.1")
    for li, blocks in enumerate(_RESNET_STAGE_BLOCKS, start=1):
        seq = 3 + li
        pl, sl = [], []
        for b in range(blocks):
            pref = f"encoder.resnet.{seq}.{b}"
            bp = {
                "conv1": _lin_nobias(f"{pref}.conv1"),
                "conv2": _lin_nobias(f"{pref}.conv2"),
                "conv3": _lin_nobias(f"{pref}.conv3"),
            }
            bs = {}
            for i in (1, 2, 3):
                bp[f"bn{i}"], bs[f"bn{i}"] = _bn(f"{pref}.bn{i}")
            if b == 0:
                bp["downsample"] = {
                    "conv": _lin_nobias(f"{pref}.downsample.0")}
                bp["downsample"]["bn"], bs["downsample_bn"] = _bn(
                    f"{pref}.downsample.1")
            pl.append(bp)
            sl.append(bs)
        p[f"layer{li}"] = pl
        s[f"layer{li}"] = sl
    return p, s


def full_student_keymap(cfg: StudentConfig):
    rp, rs = _resnet_keymap()
    params_km = {
        "encoder": {
            "resnet": rp,
            "projection": {"fc": _lin("encoder.projection.0"),
                           "ln": _ln("encoder.projection.3")},
        },
        "decoder": {
            "embedding": _lin_nobias("decoder.embedding"),
            "attention": _lin("decoder.attention"),
            "attention_combine": _lin("decoder.attention_combine"),
            "lstm": [
                {"weight_ih": f"decoder.lstm.weight_ih_l{i}",
                 "weight_hh": f"decoder.lstm.weight_hh_l{i}",
                 "bias_ih": f"decoder.lstm.bias_ih_l{i}",
                 "bias_hh": f"decoder.lstm.bias_hh_l{i}"}
                for i in range(cfg.num_layers)
            ],
            "output_projection": {
                "fc1": _lin("decoder.output_projection.0"),
                "fc2": _lin("decoder.output_projection.3"),
            },
        },
    }
    if cfg.use_attention_refinement:
        params_km["attention_refinement"] = {
            "attention": _mha("attention_refinement.attention"),
            "ffn": {"fc1": _lin("attention_refinement.ffn.0"),
                    "fc2": _lin("attention_refinement.ffn.3")},
            "norm1": _ln("attention_refinement.norm1"),
            "norm2": _ln("attention_refinement.norm2"),
        }
    state_km = {"resnet": rs}
    return params_km, state_km


def full_student_from_torch(sd, cfg: StudentConfig):
    pkm, skm = full_student_keymap(cfg)
    return _apply_keymap(pkm, sd), _apply_keymap(skm, sd)


def full_student_to_torch(params, state, cfg: StudentConfig):
    pkm, skm = full_student_keymap(cfg)
    out: Dict[str, np.ndarray] = {}
    _export_keymap(pkm, params, out)
    _export_keymap(skm, state, out)
    return out


# ---------------------------------------------------------------------------
# Compact student (MobileNetV2)
# ---------------------------------------------------------------------------


def _mobilenet_keymap():
    from imagecaptioner_tpu.models.mobilenet import _BLOCK_META

    def conv_bn(conv_key, bn_key):
        p = {"conv": _lin_nobias(conv_key)}
        bnp, bns = _bn(bn_key)
        p["bn"] = bnp
        return p, bns

    fp, fs = [], []
    p0, s0 = conv_bn("encoder.backbone.0.0", "encoder.backbone.0.1")
    fp.append(p0)
    fs.append(s0)
    for bi, (in_ch, t, stride, use_res) in enumerate(_BLOCK_META, start=1):
        pref = f"encoder.backbone.{bi}.conv"
        bp, bs = {}, {}
        if t != 1:
            bp["expand"], bs["expand"] = conv_bn(f"{pref}.0.0", f"{pref}.0.1")
            dw, proj, projbn = f"{pref}.1.0", f"{pref}.2", f"{pref}.3"
            bp["depthwise"], bs["depthwise"] = conv_bn(dw, f"{pref}.1.1")
        else:
            bp["depthwise"], bs["depthwise"] = conv_bn(f"{pref}.0.0",
                                                       f"{pref}.0.1")
            proj, projbn = f"{pref}.1", f"{pref}.2"
        bp["project"], bs["project"] = conv_bn(proj, projbn)
        fp.append(bp)
        fs.append(bs)
    ph, sh = conv_bn("encoder.backbone.18.0", "encoder.backbone.18.1")
    fp.append(ph)
    fs.append(sh)
    return {"features": fp}, {"features": fs}


def compact_student_keymap(cfg: StudentConfig):
    mp, ms = _mobilenet_keymap()
    params_km = {
        "encoder": {
            "backbone": mp,
            "projection": {"fc": _lin("encoder.projection.0")},
        },
        "decoder": {
            "embedding": _lin_nobias("decoder.embedding"),
            "attention": _lin("decoder.attention"),
            "lstm": [
                {"weight_ih": f"decoder.lstm.weight_ih_l{i}",
                 "weight_hh": f"decoder.lstm.weight_hh_l{i}",
                 "bias_ih": f"decoder.lstm.bias_ih_l{i}",
                 "bias_hh": f"decoder.lstm.bias_hh_l{i}"}
                for i in range(cfg.num_layers)
            ],
            "output_projection": _lin("decoder.output_projection"),
        },
    }
    if cfg.use_attention_refinement:
        params_km["attention_refinement"] = {
            "attention": _mha("attention_refinement"),
            "norm": _ln("norm"),
        }
    return params_km, {"backbone": ms}


def compact_student_from_torch(sd, cfg: StudentConfig):
    pkm, skm = compact_student_keymap(cfg)
    return _apply_keymap(pkm, sd), _apply_keymap(skm, sd)


def compact_student_to_torch(params, state, cfg: StudentConfig):
    pkm, skm = compact_student_keymap(cfg)
    out: Dict[str, np.ndarray] = {}
    _export_keymap(pkm, params, out)
    _export_keymap(skm, state, out)
    return out


# ---------------------------------------------------------------------------
# Enhanced student (EfficientNet-B3)
# ---------------------------------------------------------------------------


def _efficientnet_keymap():
    """torchvision efficientnet_b3 ``features`` naming, under the reference
    wrapper ``encoder.backbone.0`` (the enhanced encoder wraps
    Sequential(features, avgpool), student_model_enhanced.py:25).

    Per-block sub-indices depend on expand: with expansion the MBConv is
    block.0=expand / block.1=depthwise / block.2=SE / block.3=project;
    stage 1 (t=1) drops the expand so everything shifts down one.
    """
    from imagecaptioner_tpu.models.efficientnet import _STAGES

    def conv_bn(prefix):
        p = {"conv": _lin_nobias(f"{prefix}.0")}
        bnp, bns = _bn(f"{prefix}.1")
        p["bn"] = bnp
        return p, bns

    root = "encoder.backbone.0"
    p, s = {}, {}
    p["stem"], s["stem"] = conv_bn(f"{root}.0")
    p["stages"], s["stages"] = [], []
    for si, (t, _in, _out, blocks, _st, _k) in enumerate(_STAGES, start=1):
        sp, ss = [], []
        for b in range(blocks):
            pref = f"{root}.{si}.{b}.block"
            bp, bs = {}, {}
            j = 0
            if t != 1:
                bp["expand"], bs["expand"] = conv_bn(f"{pref}.{j}")
                j += 1
            bp["depthwise"], bs["depthwise"] = conv_bn(f"{pref}.{j}")
            bp["se"] = {"fc1": _lin(f"{pref}.{j + 1}.fc1"),
                        "fc2": _lin(f"{pref}.{j + 1}.fc2")}
            bp["project"], bs["project"] = conv_bn(f"{pref}.{j + 2}")
            sp.append(bp)
            ss.append(bs)
        p["stages"].append(sp)
        s["stages"].append(ss)
    p["head"], s["head"] = conv_bn(f"{root}.8")
    return p, s


def enhanced_student_keymap(cfg: StudentConfig):
    """student_model_enhanced.py module naming.  The two bug-fix params
    (``decoder.query_projection``, ``decoder.highway_context_projection``)
    have NO torch counterpart — the reference constructs a fresh random
    Linear inside forward (:279-282) and broadcast-crashes the highway gate
    (:356-359) — so they are excluded here and freshly initialised on
    import (see enhanced_student_from_torch)."""
    ep, es = _efficientnet_keymap()
    params_km = {
        "encoder": {
            "backbone": ep,
            "spatial_attention": {
                "conv1": _lin("encoder.spatial_attention.0"),
                "conv2": _lin("encoder.spatial_attention.2"),
            },
            "projection": {"fc1": _lin("encoder.projection.0"),
                           "fc2": _lin("encoder.projection.3"),
                           "ln": _ln("encoder.projection.4")},
        },
        "decoder": {
            "embedding": _lin_nobias("decoder.embedding"),
            "pos_encoding": "decoder.pos_encoding",
            "image_attention": _mha("decoder.image_attention"),
            "attention_gate": _lin("decoder.attention_gate.0"),
            "lstm": [
                {"weight_ih": f"decoder.lstm_layers.{i}.weight_ih",
                 "weight_hh": f"decoder.lstm_layers.{i}.weight_hh",
                 "bias_ih": f"decoder.lstm_layers.{i}.bias_ih",
                 "bias_hh": f"decoder.lstm_layers.{i}.bias_hh"}
                for i in range(cfg.num_layers)
            ],
            "lstm_norms": [_ln(f"decoder.lstm_norms.{i}")
                           for i in range(cfg.num_layers)],
            "highway_gate": _lin("decoder.highway_gate.0"),
            "output_projection": {
                "fc1": _lin("decoder.output_projection.0"),
                "fc2": _lin("decoder.output_projection.3"),
            },
        },
        "feature_compressor": {
            "fc1": _lin("feature_compressor.0"),
            "fc2": _lin("feature_compressor.2"),
        },
    }
    if cfg.use_attention_refinement:
        ar = "attention_refinement"
        params_km["attention_refinement"] = {
            "pos_encoding": f"{ar}.pos_encoding",
            "layers": [
                {"attention": _mha(f"{ar}.attention_layers.{i}"),
                 "ffn": {"fc1": _lin(f"{ar}.ffn_layers.{i}.0"),
                         "fc2": _lin(f"{ar}.ffn_layers.{i}.3")},
                 "norm1": _ln(f"{ar}.norm_layers.{2 * i}"),
                 "norm2": _ln(f"{ar}.norm_layers.{2 * i + 1}")}
                for i in range(2)
            ],
            "global_context": {"fc1": _lin(f"{ar}.global_context.2"),
                               "fc2": _lin(f"{ar}.global_context.4")},
        }
    return params_km, {"backbone": es}


def enhanced_student_from_torch(sd, cfg: StudentConfig, *, key=None):
    """Import reference weights; the two bug-fix projections (no torch
    counterpart, see enhanced_student_keymap) are deterministically
    initialised from ``key``."""
    import jax

    pkm, skm = enhanced_student_keymap(cfg)
    params = _apply_keymap(pkm, sd)
    from imagecaptioner_tpu.core import modules as M

    k1, k2 = jax.random.split(key if key is not None
                              else jax.random.PRNGKey(0))
    params["decoder"]["query_projection"] = jax.tree.map(
        _np, M.linear_init(k1, cfg.hidden_size, cfg.embed_size))
    params["decoder"]["highway_context_projection"] = jax.tree.map(
        _np, M.linear_init(k2, cfg.embed_size, cfg.hidden_size))
    return params, _apply_keymap(skm, sd)


def enhanced_student_to_torch(params, state, cfg: StudentConfig):
    pkm, skm = enhanced_student_keymap(cfg)
    out: Dict[str, np.ndarray] = {}
    _export_keymap(pkm, params, out)
    _export_keymap(skm, state, out)
    return out


# ---------------------------------------------------------------------------
# .pth loading (torch checkpoints from the reference pipeline)
# ---------------------------------------------------------------------------


def _to_numpy_leaves(obj):
    """Recursively convert torch tensors to numpy; leave other values as-is."""
    if hasattr(obj, "detach"):
        return np.array(obj.detach().numpy(), copy=True)
    if isinstance(obj, dict):
        return {k: _to_numpy_leaves(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_numpy_leaves(v) for v in obj)
    return obj


def load_reference_pth(path: str, *,
                       allow_pickle: bool = False) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into a (possibly nested) numpy dict.

    Defaults to ``weights_only=True`` — checkpoints from an untrusted
    upstream pipeline must not be able to run arbitrary pickle code.  Pass
    ``allow_pickle=True`` only for files you trust that need full pickling.
    Tensor leaves are converted recursively, so picking a nested
    ``*_state_dict`` out of a reference checkpoint wrapper always yields
    pure numpy.
    """
    import torch

    obj = torch.load(path, map_location="cpu",
                     weights_only=not allow_pickle)
    return _to_numpy_leaves(obj)
