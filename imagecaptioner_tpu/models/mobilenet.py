"""MobileNetV2 feature extractor — compact-student backbone.

Replaces torchvision ``mobilenet_v2(...).features`` (student_model_compact.py:19-30;
SURVEY §2.9 N3).  Output 1280 channels.  Param tree mirrors torchvision
``features.{i}`` indexing: 0 = stem ConvBNReLU6, 1..17 = inverted residuals,
18 = head ConvBNReLU6 — so "freeze first 10 feature layers" maps directly.
Static block metadata (stride, residual, expansion) lives in module-scope
tables, never in the param pytree.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from imagecaptioner_tpu.core import modules as M

Params = Dict

# torchvision inverted_residual_setting: (expand t, out c, repeats n, stride s)
_IR_SETTING = [
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]
OUT_CHANNELS = 1280


def _block_meta() -> List[Tuple[int, int, int, bool]]:
    """Static per-inverted-residual metadata: (in_ch, t, stride, use_res)."""
    meta = []
    in_ch = 32
    for t, c, n, s in _IR_SETTING:
        for bi in range(n):
            stride = s if bi == 0 else 1
            meta.append((in_ch, t, stride, stride == 1 and in_ch == c))
            in_ch = c
    return meta


_BLOCK_META = _block_meta()


def relu6(x):
    return jnp.minimum(jax.nn.relu(x), 6.0)


def _conv_bn_init(key, in_ch, out_ch, k, groups=1):
    p = {"conv": M.conv2d_init(key, in_ch, out_ch, k, bias=False, groups=groups)}
    p["bn"], s = M.batch_norm_init(out_ch)
    return p, s


def _conv_bn_apply(p, s, x, *, stride, padding, groups, train, act=True):
    y = M.conv2d(p["conv"], x, stride=stride, padding=padding, groups=groups)
    y, new_s = M.batch_norm(p["bn"], s, y, train=train)
    return (relu6(y) if act else y), new_s


def _inverted_residual_init(key, in_ch, out_ch, t):
    ks = jax.random.split(key, 3)
    hidden = in_ch * t
    p: Params = {}
    s: Params = {}
    if t != 1:
        p["expand"], s["expand"] = _conv_bn_init(ks[0], in_ch, hidden, 1)
    p["depthwise"], s["depthwise"] = _conv_bn_init(ks[1], hidden, hidden, 3,
                                                   groups=hidden)
    p["project"], s["project"] = _conv_bn_init(ks[2], hidden, out_ch, 1)
    return p, s


def _inverted_residual_apply(p, s, x, *, stride: int, use_res: bool, train: bool):
    new_s = {}
    y = x
    dw = p["depthwise"]["conv"]
    hidden_groups = dw.get("weight", dw.get("weight_q")).shape[0]
    if "expand" in p:
        y, new_s["expand"] = _conv_bn_apply(p["expand"], s["expand"], y,
                                            stride=1, padding=0, groups=1,
                                            train=train)
    y, new_s["depthwise"] = _conv_bn_apply(
        p["depthwise"], s["depthwise"], y, stride=stride, padding=1,
        groups=hidden_groups, train=train)
    y, new_s["project"] = _conv_bn_apply(p["project"], s["project"], y,
                                         stride=1, padding=0, groups=1,
                                         train=train, act=False)
    if use_res:
        y = x + y
    return y, new_s


def mobilenet_v2_init(key) -> Tuple[Params, Params]:
    keys = jax.random.split(key, len(_BLOCK_META) + 2)
    features_p: List = []
    features_s: List = []
    p0, s0 = _conv_bn_init(keys[0], 3, 32, 3)   # features.0 stem
    features_p.append(p0)
    features_s.append(s0)
    out_chs = [c for t, c, n, s in _IR_SETTING for _ in range(n)]
    for i, ((in_ch, t, _, _), out_ch) in enumerate(zip(_BLOCK_META, out_chs)):
        bp, bs = _inverted_residual_init(keys[i + 1], in_ch, out_ch, t)
        features_p.append(bp)
        features_s.append(bs)
    ph, sh = _conv_bn_init(keys[-1], out_chs[-1], OUT_CHANNELS, 1)  # head
    features_p.append(ph)
    features_s.append(sh)
    return {"features": features_p}, {"features": features_s}


def mobilenet_v2_apply(p: Params, s: Params, x_nchw: jnp.ndarray, *,
                       train: bool = False) -> Tuple[jnp.ndarray, Params]:
    """(B, 3, 224, 224) -> (B, 1280, 7, 7)."""
    x = jnp.transpose(x_nchw, (0, 2, 3, 1))
    fp, fs = p["features"], s["features"]
    new_fs = []
    x, ns = _conv_bn_apply(fp[0], fs[0], x, stride=2, padding=1, groups=1,
                           train=train)
    new_fs.append(ns)
    for i, (_, _, stride, use_res) in enumerate(_BLOCK_META):
        x, ns = _inverted_residual_apply(fp[i + 1], fs[i + 1], x,
                                         stride=stride, use_res=use_res,
                                         train=train)
        new_fs.append(ns)
    x, ns = _conv_bn_apply(fp[-1], fs[-1], x, stride=1, padding=0, groups=1,
                           train=train)
    new_fs.append(ns)
    return jnp.transpose(x, (0, 3, 1, 2)), {"features": new_fs}


def mobilenet_v2_trainable_mask(p: Params, freeze_first: int = 10) -> Params:
    """Freeze features[0..freeze_first) (student_model_compact.py:26-30)."""
    masked = []
    for i, blk in enumerate(p["features"]):
        masked.append(jax.tree.map(lambda _: i >= freeze_first, blk))
    return {"features": masked}
