"""EfficientNet-B3 feature extractor — enhanced-student backbone.

torchvision ``efficientnet_b3(...).features`` semantics (SURVEY §2.9 N3):
width 1.2 / depth 1.4 over the B0 stages, MBConv with squeeze-excitation and
SiLU, 1536 output channels.  Param tree mirrors ``features.{i}`` indexing
(0 = stem, 1..7 = stages as lists of MBConv blocks, 8 = head).

Note: the reference's enhanced encoder wraps ``children()[:-1]`` which keeps
torchvision's avgpool and collapses features to 1x1 before its 8x8 pooling
(student_model_enhanced.py:25) — 64 identical tokens.  That model is never
trained by any trainer (SURVEY §2.5), so this implementation provides the
real (B, 1536, 7, 7) feature map instead of replicating the collapse.
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from imagecaptioner_tpu.core import modules as M

Params = Dict

OUT_CHANNELS = 1536


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def _b3_stages() -> List[Tuple[int, int, int, int, int, int]]:
    """(expand_t, in_ch, out_ch, num_blocks, stride, kernel) per stage."""
    base = [  # B0: t, c, n, s, k
        (1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
        (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
        (6, 320, 1, 1, 3),
    ]
    width, depth = 1.2, 1.4
    stages = []
    in_ch = _make_divisible(32 * width)  # stem = 40
    for t, c, n, s, k in base:
        out_ch = _make_divisible(c * width)
        blocks = int(math.ceil(n * depth))
        stages.append((t, in_ch, out_ch, blocks, s, k))
        in_ch = out_ch
    return stages


_STAGES = _b3_stages()
STEM_CH = _make_divisible(32 * 1.2)


def _conv_bn_init(key, in_ch, out_ch, k, groups=1):
    p = {"conv": M.conv2d_init(key, in_ch, out_ch, k, bias=False,
                               groups=groups)}
    p["bn"], s = M.batch_norm_init(out_ch)
    return p, s


def _conv_bn_apply(p, s, x, *, stride=1, padding=0, groups=1, train, act=True):
    y = M.conv2d(p["conv"], x, stride=stride, padding=padding, groups=groups)
    y, new_s = M.batch_norm(p["bn"], s, y, train=train)
    return (jax.nn.silu(y) if act else y), new_s


def _mbconv_init(key, t, in_ch, out_ch, k):
    ks = jax.random.split(key, 4)
    hidden = in_ch * t
    p: Params = {}
    s: Params = {}
    if t != 1:
        p["expand"], s["expand"] = _conv_bn_init(ks[0], in_ch, hidden, 1)
    p["depthwise"], s["depthwise"] = _conv_bn_init(ks[1], hidden, hidden, k,
                                                   groups=hidden)
    sq = max(1, in_ch // 4)  # torchvision: squeeze from block INPUT channels
    p["se"] = {
        "fc1": M.conv2d_init(ks[2], hidden, sq, 1, bias=True),
        "fc2": M.conv2d_init(ks[3], sq, hidden, 1, bias=True),
    }
    p["project"], s["project"] = _conv_bn_init(
        jax.random.fold_in(key, 7), hidden, out_ch, 1)
    return p, s


def _mbconv_apply(p, s, x, *, stride, kernel, use_res, train):
    new_s = {}
    y = x
    if "expand" in p:
        y, new_s["expand"] = _conv_bn_apply(p["expand"], s["expand"], y,
                                            train=train)
    dw = p["depthwise"]["conv"]
    groups = dw.get("weight", dw.get("weight_q")).shape[0]
    y, new_s["depthwise"] = _conv_bn_apply(
        p["depthwise"], s["depthwise"], y, stride=stride,
        padding=kernel // 2, groups=groups, train=train)
    # squeeze-excitation (NHWC)
    se = jnp.mean(y, axis=(1, 2), keepdims=True)
    se = jax.nn.silu(M.conv2d(p["se"]["fc1"], se))
    se = jax.nn.sigmoid(M.conv2d(p["se"]["fc2"], se))
    y = y * se
    y, new_s["project"] = _conv_bn_apply(p["project"], s["project"], y,
                                         train=train, act=False)
    if use_res:
        y = x + y
    return y, new_s


def efficientnet_b3_init(key) -> Tuple[Params, Params]:
    n_blocks = sum(st[3] for st in _STAGES)
    keys = jax.random.split(key, n_blocks + 2)
    p: Params = {}
    s: Params = {}
    p["stem"], s["stem"] = _conv_bn_init(keys[0], 3, STEM_CH, 3)
    ki = 1
    p["stages"] = []
    s["stages"] = []
    for t, in_ch, out_ch, blocks, stride, k in _STAGES:
        sp, ss = [], []
        for b in range(blocks):
            bi = in_ch if b == 0 else out_ch
            bp, bs = _mbconv_init(keys[ki], t, bi, out_ch, k)
            ki += 1
            sp.append(bp)
            ss.append(bs)
        p["stages"].append(sp)
        s["stages"].append(ss)
    p["head"], s["head"] = _conv_bn_init(keys[ki], _STAGES[-1][2],
                                         OUT_CHANNELS, 1)
    return p, s


def efficientnet_b3_apply(p: Params, s: Params, x_nchw: jnp.ndarray, *,
                          train: bool = False) -> Tuple[jnp.ndarray, Params]:
    """(B, 3, 224, 224) -> (B, 1536, 7, 7)."""
    x = jnp.transpose(x_nchw, (0, 2, 3, 1))
    new_s: Params = {}
    x, new_s["stem"] = _conv_bn_apply(p["stem"], s["stem"], x, stride=2,
                                      padding=1, train=train)
    new_s["stages"] = []
    for si, (t, in_ch, out_ch, blocks, stride, k) in enumerate(_STAGES):
        stage_s = []
        for b in range(blocks):
            st = stride if b == 0 else 1
            bi = in_ch if b == 0 else out_ch
            use_res = st == 1 and bi == out_ch
            x, bs = _mbconv_apply(p["stages"][si][b], s["stages"][si][b], x,
                                  stride=st, kernel=k, use_res=use_res,
                                  train=train)
            stage_s.append(bs)
        new_s["stages"].append(stage_s)
    x, new_s["head"] = _conv_bn_apply(p["head"], s["head"], x, train=train)
    return jnp.transpose(x, (0, 3, 1, 2)), new_s


def efficientnet_b3_trainable_mask(p: Params, freeze_stages: int = 4) -> Params:
    """Freeze stem + the first ``freeze_stages`` stages (the reference freezes
    children 0-5 of its Sequential wrapper, student_model_enhanced.py:41-49)."""
    mask = jax.tree.map(lambda _: True, p)
    mask["stem"] = jax.tree.map(lambda _: False, p["stem"])
    for si in range(min(freeze_stages, len(p["stages"]))):
        mask["stages"][si] = jax.tree.map(lambda _: False, p["stages"][si])
    return mask
