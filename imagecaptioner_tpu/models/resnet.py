"""ResNet-50 backbone (headless) — XLA:TPU conv graphs, NHWC activations.

Replaces torchvision ``resnet50`` minus avgpool/fc (student_model.py:16-20;
SURVEY §2.9 N3).  Parameter tree mirrors torchvision state_dict structure
(``conv1``, ``bn1``, ``layer{1..4}.[i].conv{1..3}/bn{1..3}/downsample``) so
pretrained-weight conversion is a pure re-keying.

Batch-norm running stats thread through an explicit ``state`` tree.  The
reference freezes children 0-5 (conv1..layer2) for fine-tuning
(student_model.py:23-30) — expressed here as a trainable mask for the
optimizer, while BN stats still update in train mode (torch behavior:
requires_grad=False does not stop running-stat updates).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from imagecaptioner_tpu.core import modules as M

Params = Dict

# (blocks, mid_channels, stride) per stage; out = mid * 4
_STAGES = [(3, 64, 1), (4, 128, 2), (6, 256, 2), (3, 512, 2)]
OUT_CHANNELS = 2048


def _bottleneck_init(key, in_ch: int, mid: int, stride: int, downsample: bool):
    ks = jax.random.split(key, 4)
    p = {
        "conv1": M.conv2d_init(ks[0], in_ch, mid, 1, bias=False),
        "conv2": M.conv2d_init(ks[1], mid, mid, 3, bias=False),
        "conv3": M.conv2d_init(ks[2], mid, mid * 4, 1, bias=False),
    }
    s = {}
    for i, ch in (("1", mid), ("2", mid), ("3", mid * 4)):
        p[f"bn{i}"], s[f"bn{i}"] = M.batch_norm_init(ch)
    if downsample:
        p["downsample"] = {"conv": M.conv2d_init(ks[3], in_ch, mid * 4, 1, bias=False)}
        p["downsample"]["bn"], s["downsample_bn"] = M.batch_norm_init(mid * 4)
    return p, s, stride


def _bottleneck_apply(p, s, x, stride: int, *, train: bool):
    new_s = {}
    identity = x
    y = M.conv2d(p["conv1"], x, stride=1, padding=0)
    y, new_s["bn1"] = M.batch_norm(p["bn1"], s["bn1"], y, train=train)
    y = jax.nn.relu(y)
    y = M.conv2d(p["conv2"], y, stride=stride, padding=1)
    y, new_s["bn2"] = M.batch_norm(p["bn2"], s["bn2"], y, train=train)
    y = jax.nn.relu(y)
    y = M.conv2d(p["conv3"], y, stride=1, padding=0)
    y, new_s["bn3"] = M.batch_norm(p["bn3"], s["bn3"], y, train=train)
    if "downsample" in p:
        identity = M.conv2d(p["downsample"]["conv"], x, stride=stride, padding=0)
        identity, new_s["downsample_bn"] = M.batch_norm(
            p["downsample"]["bn"], s["downsample_bn"], identity, train=train)
    return jax.nn.relu(y + identity), new_s


def resnet50_init(key) -> Tuple[Params, Params]:
    keys = jax.random.split(key, 20)
    p: Params = {"conv1": M.conv2d_init(keys[0], 3, 64, 7, bias=False)}
    s: Params = {}
    p["bn1"], s["bn1"] = M.batch_norm_init(64)
    ki = 1
    in_ch = 64
    for li, (blocks, mid, stride) in enumerate(_STAGES, start=1):
        p[f"layer{li}"] = []
        s[f"layer{li}"] = []
        for bi in range(blocks):
            st = stride if bi == 0 else 1
            ds = bi == 0 and (st != 1 or in_ch != mid * 4)
            bp, bs, _ = _bottleneck_init(keys[ki % 20], in_ch, mid, st, ds)
            ki += 1
            p[f"layer{li}"].append(bp)
            s[f"layer{li}"].append(bs)
            in_ch = mid * 4
    return p, s


def resnet50_apply(p: Params, s: Params, x_nchw: jnp.ndarray, *, train: bool = False
                   ) -> Tuple[jnp.ndarray, Params]:
    """(B, 3, 224, 224) -> (B, 2048, 7, 7) NCHW at the surface (reference
    contract); NHWC internally for TPU layout."""
    x = jnp.transpose(x_nchw, (0, 2, 3, 1))
    new_s: Params = {}
    x = M.conv2d(p["conv1"], x, stride=2, padding=3)
    x, new_s["bn1"] = M.batch_norm(p["bn1"], s["bn1"], x, train=train)
    x = jax.nn.relu(x)
    x = M.max_pool2d(x, 3, 2, 1)
    for li, (blocks, mid, stride) in enumerate(_STAGES, start=1):
        new_s[f"layer{li}"] = []
        for bi in range(blocks):
            st = stride if bi == 0 else 1
            x, bs = _bottleneck_apply(p[f"layer{li}"][bi], s[f"layer{li}"][bi],
                                      x, st, train=train)
            new_s[f"layer{li}"].append(bs)
    return jnp.transpose(x, (0, 3, 1, 2)), new_s


def resnet50_trainable_mask(p: Params) -> Params:
    """Freeze conv1/bn1/layer1/layer2; train layer3/layer4
    (student_model.py:23-30: children 0-5 frozen)."""
    frozen_keys = {"conv1", "bn1", "layer1", "layer2"}

    def mark(tree, trainable: bool):
        return jax.tree.map(lambda _: trainable, tree)

    return {k: mark(v, k not in frozen_keys) for k, v in p.items()}
