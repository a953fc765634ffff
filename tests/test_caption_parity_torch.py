"""North-star caption parity: greedy captions match a torch reference-
architecture student TOKEN-FOR-TOKEN with converted weights
(BASELINE.json: "greedy captions match the reference token-for-token").

The torch side is benchmarks/torch_baseline.TorchBaselineStudent — the
reference student architecture (ResNet-50 -> 49x256 -> 2-layer LSTM +
additive attention -> greedy). Weights flow torch -> JAX through
utils/torch_convert; both sides decode the same images.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from benchmarks.torch_baseline import TorchBaselineStudent
from imagecaptioner_tpu.core.config import full_student_config
from imagecaptioner_tpu.data.vocabulary import END, PAD, START
from imagecaptioner_tpu.models import student as SM
from imagecaptioner_tpu.ops import decode as D
from imagecaptioner_tpu.utils import torch_convert as TC

V = 120


@pytest.fixture(scope="module")
def parity_setup():
    torch.manual_seed(0)
    tm = TorchBaselineStudent(vocab_size=V, embed=32, hidden=48, layers=2)
    tm.eval()

    # map the torch module's state into the reference key naming that
    # full_student_from_torch expects
    sd = {}
    for k, v in tm.state_dict().items():
        arr = np.array(v.detach().numpy(), copy=True)
        if k.startswith("backbone.conv1"):
            sd["encoder.resnet.0." + k.split(".", 2)[-1]] = arr
        elif k.startswith("backbone.bn1"):
            sd["encoder.resnet.1." + k.split(".", 2)[-1]] = arr
        elif k.startswith("backbone.layers."):
            parts = k.split(".")
            idx = int(parts[2])
            # layers are flat 0..15 over stages [3,4,6,3] -> torchvision 4..7
            bounds = [(0, 3, 4), (3, 7, 5), (7, 13, 6), (13, 16, 7)]
            for lo, hi, seq in bounds:
                if lo <= idx < hi:
                    block = idx - lo
                    rest = ".".join(parts[3:])
                    rest = rest.replace("down.0", "downsample.0").replace(
                        "down.1", "downsample.1")
                    sd[f"encoder.resnet.{seq}.{block}.{rest}"] = arr
                    break
        elif k.startswith("proj."):
            sd["encoder.projection." + k.split(".", 1)[1]] = arr
        elif k.startswith("out."):
            sd["decoder.output_projection." + k.split(".", 1)[1]] = arr
        elif k.startswith(("embedding", "attention", "attention_combine",
                           "lstm")):
            sd["decoder." + k] = arr
        else:
            raise AssertionError(f"unmapped key {k}")

    cfg = full_student_config(V, embed_size=32, hidden_size=48, num_layers=2,
                              dropout=0.0, use_attention_refinement=False)
    params, state = TC.full_student_from_torch(sd, cfg)
    params = jax.tree.map(jnp.asarray, params)
    state = jax.tree.map(jnp.asarray, state)

    rng = np.random.default_rng(0)
    images = rng.normal(size=(3, 3, 224, 224)).astype(np.float32)
    return tm, params, state, cfg, images


def test_forward_logits_match(parity_setup):
    tm, params, state, cfg, images = parity_setup
    captions = np.random.default_rng(1).integers(0, V, (6, 3))
    with torch.no_grad():
        # torch-side teacher-forced forward replicating the reference loop
        f = tm.encode(torch.from_numpy(images))
        B, T = 3, 6
        h = torch.zeros(2, B, 48)
        c = torch.zeros(2, B, 48)
        emb = tm.embedding(torch.from_numpy(captions)).permute(1, 0, 2)
        outs = []
        for t in range(T):
            hid = h[-1].unsqueeze(1).expand(B, f.size(1), 48)
            scores = torch.tanh(tm.attention(
                torch.cat([hid, f], dim=2))).sum(2)
            w = torch.softmax(scores, dim=1)
            ctx = torch.bmm(w.unsqueeze(1), f).squeeze(1)
            x = tm.attention_combine(torch.cat([emb[:, t], ctx], dim=1))
            o, (h, c) = tm.lstm(x.unsqueeze(1), (h, c))
            outs.append(tm.out(o.squeeze(1)))
        ref_logits = torch.stack(outs).numpy()

    (logits, _, _, _), _ = SM.student_apply(
        params, state, jnp.asarray(images), jnp.asarray(captions), cfg,
        train=False)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, atol=2e-3,
                               rtol=1e-3)


def test_greedy_captions_token_for_token(parity_setup):
    tm, params, state, cfg, images = parity_setup
    with torch.no_grad():
        ref_tokens = tm.greedy_decode(torch.from_numpy(images), max_length=12,
                                      start_id=START, end_id=END).numpy()
    # reference semantics: stop at first END (tokens after it are decode
    # artifacts in the torch baseline, which does not mask)
    def cut(row):
        out = []
        for t in row:
            if t == END:
                break
            out.append(int(t))
        return out

    _, refined, _ = SM.encode_image(params, state, jnp.asarray(images), cfg,
                                    train=False)
    toks = np.asarray(D.greedy_decode_student(params, refined, cfg,
                                              max_length=12))
    for b in range(3):
        ours = [int(t) for t in toks[b] if t != PAD]
        theirs = cut(ref_tokens[b])
        assert ours == theirs, f"image {b}: {ours} != {theirs}"
