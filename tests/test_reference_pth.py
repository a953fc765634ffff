"""Production-dims reference-schema ``.pth`` checkpoint, end to end.

VERDICT r3 #7: the ``.pth`` loading path was previously exercised only at
toy dims via hand-mapped state dicts.  Here a checkpoint with the
reference pipeline's EXACT schema (train_teacher.py:249-256 wrapper dict;
timm ViT-S/16 + torch ``nn.TransformerDecoder`` state-dict key naming) is
built at the production 512/8/4 teacher config, saved with ``torch.save``,
loaded through ``utils.torch_convert.load_reference_pth`` ->
``teacher_from_torch`` -> served with the packed beam — and the decode is
checked hypothesis-for-hypothesis against the reference beam semantics run
by torch itself on the converted encoder's memory.

The decoder weights come from real torch modules (``nn.TransformerDecoder``
at 512/8/4) so every tensor layout quirk (packed in_proj, (out, in)
linears) is the genuine torch article; the timm encoder tensors are
random-init in timm naming (timm itself is not installed — SURVEY §2.9 N3
documents conversion, not pretrained downloads).
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from imagecaptioner_tpu.core.config import TeacherConfig
from imagecaptioner_tpu.data.vocabulary import END, START
from imagecaptioner_tpu.models import teacher as TM
from imagecaptioner_tpu.ops import decode as D
from imagecaptioner_tpu.utils import torch_convert as TC

V, E, HEADS, LAYERS = 997, 512, 8, 4
ENC_DIM, ENC_DEPTH = 384, 12


class RefTeacherDecoder(tnn.Module):
    """The reference teacher's decoder half with its exact attribute names
    (teacher_model.py:53-75), so ``state_dict()`` keys match the ``.pth``."""

    def __init__(self):
        super().__init__()
        self.embedding = tnn.Embedding(V, E)
        layer = tnn.TransformerDecoderLayer(E, HEADS, dim_feedforward=2 * E,
                                            dropout=0.0, batch_first=False)
        self.decoder = tnn.TransformerDecoder(layer, LAYERS)
        self.pre_output_norm = tnn.LayerNorm(E)
        self.fc_out = tnn.Linear(E, V)
        pe = torch.zeros(60, E)
        pos = torch.arange(0, 60, dtype=torch.float).unsqueeze(1)
        div = torch.exp(torch.arange(0, E, 2).float()
                        * (-math.log(10000.0) / E))
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe.unsqueeze(1))

    def logits_last(self, seqs, memory):
        tgt = self.embedding(seqs) + self.pe[: seqs.size(0)]
        t = tgt.size(0)
        mask = torch.triu(torch.ones(t, t), diagonal=1).bool()
        dec = self.decoder(tgt, memory, tgt_mask=mask)
        return self.fc_out(self.pre_output_norm(dec[-1]))


def _timm_encoder_state_dict(rng) -> dict:
    """Random-init ViT-S/16 tensors in timm state-dict naming."""

    def t(*shape, scale=0.02):
        return torch.from_numpy(
            rng.normal(0.0, scale, shape).astype(np.float32))

    sd = {
        "encoder.patch_embed.proj.weight": t(ENC_DIM, 3, 16, 16),
        "encoder.patch_embed.proj.bias": t(ENC_DIM),
        "encoder.cls_token": t(1, 1, ENC_DIM),
        "encoder.pos_embed": t(1, 197, ENC_DIM),
        "encoder.norm.weight": torch.ones(ENC_DIM),
        "encoder.norm.bias": torch.zeros(ENC_DIM),
        "encoder_projection.weight": t(E, ENC_DIM),
        "encoder_projection.bias": torch.zeros(E),
    }
    for i in range(ENC_DEPTH):
        p = f"encoder.blocks.{i}"
        sd.update({
            f"{p}.norm1.weight": torch.ones(ENC_DIM),
            f"{p}.norm1.bias": torch.zeros(ENC_DIM),
            f"{p}.attn.qkv.weight": t(3 * ENC_DIM, ENC_DIM),
            f"{p}.attn.qkv.bias": torch.zeros(3 * ENC_DIM),
            f"{p}.attn.proj.weight": t(ENC_DIM, ENC_DIM),
            f"{p}.attn.proj.bias": torch.zeros(ENC_DIM),
            f"{p}.norm2.weight": torch.ones(ENC_DIM),
            f"{p}.norm2.bias": torch.zeros(ENC_DIM),
            f"{p}.mlp.fc1.weight": t(4 * ENC_DIM, ENC_DIM),
            f"{p}.mlp.fc1.bias": torch.zeros(4 * ENC_DIM),
            f"{p}.mlp.fc2.weight": t(ENC_DIM, 4 * ENC_DIM),
            f"{p}.mlp.fc2.bias": torch.zeros(ENC_DIM),
        })
    return sd


def _keymap_leaves(km, out):
    if isinstance(km, dict):
        for v in km.values():
            _keymap_leaves(v, out)
    elif isinstance(km, list):
        for v in km:
            _keymap_leaves(v, out)
    else:
        out.append(km)


def _torch_reference_beam(model, memory, *, max_length, beam_size,
                          length_penalty=0.6):
    """Reference beam semantics (dynamic shrink + GNMT penalty,
    teacher_model.py:108-252) at production dims."""
    with torch.no_grad():
        seqs = torch.full((1, beam_size), START, dtype=torch.long)
        scores = torch.full((beam_size,), float("-inf"))
        scores[0] = 0.0
        mem = memory.expand(memory.size(0), beam_size, E).contiguous()
        finished = []
        B = beam_size
        for _ in range(max_length):
            logits = model.logits_last(seqs, mem)
            logp = torch.log_softmax(logits.float(), dim=-1)
            cand = (scores.unsqueeze(1) + logp).view(-1)
            top_scores, top_ids = torch.topk(cand, k=B)
            new_seqs, new_scores = [], []
            for i in range(B):
                origin = int(top_ids[i]) // V
                token = int(top_ids[i]) % V
                sc = float(top_scores[i])
                seq_i = torch.cat([seqs[:, origin],
                                   torch.tensor([token])], dim=0)
                if token == END:
                    Lh = seq_i.size(0)
                    lp = ((5.0 + Lh) / 6.0) ** length_penalty
                    finished.append((seq_i.tolist(), sc / lp))
                else:
                    new_seqs.append(seq_i.unsqueeze(1))
                    new_scores.append(sc)
            if not new_seqs:
                break
            B = len(new_seqs)
            seqs = torch.cat(new_seqs, dim=1)
            scores = torch.tensor(new_scores)
            mem = mem[:, :B, :]
        if not finished:
            for b in range(seqs.size(1)):
                Lh = seqs.size(0)
                lp = ((5.0 + Lh) / 6.0) ** length_penalty
                finished.append((seqs[:, b].tolist(), float(scores[b]) / lp))
        finished.sort(key=lambda x: x[1], reverse=True)
        return finished


@pytest.fixture(scope="module")
def reference_pth(tmp_path_factory):
    torch.manual_seed(7)
    model = RefTeacherDecoder().eval()
    rng = np.random.default_rng(11)
    sd = {k: v for k, v in model.state_dict().items()
          if not k.startswith("pe")}
    sd.update(_timm_encoder_state_dict(rng))
    ckpt = {
        "epoch": 3,
        "model_state_dict": sd,
        "optimizer_state_dict": {},
        "scheduler_state_dict": {},
        "val_loss": 2.5,
        "vocab_size": V,
    }
    path = tmp_path_factory.mktemp("pth") / "best_teacher_model.pth"
    torch.save(ckpt, str(path))
    return str(path), model


def test_reference_pth_schema_roundtrip(reference_pth):
    """load_reference_pth -> teacher_from_torch consumes EVERY tensor of a
    production-dims reference checkpoint (no silently-dropped weights)."""
    path, _ = reference_pth
    ck = TC.load_reference_pth(path)
    assert ck["epoch"] == 3 and int(ck["vocab_size"]) == V
    cfg = TeacherConfig(vocab_size=V, dropout=0.0)
    km = TC.teacher_keymap(cfg)
    leaves = []
    _keymap_leaves(km, leaves)
    assert sorted(leaves) == sorted(ck["model_state_dict"].keys())
    params = TC.teacher_from_torch(ck["model_state_dict"], cfg)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    assert n_params > 20e6  # the ~25M production teacher (README.md:10)


def test_reference_pth_serves_with_torch_beam_parity(reference_pth):
    """The converted checkpoint serves: encoder forward at 224px, packed
    beam over the resulting memory — token- and score-parity with the
    torch reference beam on the same memory (f32 both sides)."""
    path, model = reference_pth
    ck = TC.load_reference_pth(path)
    cfg = TeacherConfig(vocab_size=V, dropout=0.0)
    params = jax.tree.map(jnp.asarray,
                          TC.teacher_from_torch(ck["model_state_dict"], cfg))

    imgs = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 3, 224, 224)), jnp.float32)
    memory = TM.encode_image(params, imgs, cfg)
    assert memory.shape == (2, 197, E)
    mem_np = np.asarray(memory, np.float32)
    assert np.isfinite(mem_np).all()

    max_length, K = 8, 3
    seqs, scores, lens = D.beam_search_teacher_packed(
        params, memory, cfg, max_length=max_length, beam_size=K)
    for n in range(2):
        ref = _torch_reference_beam(
            model, torch.from_numpy(mem_np[n].reshape(197, 1, E)),
            max_length=max_length, beam_size=K)
        ours_n = int(np.isfinite(np.asarray(scores[n])).sum())
        assert ours_n == len(ref)
        for i in range(ours_n):
            ours = np.asarray(seqs[n, i])[: int(lens[n, i])].tolist()
            theirs, their_score = ref[i]
            assert ours == theirs, f"img {n} hyp {i}: {ours} != {theirs}"
            assert abs(float(scores[n, i]) - their_score) < 5e-3
