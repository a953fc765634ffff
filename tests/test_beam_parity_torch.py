"""Cross-framework beam-search parity: the reference's beam semantics
implemented over torch nn.TransformerDecoder (full-prefix re-runs, dynamic
beam shrink, GNMT penalty — teacher_model.py:108-252) must return the same
hypotheses as our KV-cached fixed-width beam, given the same weights
(converted torch->JAX) and the same encoder memory."""

import math

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from imagecaptioner_tpu.core.config import TeacherConfig
from imagecaptioner_tpu.data.vocabulary import END, START
from imagecaptioner_tpu.ops import decode as D

V, E, HEADS, LAYERS, L = 80, 32, 4, 2, 9


class TorchTeacherDecoder(tnn.Module):
    """Reference teacher decoder stack (embedding + sinusoidal PE +
    TransformerDecoder + pre-output norm + head), torch side."""

    def __init__(self):
        super().__init__()
        self.embedding = tnn.Embedding(V, E)
        layer = tnn.TransformerDecoderLayer(E, HEADS, dim_feedforward=2 * E,
                                            dropout=0.0, batch_first=False)
        self.decoder = tnn.TransformerDecoder(layer, LAYERS)
        self.pre_output_norm = tnn.LayerNorm(E)
        self.fc_out = tnn.Linear(E, V)
        pe = torch.zeros(100, E)
        pos = torch.arange(0, 100, dtype=torch.float).unsqueeze(1)
        div = torch.exp(torch.arange(0, E, 2).float()
                        * (-math.log(10000.0) / E))
        pe[:, 0::2] = torch.sin(pos * div)
        pe[:, 1::2] = torch.cos(pos * div)
        self.register_buffer("pe", pe.unsqueeze(1))

    def logits_last(self, seqs, memory):
        """Full-prefix decoder run, logits of the last position (reference
        beam inner loop, teacher_model.py:156-171)."""
        tgt = self.embedding(seqs) + self.pe[: seqs.size(0)]
        t = tgt.size(0)
        mask = torch.triu(torch.ones(t, t), diagonal=1).bool()
        dec = self.decoder(tgt, memory, tgt_mask=mask)
        return self.fc_out(self.pre_output_norm(dec[-1]))


def torch_reference_beam(model, memory, *, max_length, beam_size,
                         length_penalty=0.6):
    """Dynamic-shrink beam with GNMT penalty (reference semantics)."""
    with torch.no_grad():
        seqs = torch.full((1, beam_size), START, dtype=torch.long)
        scores = torch.full((beam_size,), float("-inf"))
        scores[0] = 0.0
        mem = memory.expand(memory.size(0), beam_size, E).contiguous()
        finished = []
        B = beam_size
        for step in range(1, max_length + 1):
            logits = model.logits_last(seqs, mem)           # (B, V)
            logp = torch.log_softmax(logits, dim=-1)
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


def _convert(model):
    from imagecaptioner_tpu.utils import torch_convert as TC

    cfg = TeacherConfig(vocab_size=V, embed_size=E, num_heads=HEADS,
                        num_decoder_layers=LAYERS, dropout=0.0,
                        encoder_dim=E, encoder_depth=1, encoder_heads=4,
                        image_size=16, patch_size=16)
    sd = {f"{k}": np.array(v.detach().numpy(), copy=True)
          for k, v in model.state_dict().items() if not k.startswith("pe")}
    km = TC.teacher_keymap(cfg)
    # only the decoder-side keys participate (no encoder in this test)
    partial = {
        "embedding": TC._apply_keymap(km["embedding"], sd),
        "decoder": TC._apply_keymap(km["decoder"], sd),
        "pre_output_norm": TC._apply_keymap(km["pre_output_norm"], sd),
        "fc_out": TC._apply_keymap(km["fc_out"], sd),
    }
    return jax.tree.map(jnp.asarray, partial), cfg


@pytest.mark.parametrize("beam_size,max_length", [(3, 8), (5, 12)])
def test_beam_parity_cross_framework(beam_size, max_length):
    torch.manual_seed(3)
    model = TorchTeacherDecoder()
    model.eval()
    params, cfg = _convert(model)

    memory_np = np.random.default_rng(0).normal(size=(L, 1, E)).astype(
        np.float32)
    ref = torch_reference_beam(model, torch.from_numpy(memory_np),
                               max_length=max_length, beam_size=beam_size)

    memory_jax = jnp.asarray(memory_np.transpose(1, 0, 2))  # (1, L, E)
    seqs, scores, lens = D.beam_search_teacher(
        params, memory_jax, cfg, max_length=max_length, beam_size=beam_size)

    n = int(np.isfinite(np.asarray(scores)).sum())
    assert n == len(ref)
    for i in range(n):
        ours = np.asarray(seqs[i])[: int(lens[i])].tolist()
        theirs, their_score = ref[i]
        assert ours == theirs, f"hyp {i}: {ours} != {theirs}"
        assert abs(float(scores[i]) - their_score) < 1e-3
