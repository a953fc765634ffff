"""LSTM scan decoders vs torch oracles (exact cell semantics + full decoder)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from imagecaptioner_tpu.core.config import StudentConfig, full_student_config, compact_student_config
from imagecaptioner_tpu.models import lstm as L


def j(t):
    return jnp.asarray(np.array(t.detach().numpy(), copy=True))


def test_lstm_stack_matches_torch_lstm():
    torch.manual_seed(0)
    E, H, layers, B, T = 16, 24, 2, 3, 7
    lstm = tnn.LSTM(input_size=E, hidden_size=H, num_layers=layers,
                    dropout=0.0, batch_first=True)
    params = []
    for li in range(layers):
        params.append({
            "weight_ih": j(getattr(lstm, f"weight_ih_l{li}")),
            "weight_hh": j(getattr(lstm, f"weight_hh_l{li}")),
            "bias_ih": j(getattr(lstm, f"bias_ih_l{li}")),
            "bias_hh": j(getattr(lstm, f"bias_hh_l{li}")),
        })
    x = torch.randn(B, T, E)
    out_t, (h_t, c_t) = lstm(x)

    hc = L.init_hidden(layers, B, H)
    outs = []
    for t in range(T):
        h_top, hc = L.lstm_stack_step(params, j(x[:, t, :]), hc[0], hc[1])
        outs.append(h_top)
    out_j = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(out_j), out_t.detach().numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(hc[0]), h_t.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hc[1]), c_t.detach().numpy(), atol=1e-5)


class _TorchFullDecoderOracle(tnn.Module):
    """Reference LSTMDecoder semantics (student_model.py:121-256), test-only."""

    def __init__(self, vocab, E, H, layers):
        super().__init__()
        self.embedding = tnn.Embedding(vocab, E)
        self.attention = tnn.Linear(H + E, E)
        self.attention_combine = tnn.Linear(2 * E, E)
        self.lstm = tnn.LSTM(E, H, layers, batch_first=True)
        self.out1 = tnn.Linear(H, E)
        self.out2 = tnn.Linear(E, vocab)
        self.layers, self.H = layers, H

    def forward(self, feats, captions):
        B = feats.size(0)
        T = captions.size(0)
        h = torch.zeros(self.layers, B, self.H)
        c = torch.zeros(self.layers, B, self.H)
        emb = self.embedding(captions).permute(1, 0, 2)
        outs, hiddens, attns = [], [], []
        for t in range(T):
            hid = h[-1]
            L_ = feats.size(1)
            combined = torch.cat(
                [hid.unsqueeze(1).expand(B, L_, self.H), feats], dim=2)
            scores = torch.tanh(self.attention(combined)).sum(dim=2)
            w = torch.softmax(scores, dim=1)
            ctx = torch.bmm(w.unsqueeze(1), feats).squeeze(1)
            x = self.attention_combine(torch.cat([emb[:, t, :], ctx], dim=1))
            o, (h, c) = self.lstm(x.unsqueeze(1), (h, c))
            logit = self.out2(torch.relu(self.out1(o.squeeze(1))))
            outs.append(logit)
            hiddens.append(h[-1])
            attns.append(w)
        return (torch.stack(outs), torch.stack(hiddens), torch.stack(attns))


def test_full_decoder_matches_reference_semantics():
    torch.manual_seed(1)
    V, E, H, layers, B, T, Lf = 50, 16, 24, 2, 2, 6, 9
    oracle = _TorchFullDecoderOracle(V, E, H, layers)
    cfg = StudentConfig(vocab_size=V, embed_size=E, hidden_size=H,
                        num_layers=layers, dropout=0.0, variant="full")
    p = {
        "embedding": {"weight": j(oracle.embedding.weight)},
        "attention": {"weight": j(oracle.attention.weight), "bias": j(oracle.attention.bias)},
        "attention_combine": {"weight": j(oracle.attention_combine.weight),
                              "bias": j(oracle.attention_combine.bias)},
        "lstm": [
            {"weight_ih": j(getattr(oracle.lstm, f"weight_ih_l{li}")),
             "weight_hh": j(getattr(oracle.lstm, f"weight_hh_l{li}")),
             "bias_ih": j(getattr(oracle.lstm, f"bias_ih_l{li}")),
             "bias_hh": j(getattr(oracle.lstm, f"bias_hh_l{li}"))}
            for li in range(layers)
        ],
        "output_projection": {
            "fc1": {"weight": j(oracle.out1.weight), "bias": j(oracle.out1.bias)},
            "fc2": {"weight": j(oracle.out2.weight), "bias": j(oracle.out2.bias)},
        },
    }
    feats = torch.randn(B, Lf, E)
    captions = torch.randint(0, V, (T, B))
    logits_t, hiddens_t, attns_t = oracle(feats, captions)
    logits_j, hiddens_j, attns_j = L.full_decoder_apply(
        p, j(feats), j(captions), cfg, train=False)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.detach().numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(hiddens_j), hiddens_t.detach().numpy(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(attns_j), attns_t.detach().numpy(),
                               atol=1e-5, rtol=1e-4)


class _TorchCompactDecoderOracle(tnn.Module):
    """Reference CompactLSTMDecoder semantics (student_model_compact.py:68-191)."""

    def __init__(self, vocab, E, H):
        super().__init__()
        self.embedding = tnn.Embedding(vocab, E)
        self.attention = tnn.Linear(H, E)
        self.lstm = tnn.LSTM(E, H, 1, batch_first=True)
        self.out = tnn.Linear(H, vocab)
        self.H = H

    def forward(self, feats, captions):
        B, T = feats.size(0), captions.size(0)
        h = torch.zeros(1, B, self.H)
        c = torch.zeros(1, B, self.H)
        emb = self.embedding(captions).permute(1, 0, 2)
        outs = []
        for t in range(T):
            hp = self.attention(h[-1]).unsqueeze(1)
            w = torch.softmax(torch.bmm(hp, feats.transpose(1, 2)).squeeze(1), dim=1)
            ctx = torch.bmm(w.unsqueeze(1), feats).squeeze(1)
            x = emb[:, t, :] + ctx
            o, (h, c) = self.lstm(x.unsqueeze(1), (h, c))
            outs.append(self.out(o.squeeze(1)))
        return torch.stack(outs)


def test_compact_decoder_matches_reference_semantics():
    torch.manual_seed(2)
    V, E, H, B, T, Lf = 40, 12, 12, 2, 5, 7
    oracle = _TorchCompactDecoderOracle(V, E, H)
    cfg = compact_student_config(V, embed_size=E, hidden_size=H)
    p = {
        "embedding": {"weight": j(oracle.embedding.weight)},
        "attention": {"weight": j(oracle.attention.weight), "bias": j(oracle.attention.bias)},
        "lstm": [{"weight_ih": j(oracle.lstm.weight_ih_l0),
                  "weight_hh": j(oracle.lstm.weight_hh_l0),
                  "bias_ih": j(oracle.lstm.bias_ih_l0),
                  "bias_hh": j(oracle.lstm.bias_hh_l0)}],
        "output_projection": {"weight": j(oracle.out.weight), "bias": j(oracle.out.bias)},
    }
    feats = torch.randn(B, Lf, E)
    captions = torch.randint(0, V, (T, B))
    logits_t = oracle(feats, captions)
    logits_j, _, _ = L.compact_decoder_apply(p, j(feats), j(captions), cfg)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t.detach().numpy(),
                               atol=1e-4, rtol=1e-4)


def test_decoder_step_consistent_with_apply():
    """Step-by-step decode path must equal the scan path (teacher forcing)."""
    key = jax.random.PRNGKey(0)
    cfg = full_student_config(30, embed_size=8, hidden_size=12, dropout=0.0)
    p = L.full_decoder_init(key, cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8))
    captions = jax.random.randint(jax.random.PRNGKey(2), (4, 2), 0, 30)
    logits, hiddens, attns = L.full_decoder_apply(p, feats, captions, cfg)

    hc = L.init_hidden(cfg.num_layers, 2, cfg.hidden_size)
    from imagecaptioner_tpu.core import modules as M
    for t in range(4):
        emb = M.embedding(p["embedding"], captions[t])
        h_top, hc, attn = L.full_decoder_step(p, emb, hc, feats, cfg)
        step_logits = L.output_projection(p["output_projection"], h_top, cfg)
        np.testing.assert_allclose(np.asarray(step_logits),
                                   np.asarray(logits[t]), atol=1e-5, rtol=1e-4)
