"""Numerical parity of core functional modules vs torch (CPU oracle)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from imagecaptioner_tpu.core import modules as M


def t2j(t):
    # copy=True: torch .numpy() shares memory and CPU jax is zero-copy, so
    # in-place torch updates (BN running stats) would otherwise leak through.
    return jnp.asarray(np.array(t.detach().numpy(), copy=True))


def assert_close(a, b, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol)


def test_dense_matches_torch():
    torch.manual_seed(0)
    lin = torch.nn.Linear(32, 64)
    x = torch.randn(4, 32)
    p = {"weight": t2j(lin.weight), "bias": t2j(lin.bias)}
    assert_close(M.dense(p, t2j(x)), lin(x).detach().numpy())


def test_layer_norm_matches_torch():
    torch.manual_seed(1)
    ln = torch.nn.LayerNorm(48)
    with torch.no_grad():
        ln.weight.mul_(1.3)
        ln.bias.add_(0.2)
    x = torch.randn(5, 7, 48)
    p = {"weight": t2j(ln.weight), "bias": t2j(ln.bias)}
    assert_close(M.layer_norm(p, t2j(x)), ln(x).detach().numpy(), atol=1e-5)


def test_embedding():
    torch.manual_seed(2)
    emb = torch.nn.Embedding(100, 16)
    ids = torch.randint(0, 100, (3, 5))
    p = {"weight": t2j(emb.weight)}
    assert_close(M.embedding(p, t2j(ids)), emb(ids).detach().numpy())


def test_mha_self_attention_matches_torch():
    torch.manual_seed(3)
    e, h = 64, 4
    mha = torch.nn.MultiheadAttention(e, h, dropout=0.0, batch_first=True)
    x = torch.randn(2, 9, e)
    out_t, w_t = mha(x, x, x, need_weights=True)
    p = {
        "in_proj_weight": t2j(mha.in_proj_weight),
        "in_proj_bias": t2j(mha.in_proj_bias),
        "out_proj": {"weight": t2j(mha.out_proj.weight), "bias": t2j(mha.out_proj.bias)},
    }
    out_j, w_j = M.multi_head_attention(
        p, t2j(x), t2j(x), t2j(x), num_heads=h, need_weights=True)
    assert_close(out_j, out_t.detach().numpy(), atol=2e-5)
    assert_close(w_j, w_t.detach().numpy(), atol=2e-5)


def test_mha_causal_mask_matches_torch():
    torch.manual_seed(4)
    e, h, L = 32, 4, 6
    mha = torch.nn.MultiheadAttention(e, h, dropout=0.0, batch_first=True)
    x = torch.randn(3, L, e)
    mask_t = torch.triu(torch.ones(L, L), diagonal=1).bool()
    out_t, _ = mha(x, x, x, attn_mask=mask_t)
    p = {
        "in_proj_weight": t2j(mha.in_proj_weight),
        "in_proj_bias": t2j(mha.in_proj_bias),
        "out_proj": {"weight": t2j(mha.out_proj.weight), "bias": t2j(mha.out_proj.bias)},
    }
    out_j, _ = M.multi_head_attention(
        p, t2j(x), t2j(x), t2j(x), num_heads=h, attn_mask=M.causal_mask(L))
    assert_close(out_j, out_t.detach().numpy(), atol=2e-5)


def test_conv2d_matches_torch():
    torch.manual_seed(5)
    conv = torch.nn.Conv2d(3, 8, kernel_size=3, stride=2, padding=1)
    x = torch.randn(2, 3, 16, 16)
    y_t = conv(x).detach().numpy()  # NCHW
    p = {"weight": t2j(conv.weight), "bias": t2j(conv.bias)}
    x_j = jnp.transpose(t2j(x), (0, 2, 3, 1))  # NHWC
    y_j = M.conv2d(p, x_j, stride=2, padding=1)
    assert_close(jnp.transpose(y_j, (0, 3, 1, 2)), y_t, atol=1e-4)


def test_grouped_conv_matches_torch():
    torch.manual_seed(6)
    conv = torch.nn.Conv2d(16, 16, kernel_size=3, padding=1, groups=16, bias=False)
    x = torch.randn(2, 16, 8, 8)
    y_t = conv(x).detach().numpy()
    p = {"weight": t2j(conv.weight)}
    x_j = jnp.transpose(t2j(x), (0, 2, 3, 1))
    y_j = M.conv2d(p, x_j, stride=1, padding=1, groups=16)
    assert_close(jnp.transpose(y_j, (0, 3, 1, 2)), y_t, atol=1e-4)


def test_max_pool_matches_torch():
    torch.manual_seed(7)
    x = torch.randn(2, 4, 10, 10)
    y_t = torch.nn.functional.max_pool2d(x, 3, 2, 1).numpy()
    x_j = jnp.transpose(t2j(x), (0, 2, 3, 1))
    y_j = M.max_pool2d(x_j, 3, 2, 1)
    assert_close(jnp.transpose(y_j, (0, 3, 1, 2)), y_t)


@pytest.mark.parametrize("in_hw,out_hw", [((7, 7), (7, 7)), ((14, 14), (7, 7)), ((7, 7), (8, 8))])
def test_adaptive_avg_pool2d_matches_torch(in_hw, out_hw):
    torch.manual_seed(8)
    x = torch.randn(2, 5, *in_hw)
    y_t = torch.nn.functional.adaptive_avg_pool2d(x, out_hw).numpy()
    x_j = jnp.transpose(t2j(x), (0, 2, 3, 1))
    y_j = M.adaptive_avg_pool2d(x_j, out_hw)
    assert_close(jnp.transpose(y_j, (0, 3, 1, 2)), y_t, atol=1e-5)


def test_adaptive_avg_pool1d_matches_torch():
    torch.manual_seed(9)
    x = torch.randn(2, 256, 197)
    y_t = torch.nn.functional.adaptive_avg_pool1d(x, 49).numpy()
    assert_close(M.adaptive_avg_pool1d(t2j(x), 49), y_t, atol=1e-5)


def test_batch_norm_train_and_eval_match_torch():
    torch.manual_seed(10)
    bn = torch.nn.BatchNorm2d(6)
    with torch.no_grad():
        bn.weight.mul_(1.5)
        bn.bias.add_(0.3)
    x = torch.randn(4, 6, 5, 5)
    p = {"weight": t2j(bn.weight), "bias": t2j(bn.bias)}
    s = {"running_mean": t2j(bn.running_mean), "running_var": t2j(bn.running_var)}

    bn.train()
    y_t = bn(x).detach().numpy()
    x_j = jnp.transpose(t2j(x), (0, 2, 3, 1))
    y_j, s2 = M.batch_norm(p, s, x_j, train=True)
    assert_close(jnp.transpose(y_j, (0, 3, 1, 2)), y_t, atol=1e-4)
    assert_close(s2["running_mean"], bn.running_mean.numpy(), atol=1e-5)
    assert_close(s2["running_var"], bn.running_var.numpy(), atol=1e-5)

    bn.eval()
    y_t = bn(x).detach().numpy()
    y_j, _ = M.batch_norm(p, s2, x_j, train=False)
    assert_close(jnp.transpose(y_j, (0, 3, 1, 2)), y_t, atol=1e-4)


def test_sinusoidal_pe_matches_reference_formula():
    # teacher_model.py:13-23 builds pe (max_len, d) then uses pe[:t]
    import math

    d, L = 12, 30
    pe = M.sinusoidal_positional_encoding(L, d)
    pos = torch.arange(0, L, dtype=torch.float).unsqueeze(1)
    div = torch.exp(torch.arange(0, d, 2).float() * (-math.log(10000.0) / d))
    ref = torch.zeros(L, d)
    ref[:, 0::2] = torch.sin(pos * div)
    ref[:, 1::2] = torch.cos(pos * div)
    assert_close(pe, ref.numpy(), atol=1e-6)


def test_dropout_scaling():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((1000,))
    y = M.dropout(key, x, 0.5, train=True)
    assert float(jnp.max(y)) == 2.0  # inverted dropout scale
    assert abs(float(jnp.mean(y)) - 1.0) < 0.1
    assert (M.dropout(None, x, 0.5, train=False) == x).all()


def test_orthogonal_init_is_orthogonal():
    key = jax.random.PRNGKey(1)
    w = M.orthogonal(key, (64, 64))
    assert_close(w @ w.T, np.eye(64), atol=1e-4)
    w2 = M.orthogonal(key, (32, 64))
    assert_close(w2 @ w2.T, np.eye(32), atol=1e-4)
