"""AdamW / schedules / label smoothing vs torch oracles."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from imagecaptioner_tpu.train import optim as O


def j(t):
    return jnp.asarray(np.array(t.detach().numpy(), copy=True))


def test_adamw_matches_torch_multiple_steps():
    torch.manual_seed(0)
    w = torch.nn.Parameter(torch.randn(4, 3))
    b = torch.nn.Parameter(torch.randn(3))
    opt = torch.optim.AdamW([w, b], lr=1e-2, weight_decay=0.01)
    params = {"w": j(w), "b": j(b)}
    state = O.adamw_init(params)
    for step in range(5):
        gw = torch.randn(4, 3)
        gb = torch.randn(3)
        w.grad, b.grad = gw.clone(), gb.clone()
        opt.step()
        grads = {"w": j(gw), "b": j(gb)}
        params, state = O.adamw_update(grads, state, params, lr=1e-2,
                                       weight_decay=0.01)
    np.testing.assert_allclose(np.asarray(params["w"]), w.detach().numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["b"]), b.detach().numpy(),
                               atol=1e-6)


def test_adamw_param_groups_match_torch():
    torch.manual_seed(1)
    enc = torch.nn.Parameter(torch.randn(4, 4))
    dec = torch.nn.Parameter(torch.randn(4, 4))
    opt = torch.optim.AdamW(
        [{"params": [enc], "lr": 1e-3 * 0.1}, {"params": [dec], "lr": 1e-3}],
        weight_decay=0.01)
    params = {"enc": j(enc), "dec": j(dec)}
    state = O.adamw_init(params)
    for _ in range(3):
        ge, gd = torch.randn(4, 4), torch.randn(4, 4)
        enc.grad, dec.grad = ge.clone(), gd.clone()
        opt.step()
        params, state = O.adamw_update(
            {"enc": j(ge), "dec": j(gd)}, state, params, lr=1e-3,
            lr_scale={"enc": 0.1, "dec": 1.0}, weight_decay=0.01)
    np.testing.assert_allclose(np.asarray(params["enc"]), enc.detach().numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["dec"]), dec.detach().numpy(),
                               atol=1e-6)


def test_adamw_frozen_leaves_unchanged():
    params = {"a": jnp.ones((3,)), "frozen": jnp.ones((3,))}
    state = O.adamw_init(params)
    grads = {"a": jnp.ones((3,)), "frozen": jnp.ones((3,))}
    new_params, _ = O.adamw_update(grads, state, params, lr=0.1,
                                   trainable={"a": True, "frozen": False})
    assert not np.allclose(np.asarray(new_params["a"]), 1.0)
    np.testing.assert_array_equal(np.asarray(new_params["frozen"]),
                                  np.ones((3,)))


def test_clip_by_global_norm_matches_torch():
    torch.manual_seed(2)
    g1, g2 = torch.randn(5, 5) * 3, torch.randn(7) * 3
    p1 = torch.nn.Parameter(torch.zeros(5, 5))
    p2 = torch.nn.Parameter(torch.zeros(7))
    p1.grad, p2.grad = g1.clone(), g2.clone()
    norm_t = torch.nn.utils.clip_grad_norm_([p1, p2], max_norm=1.0)
    (clipped, norm_j) = O.clip_by_global_norm({"a": j(g1), "b": j(g2)}, 1.0)
    np.testing.assert_allclose(float(norm_j), float(norm_t), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(clipped["a"]), p1.grad.numpy(),
                               atol=1e-6)


def test_cosine_warm_restarts_matches_torch():
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=1e-4)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
        opt, T_0=5, T_mult=2, eta_min=1e-6)
    for t in [0.0, 0.5, 2.3, 4.99, 5.0, 7.7, 14.9, 15.0, 20.0, 34.9]:
        sched.step(t)
        lr_t = opt.param_groups[0]["lr"]
        lr_j = float(O.cosine_warm_restarts(jnp.float32(t), base_lr=1e-4,
                                            t0=5, t_mult=2, eta_min=1e-6))
        assert abs(lr_j - lr_t) < 1e-9, (t, lr_j, lr_t)


def test_onecycle_matches_torch():
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=3e-4)
    total = 100
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=3e-4, total_steps=total, pct_start=0.1,
        div_factor=10.0, final_div_factor=100.0)
    for step in range(total):
        lr_t = opt.param_groups[0]["lr"]
        lr_j = float(O.onecycle_lr(jnp.float32(step), max_lr=3e-4,
                                   total_steps=total))
        assert abs(lr_j - lr_t) / lr_t < 2e-3, (step, lr_j, lr_t)
        opt.step()
        sched.step()


def test_flat_adamw_matches_per_leaf():
    """The fused FlatAdamW must be numerically identical to the torch-verified
    per-leaf implementation (param groups, wd, trainable mask, clip)."""
    key = jax.random.PRNGKey(0)
    params = {
        "enc": {"w": jax.random.normal(key, (8, 4)), "b": jnp.zeros((4,))},
        "dec": {"w": jax.random.normal(jax.random.fold_in(key, 1), (6, 3))},
        "frozen": jnp.ones((5,)),
    }
    scales = {"enc": {"w": 0.1, "b": 0.1}, "dec": {"w": 1.0}, "frozen": 1.0}
    wds = {"enc": {"w": 0.01, "b": 0.01}, "dec": {"w": 0.005}, "frozen": 0.01}
    trainable = {"enc": {"w": True, "b": True}, "dec": {"w": True},
                 "frozen": False}

    flat = O.FlatAdamW(params, lr_scale=scales, weight_decay=wds,
                       trainable=trainable)
    st_flat = flat.init()
    st_leaf = O.adamw_init(params)
    p_flat, p_leaf = params, params
    for i in range(4):
        grads = jax.tree.map(
            lambda x: jax.random.normal(jax.random.fold_in(key, 10 + i),
                                        x.shape), params)
        t = jnp.float32(i * 0.3)
        lr_flat = flat.lr_cosine_warm_restarts(t, base_lr=1e-3, t0=5,
                                               t_mult=2, eta_min=1e-6)
        p_flat, st_flat, norm = flat.update(grads, st_flat, p_flat,
                                            lr_flat=lr_flat, max_grad_norm=1.0)
        # per-leaf path: mask, clip, schedule, update
        g2 = jax.tree.map(lambda g, tr: g if tr else jnp.zeros_like(g),
                          grads, trainable)
        g2, norm2 = O.clip_by_global_norm(g2, 1.0)
        lr_tree = jax.tree.map(
            lambda s: O.cosine_warm_restarts(t, base_lr=1e-3 * s, t0=5,
                                             t_mult=2, eta_min=1e-6), scales)
        p_leaf, st_leaf = O.adamw_update(g2, st_leaf, p_leaf, lr=1.0,
                                         lr_scale=lr_tree, weight_decay=wds,
                                         trainable=trainable)
        np.testing.assert_allclose(float(norm), float(norm2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(p_flat), jax.tree.leaves(p_leaf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_flat_adamw_onecycle_proportionality():
    params = {"a": jnp.ones((3,)), "b": jnp.ones((2,))}
    flat = O.FlatAdamW(params, lr_scale={"a": 1.0, "b": 1.5})
    lr = flat.lr_onecycle(jnp.float32(10), max_lr=3e-4, total_steps=100)
    base = float(O.onecycle_lr(jnp.float32(10), max_lr=3e-4, total_steps=100))
    np.testing.assert_allclose(np.asarray(lr[:3]), base, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(lr[3:]), 1.5 * base, rtol=1e-6)


def test_label_smoothing_matches_reference_semantics():
    """Oracle: the inline LabelSmoothingLoss (train_teacher.py:131-155)."""
    torch.manual_seed(3)
    T_, B_, V_ = 6, 3, 20
    logits = torch.randn(T_, B_, V_)
    targets = torch.randint(1, V_, (T_, B_))
    targets[-1, :] = 0  # PAD rows

    pred = logits.view(-1, V_).log_softmax(dim=-1)
    target = targets.view(-1)
    smoothing, confidence = 0.1, 0.9
    true_dist = torch.zeros_like(pred)
    true_dist.fill_(smoothing / (V_ - 1))
    true_dist.scatter_(1, target.unsqueeze(1), confidence)
    true_dist[:, 0] = 0
    mask = torch.nonzero(target == 0)
    if mask.dim() > 0:
        true_dist.index_fill_(0, mask.squeeze(), 0.0)
    ref = torch.mean(torch.sum(-true_dist * pred, dim=1))

    got = O.label_smoothing_loss(j(logits), j(targets), num_classes=V_,
                                 smoothing=0.1)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_label_smoothing_dynamic_lengths():
    T_, B_, V_ = 8, 2, 15
    logits = jnp.asarray(np.random.default_rng(0).normal(size=(T_, B_, V_))
                         .astype(np.float32))
    targets = np.random.default_rng(1).integers(1, V_, (T_, B_)).astype(np.int32)
    targets[5:] = 0  # padded tail
    lengths = jnp.array([6, 5])  # max len 6 -> 5 teacher-forcing steps
    got_masked = O.label_smoothing_loss(
        logits, jnp.asarray(targets), num_classes=V_, lengths=lengths)
    got_trunc = O.label_smoothing_loss(
        logits[:5], jnp.asarray(targets[:5]), num_classes=V_)
    np.testing.assert_allclose(float(got_masked), float(got_trunc), rtol=1e-5)
