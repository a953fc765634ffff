"""Optimizer and LR schedules with torch-exact semantics.

The reference uses torch AdamW with per-group learning rates / weight decays
(train_teacher.py:168-171, train_student_kd.py:219-234,
train_student_kd_optimized.py:362-366), CosineAnnealingWarmRestarts stepped
fractionally per batch, and OneCycleLR.  This module implements AdamW over
pytrees with *per-leaf* lr-scale / weight-decay / trainable masks — the
pytree generalization of torch param groups — plus the two schedules and the
teacher's label-smoothing loss.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class AdamWState(NamedTuple):
    step: jnp.ndarray
    mu: Any
    nu: Any


def adamw_init(params: Any) -> AdamWState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamWState(step=jnp.zeros((), jnp.int32), mu=zeros,
                      nu=jax.tree.map(jnp.zeros_like, params))


def adamw_update(
    grads: Any, state: AdamWState, params: Any, *, lr: jnp.ndarray,
    lr_scale: Any = None, weight_decay: Any = 0.01, trainable: Any = None,
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
) -> Tuple[Any, AdamWState]:
    """torch.optim.AdamW step.  ``lr_scale``/``weight_decay``/``trainable``
    may be scalars or pytrees matching ``params`` (param-group semantics)."""
    step = state.step + 1
    bc1 = 1.0 - b1 ** step.astype(jnp.float32)
    bc2 = 1.0 - b2 ** step.astype(jnp.float32)

    def _leafify(x, like):
        if isinstance(x, (int, float)) or x is None:
            return jax.tree.map(lambda _: x, like)
        return x

    lr_scale = _leafify(1.0 if lr_scale is None else lr_scale, params)
    weight_decay = _leafify(weight_decay, params)
    trainable = _leafify(True if trainable is None else trainable, params)

    def upd(g, m, v, p, scale, wd, tr):
        m_new = b1 * m + (1 - b1) * g
        v_new = b2 * v + (1 - b2) * jnp.square(g)
        m_hat = m_new / bc1
        v_hat = v_new / bc2
        leaf_lr = lr * scale
        # torch AdamW: p -= lr*wd*p (decoupled), then adam step
        new_p = p * (1.0 - leaf_lr * wd) - leaf_lr * m_hat / (
            jnp.sqrt(v_hat) + eps)
        if tr is False:
            return p, m, v
        return new_p, m_new, v_new

    out = jax.tree.map(upd, grads, state.mu, state.nu, params, lr_scale,
                       weight_decay, trainable)
    new_params = jax.tree.map(lambda t: t[0], out,
                              is_leaf=lambda x: isinstance(x, tuple))
    new_mu = jax.tree.map(lambda t: t[1], out,
                          is_leaf=lambda x: isinstance(x, tuple))
    new_nu = jax.tree.map(lambda t: t[2], out,
                          is_leaf=lambda x: isinstance(x, tuple))
    return new_params, AdamWState(step=step, mu=new_mu, nu=new_nu)


def clip_by_global_norm(grads: Any, max_norm: float) -> Any:
    """torch.nn.utils.clip_grad_norm_ semantics."""
    leaves = jax.tree.leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in leaves))
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-6))
    return jax.tree.map(lambda g: (g.astype(jnp.float32) * scale).astype(g.dtype),
                        grads), norm


# ---------------------------------------------------------------------------
# Schedules
# ---------------------------------------------------------------------------


def cosine_warm_restarts(t: jnp.ndarray, *, base_lr: float, t0: int = 5,
                         t_mult: int = 2, eta_min: float = 1e-6) -> jnp.ndarray:
    """torch CosineAnnealingWarmRestarts at continuous epoch time ``t``
    (the trainers step it fractionally per batch, train_teacher.py:220)."""
    t = jnp.asarray(t, jnp.float32)
    if t_mult == 1:
        t_cur = jnp.mod(t, t0)
        t_i = jnp.float32(t0)
    else:
        # n = floor(log_mult(t/t0 * (mult-1) + 1))
        n = jnp.floor(
            jnp.log(t / t0 * (t_mult - 1.0) + 1.0) / math.log(t_mult))
        start = t0 * (t_mult ** n - 1.0) / (t_mult - 1.0)
        t_cur = t - start
        t_i = t0 * (jnp.float32(t_mult) ** n)
    return eta_min + (base_lr - eta_min) * (
        1.0 + jnp.cos(jnp.pi * t_cur / t_i)) / 2.0


def onecycle_lr(step: jnp.ndarray, *, max_lr: float, total_steps: int,
                pct_start: float = 0.1, div_factor: float = 10.0,
                final_div_factor: float = 100.0) -> jnp.ndarray:
    """torch OneCycleLR (cos anneal strategy) — train_student_kd_optimized.py:369-378."""
    step = jnp.asarray(step, jnp.float32)
    initial = max_lr / div_factor
    final = initial / final_div_factor
    up_steps = jnp.float32(pct_start * total_steps - 1.0)
    down_steps = jnp.float32(total_steps - 1.0) - up_steps

    def cos_anneal(start, end, pct):
        return end + (start - end) * (1.0 + jnp.cos(jnp.pi * pct)) / 2.0

    pct_up = jnp.clip(step / jnp.maximum(up_steps, 1.0), 0.0, 1.0)
    pct_down = jnp.clip((step - up_steps) / jnp.maximum(down_steps, 1.0),
                        0.0, 1.0)
    return jnp.where(step <= up_steps,
                     cos_anneal(initial, max_lr, pct_up),
                     cos_anneal(max_lr, final, pct_down))


# ---------------------------------------------------------------------------
# Label smoothing (train_teacher.py:131-155)
# ---------------------------------------------------------------------------


def label_smoothing_loss(
    logits: jnp.ndarray, targets: jnp.ndarray, *, num_classes: int,
    smoothing: float = 0.1, ignore_index: int = 0,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Reference semantics: uniform smoothing/(V-1), confidence at target,
    PAD class column zeroed, PAD-target rows zeroed — but the mean divides by
    ALL rows (ignored rows count in the denominator, :149).

    With static padding, rows at/after the per-batch max length are excluded
    from the row count via ``lengths`` so values match the reference.
    """
    T, B, V = logits.shape
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    confidence = 1.0 - smoothing
    fill = smoothing / (num_classes - 1)
    one_hot = jax.nn.one_hot(targets, V, dtype=jnp.float32)
    true_dist = fill * (1.0 - one_hot) + confidence * one_hot
    true_dist = true_dist.at[..., ignore_index].set(0.0)
    row_valid = (targets != ignore_index).astype(jnp.float32)
    loss_rows = -jnp.sum(true_dist * logp, axis=-1) * row_valid
    if lengths is None:
        denom = jnp.float32(T * B)
    else:
        valid_steps = jnp.maximum(jnp.max(lengths) - 1, 1).astype(jnp.float32)
        steps = jnp.arange(T, dtype=jnp.float32)[:, None]
        in_range = (steps < valid_steps).astype(jnp.float32)
        loss_rows = loss_rows * in_range
        denom = valid_steps * B
    return jnp.sum(loss_rows) / denom
