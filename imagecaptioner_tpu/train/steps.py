"""Jitted train/eval step factories.

One compiled step = augment + normalize + ``lax.scan`` over the gradient-
accumulation microbatches + clip + AdamW update.  The reference's Python-side
accumulation loop, AMP autocast, and GradScaler (SURVEY §3.1-3.2) collapse
into a single XLA program; bf16 compute needs no loss scaling.

Data-parallel by construction: feed batches sharded over the mesh ``data``
axis (core/mesh.py) and XLA inserts the gradient reductions over ICI — the
step functions themselves are mesh-agnostic.

Batch layout (stacked for accumulation):
  images  uint8 (A, B, S, S, 3)  host NHWC
  captions int32 (A, T, B)       time-major
  lengths int32 (A, B)
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from imagecaptioner_tpu.core.config import (
    DistillConfig, KDTrainConfig, OptimizedDistillConfig, StudentConfig,
    TeacherConfig, TeacherTrainConfig)
from imagecaptioner_tpu.data import transforms as T
from imagecaptioner_tpu.distill import losses as DL
from imagecaptioner_tpu.distill.projector import feature_projector_apply
from imagecaptioner_tpu.distill.wrapper import teacher_forward_for_kd
from imagecaptioner_tpu.models import student as SM
from imagecaptioner_tpu.models import teacher as TM
from imagecaptioner_tpu.train import optim as O


class TrainState(NamedTuple):
    params: Any
    opt_state: O.AdamWState
    model_state: Any          # BN running stats ({} for the teacher)


def _mask_grads(grads, trainable):
    return jax.tree.map(
        lambda g, t: g if t else jnp.zeros_like(g), grads, trainable)


def _lr_tree(scale_tree, lr_fn):
    """Per-leaf lr from a per-leaf base-scale tree and a schedule closure."""
    return jax.tree.map(lambda s: lr_fn(s), scale_tree)


# ---------------------------------------------------------------------------
# Teacher training (train_teacher.py:52-220 semantics)
# ---------------------------------------------------------------------------


def teacher_group_scales(params, *, encoder_scale: float = 0.1) -> Any:
    """'encoder' in name -> ``encoder_scale`` (incl. encoder_projection),
    else 1.0 (train_teacher.py:161-171; reference value 0.1).

    ``encoder_scale`` comes from ``TeacherTrainConfig.encoder_lr_scale`` —
    before round 5 that config field was silently ignored (the 0.1 was
    hard-coded here), so recipes that set it had no effect."""
    return {
        k: jax.tree.map(
            lambda _: encoder_scale if k.startswith("encoder") else 1.0, v)
        for k, v in params.items()
    }


def make_teacher_opt(params, t_cfg: TeacherConfig,
                     tr_cfg: TeacherTrainConfig) -> O.FlatAdamW:
    """Fused optimizer with the teacher's param groups baked in."""
    return O.FlatAdamW(
        params,
        lr_scale=teacher_group_scales(
            params, encoder_scale=tr_cfg.encoder_lr_scale),
        weight_decay=tr_cfg.weight_decay,
        trainable=TM.teacher_trainable_mask(params, t_cfg))


def make_teacher_train_step(
    t_cfg: TeacherConfig, tr_cfg: TeacherTrainConfig, *,
    aug: T.AugmentConfig = T.TEACHER_TRAIN_AUG, compute_dtype=jnp.float32,
    opt: Optional[O.FlatAdamW] = None,
):
    """``opt``: fused FlatAdamW (production). None falls back to the
    per-leaf AdamW (torch-verified reference path, ~10x slower update)."""

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch: Dict, epoch_time: jnp.ndarray,
             rng: jax.Array) -> Tuple[TrainState, Dict]:
        params = state.params
        trainable = TM.teacher_trainable_mask(params, t_cfg)
        scales = teacher_group_scales(
            params, encoder_scale=tr_cfg.encoder_lr_scale)

        def loss_fn(p, images_u8, captions, lengths, key):
            k_aug, k_model = jax.random.split(key)
            images = T.augment_and_normalize(k_aug, images_u8, aug,
                                             dtype=compute_dtype)
            cap_in = captions[:-1, :]
            cap_tgt = captions[1:, :]
            logits = TM.teacher_apply(p, images, cap_in, t_cfg, train=True,
                                      rng=k_model)
            loss = O.label_smoothing_loss(
                logits, cap_tgt, num_classes=t_cfg.vocab_size,
                smoothing=tr_cfg.label_smoothing, lengths=lengths)
            return loss

        grad_fn = jax.value_and_grad(loss_fn)
        A = batch["images"].shape[0]

        def accum(carry, xs):
            g_sum, loss_sum = carry
            images_u8, captions, lengths, key = xs
            loss, g = grad_fn(params, images_u8, captions, lengths, key)
            g_sum = jax.tree.map(jnp.add, g_sum, g)
            return (g_sum, loss_sum + loss), None

        zero = jax.tree.map(lambda x: jnp.zeros_like(x, jnp.float32), params)
        keys = jax.random.split(rng, A)
        (g_sum, loss_sum), _ = jax.lax.scan(
            accum, (zero, jnp.float32(0.0)),
            (batch["images"], batch["captions"], batch["lengths"], keys))
        grads = jax.tree.map(lambda g: g / A, g_sum)
        if opt is not None:
            lr_flat = opt.lr_cosine_warm_restarts(
                epoch_time, base_lr=tr_cfg.learning_rate,
                t0=tr_cfg.sched_t0, t_mult=tr_cfg.sched_t_mult,
                eta_min=tr_cfg.sched_eta_min)
            new_params, new_opt, gnorm = opt.update(
                grads, state.opt_state, params, lr_flat=lr_flat,
                max_grad_norm=tr_cfg.grad_clip)
        else:
            grads = _mask_grads(grads, trainable)
            grads, gnorm = O.clip_by_global_norm(grads, tr_cfg.grad_clip)
            lr_tree = jax.tree.map(
                lambda s: O.cosine_warm_restarts(
                    epoch_time, base_lr=tr_cfg.learning_rate * s,
                    t0=tr_cfg.sched_t0, t_mult=tr_cfg.sched_t_mult,
                    eta_min=tr_cfg.sched_eta_min),
                scales)
            new_params, new_opt = O.adamw_update(
                grads, state.opt_state, params, lr=1.0, lr_scale=lr_tree,
                weight_decay=tr_cfg.weight_decay, trainable=trainable)
        metrics = {"loss": loss_sum / A, "grad_norm": gnorm,
                   "lr": O.cosine_warm_restarts(
                       epoch_time, base_lr=tr_cfg.learning_rate,
                       t0=tr_cfg.sched_t0, t_mult=tr_cfg.sched_t_mult,
                       eta_min=tr_cfg.sched_eta_min)}
        return TrainState(new_params, new_opt, state.model_state), metrics

    return step


def _replicated_out(mesh):
    """jit kwargs pinning every output replicated over ``mesh`` — required in
    multi-host runs, where outputs GSPMD shards over the global batch would
    not be fully addressable from any one process (ADVICE r2)."""
    if mesh is None:
        return {}
    from jax.sharding import NamedSharding, PartitionSpec as P

    return {"out_shardings": NamedSharding(mesh, P())}


def make_teacher_eval_step(t_cfg: TeacherConfig, tr_cfg: TeacherTrainConfig, *,
                           compute_dtype=jnp.float32, mesh=None):
    """``mesh``: pass the training mesh to evaluate global eval batches
    (assembled by common.put_global_batch) with replicated outputs."""
    @functools.partial(jax.jit, **_replicated_out(mesh))
    def step(params, batch: Dict) -> jnp.ndarray:
        images = T.normalize(batch["images"], dtype=compute_dtype)
        cap_in = batch["captions"][:-1, :]
        cap_tgt = batch["captions"][1:, :]
        logits = TM.teacher_apply(params, images, cap_in, t_cfg, train=False)
        return O.label_smoothing_loss(
            logits, cap_tgt, num_classes=t_cfg.vocab_size,
            smoothing=tr_cfg.label_smoothing, lengths=batch["lengths"])

    return step


# ---------------------------------------------------------------------------
# KD training (train_student_kd.py:251-303 semantics)
# ---------------------------------------------------------------------------


def kd_group_scales(params, *, encoder_scale: float = 0.1,
                    others_scale: float = 1.0) -> Any:
    """Student 'encoder' -> ``encoder_scale`` (reference 0.1); decoder ->
    1.0; others (refinement + projectors) -> others_scale
    (train_student_kd.py:219-234).

    ``encoder_scale`` comes from ``KDTrainConfig.encoder_lr_scale`` — before
    round 5 that config field was silently ignored (0.1 hard-coded here), so
    the r4 "grounded" runs actually trained their encoder at lr x0.1 despite
    recording encoder_lr_scale=1.0 (noted in docs/round5_notes.md)."""
    out = {}
    for k, v in params.items():
        if k == "student":
            out[k] = {
                sk: jax.tree.map(
                    lambda _: encoder_scale if sk == "encoder"
                    else (1.0 if sk == "decoder" else others_scale), sv)
                for sk, sv in v.items()
            }
        else:  # projectors
            out[k] = jax.tree.map(lambda _: others_scale, v)
    return out


def _kd_forward(teacher_params, t_cfg, student_params, student_state, s_cfg,
                projectors, images, captions_in, *, train, rng,
                proj_rng=None, teacher_dtype=jnp.float32):
    teacher_out = teacher_forward_for_kd(teacher_params, images, captions_in,
                                         t_cfg, compute_dtype=teacher_dtype)
    (s_logits, s_feats, s_hiddens, _), new_state = SM.student_apply(
        student_params, student_state, images, captions_in, s_cfg,
        train=train, rng=rng)
    projected = feature_projector_apply(
        projectors["encoder"], teacher_out["encoder_features"],
        teacher_seq_len=t_cfg.num_tokens, student_seq_len=s_cfg.feature_tokens,
        train=train, rng=proj_rng)
    student_out = {"logits": s_logits, "encoder_features": s_feats,
                   "hidden_states": s_hiddens}
    teacher_out = dict(teacher_out, encoder_features=projected,
                       hidden_states=None)
    return student_out, teacher_out, new_state


def make_kd_opt(params, s_cfg: StudentConfig, tr_cfg, *,
                others_scale: float = 1.0,
                others_wd: Optional[float] = None) -> O.FlatAdamW:
    """Fused optimizer with the KD param groups baked in."""
    scales = kd_group_scales(
        params, encoder_scale=getattr(tr_cfg, "encoder_lr_scale", 0.1),
        others_scale=others_scale)
    trainable = {
        "student": SM.student_trainable_mask(params["student"], s_cfg),
        "projectors": jax.tree.map(lambda _: True, params["projectors"]),
    }
    wd_tree = jax.tree.map(lambda _: tr_cfg.weight_decay, params)
    if others_wd is not None:
        wd_tree = {
            "student": {
                sk: jax.tree.map(
                    lambda _: tr_cfg.weight_decay
                    if sk in ("encoder", "decoder") else others_wd, sv)
                for sk, sv in params["student"].items()
            },
            "projectors": jax.tree.map(lambda _: others_wd,
                                       params["projectors"]),
        }
    return O.FlatAdamW(params, lr_scale=scales, weight_decay=wd_tree,
                       trainable=trainable)


def make_kd_train_step(
    t_cfg: TeacherConfig, s_cfg: StudentConfig, d_cfg: DistillConfig,
    tr_cfg: KDTrainConfig, *, aug: T.AugmentConfig = T.KD_TRAIN_AUG,
    compute_dtype=jnp.float32, optimized: bool = False,
    od_cfg: Optional[OptimizedDistillConfig] = None,
    onecycle_total_steps: Optional[int] = None,
    others_scale: float = 1.0, others_wd: Optional[float] = None,
    opt: Optional[O.FlatAdamW] = None,
):
    """KD step; ``optimized=True`` switches to OptimizedDistillationLoss +
    OneCycleLR (train_student_kd_optimized.py).  ``opt``: fused FlatAdamW
    (production); None falls back to the per-leaf reference path."""

    teacher_dtype = (jnp.bfloat16 if getattr(tr_cfg, "teacher_bf16", False)
                     else jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, teacher_params, batch: Dict,
             sched_t: jnp.ndarray, epoch: jnp.ndarray, rng: jax.Array
             ) -> Tuple[TrainState, Dict]:
        if teacher_dtype != jnp.float32:
            # cast once per step, OUTSIDE the accumulation scan: the wrapper
            # casts again per micro-batch (its API contract takes f32
            # params), but on already-bf16 leaves that inner cast traces to
            # a no-op convert XLA elides — hoisting here keeps the real
            # f32->bf16 copies out of the scan body
            from imagecaptioner_tpu.core import precision as _P

            teacher_params = _P.bf16_compute(teacher_params)
        params = state.params  # {'student': ..., 'projectors': ...}
        trainable = {
            "student": SM.student_trainable_mask(params["student"], s_cfg),
            "projectors": jax.tree.map(lambda _: True, params["projectors"]),
        }
        scales = kd_group_scales(
            params, encoder_scale=getattr(tr_cfg, "encoder_lr_scale", 0.1),
            others_scale=others_scale)
        wd_tree = jax.tree.map(lambda _: tr_cfg.weight_decay, params)
        if others_wd is not None:
            # optimized trainer: 'others' group gets its own weight decay
            wd_tree = {
                "student": {
                    sk: jax.tree.map(
                        lambda _: tr_cfg.weight_decay
                        if sk in ("encoder", "decoder") else others_wd, sv)
                    for sk, sv in params["student"].items()
                },
                "projectors": jax.tree.map(lambda _: others_wd,
                                           params["projectors"]),
            }

        def loss_fn(p, model_state, images_u8, captions, lengths, key):
            k_aug, k_model, k_proj = jax.random.split(key, 3)
            images = T.augment_and_normalize(k_aug, images_u8, aug,
                                             dtype=compute_dtype)
            cap_in = captions[:-1, :]
            cap_tgt = captions[1:, :]
            student_out, teacher_out, new_state = _kd_forward(
                teacher_params, t_cfg, p["student"], model_state, s_cfg,
                p["projectors"], images, cap_in, train=True, rng=k_model,
                proj_rng=k_proj, teacher_dtype=teacher_dtype)
            if optimized:
                loss, ld = DL.optimized_distillation_loss(
                    student_out, teacher_out, cap_tgt, od_cfg, epoch,
                    lengths=lengths)
            else:
                loss, ld = DL.distillation_loss(
                    student_out, teacher_out, cap_tgt, d_cfg, lengths=lengths)
            return loss, (ld, new_state)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        A = batch["images"].shape[0]
        model_state = state.model_state

        def accum(carry, xs):
            g_sum, loss_sum, ld_sum, mstate = carry
            images_u8, captions, lengths, key = xs
            (loss, (ld, mstate)), g = grad_fn(params, mstate, images_u8,
                                              captions, lengths, key)
            g_sum = jax.tree.map(jnp.add, g_sum, g)
            ld_sum = jax.tree.map(jnp.add, ld_sum, ld)
            return (g_sum, loss_sum + loss, ld_sum, mstate), None

        zero = jax.tree.map(lambda x: jnp.zeros_like(x, jnp.float32), params)
        zero_ld = {k: jnp.float32(0.0) for k in (
            ["total_loss", "ce_loss", "token_kd_loss", "feature_kd_loss",
             "hidden_kd_loss"] + (["kd_loss", "hard_loss"] if optimized else []))}
        keys = jax.random.split(rng, A)
        (g_sum, loss_sum, ld_sum, model_state), _ = jax.lax.scan(
            accum, (zero, jnp.float32(0.0), zero_ld, model_state),
            (batch["images"], batch["captions"], batch["lengths"], keys))
        grads = jax.tree.map(lambda g: g / A, g_sum)
        if optimized:
            lr_fn = lambda s: O.onecycle_lr(  # noqa: E731
                sched_t, max_lr=tr_cfg.learning_rate * s,
                total_steps=onecycle_total_steps,
                pct_start=0.1, div_factor=10.0, final_div_factor=100.0)
        else:
            lr_fn = lambda s: O.cosine_warm_restarts(  # noqa: E731
                sched_t, base_lr=tr_cfg.learning_rate * s,
                t0=tr_cfg.sched_t0, t_mult=tr_cfg.sched_t_mult,
                eta_min=tr_cfg.sched_eta_min)
        if opt is not None:
            if optimized:
                lr_flat = opt.lr_onecycle(
                    sched_t, max_lr=tr_cfg.learning_rate,
                    total_steps=onecycle_total_steps)
            else:
                lr_flat = opt.lr_cosine_warm_restarts(
                    sched_t, base_lr=tr_cfg.learning_rate,
                    t0=tr_cfg.sched_t0, t_mult=tr_cfg.sched_t_mult,
                    eta_min=tr_cfg.sched_eta_min)
            new_params, new_opt, gnorm = opt.update(
                grads, state.opt_state, params, lr_flat=lr_flat,
                max_grad_norm=tr_cfg.grad_clip)
        else:
            grads = _mask_grads(grads, trainable)
            grads, gnorm = O.clip_by_global_norm(grads, tr_cfg.grad_clip)
            lr_tree = jax.tree.map(lr_fn, scales)
            new_params, new_opt = O.adamw_update(
                grads, state.opt_state, params, lr=1.0, lr_scale=lr_tree,
                weight_decay=wd_tree, trainable=trainable)
        metrics = dict(jax.tree.map(lambda x: x / A, ld_sum),
                       grad_norm=gnorm, lr=lr_fn(1.0))
        return TrainState(new_params, new_opt, model_state), metrics

    return step


def make_device_data_step(train_step, chain_steps: int = 1, mesh=None):
    """Wrap a KD train step to source batches from a DEVICE-RESIDENT
    dataset (data/device_cache.DeviceDataset) and to chain ``chain_steps``
    sequential optimizer steps inside ONE dispatch.

    The returned step takes ``(state, teacher_params, data, idx_k,
    sched_t0, dsched, epoch, rng)`` where ``data`` is the DeviceDataset
    ``arrays`` dict (passed as arguments — already on device, so this is
    free) and ``idx_k`` is a (chain_steps, A, B) int32 row-index array —
    the only per-dispatch host->device traffic.  Per-step ``sched_t`` is
    ``sched_t0 + i * dsched``; the rng is split per chained step.  Returns
    ``(state, metrics)`` with every metric stacked (chain_steps,) on the
    leading axis.

    With a ``mesh`` the in-graph batch is constrained batch-over-'data'
    (exactly the host loader's put_global_batch shardings), so the chained
    step trains data-parallel with the dataset rows replicated — the
    device-resident pipeline composes with DP (see
    data/device_cache.DeviceDataset).

    Why: the step is ~5 ms of device time, but a host loader pays a batch
    upload plus a dispatch per step every epoch.  With the dataset in HBM
    an epoch collapses to a handful of dispatches moving a few hundred
    index bytes each (see data/device_cache.py)."""
    from imagecaptioner_tpu.data.device_cache import gather_batch

    K = max(1, chain_steps)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def chained(state, teacher_params, data, idx_k, sched_t0, dsched,
                epoch, rng):
        keys = jax.random.split(rng, K)
        ts = sched_t0 + dsched * jnp.arange(K, dtype=jnp.float32)

        def body(carry, xs):
            idx, key, t = xs
            carry, m = train_step(carry, teacher_params,
                                  gather_batch(data, idx, mesh),
                                  t, epoch, key)
            return carry, m

        state, ms = jax.lax.scan(body, state, (idx_k, keys, ts))
        return state, ms

    return chained


def make_kd_eval_step(
    t_cfg: TeacherConfig, s_cfg: StudentConfig, d_cfg: DistillConfig, *,
    compute_dtype=jnp.float32, optimized: bool = False,
    od_cfg: Optional[OptimizedDistillConfig] = None, mesh=None,
):
    """Returns (loss, loss_dict, preds, cap_tgt).  ``cap_tgt`` is returned so
    monitoring-BLEU can pair predictions with their targets even when the
    batch is a multi-host GLOBAL assembly (host-local captions would pair
    the wrong columns).  ``mesh``: pins outputs replicated (ADVICE r2)."""
    @functools.partial(jax.jit, **_replicated_out(mesh))
    def step(params, model_state, teacher_params, batch: Dict,
             epoch: jnp.ndarray):
        images = T.normalize(batch["images"], dtype=compute_dtype)
        cap_in = batch["captions"][:-1, :]
        cap_tgt = batch["captions"][1:, :]
        student_out, teacher_out, _ = _kd_forward(
            teacher_params, t_cfg, params["student"], model_state, s_cfg,
            params["projectors"], images, cap_in, train=False, rng=None)
        if optimized:
            loss, ld = DL.optimized_distillation_loss(
                student_out, teacher_out, cap_tgt, od_cfg, epoch,
                lengths=batch["lengths"])
        else:
            loss, ld = DL.distillation_loss(
                student_out, teacher_out, cap_tgt, d_cfg,
                lengths=batch["lengths"])
        preds = jnp.argmax(student_out["logits"].astype(jnp.float32), -1)
        return loss, ld, preds, cap_tgt

    return step
