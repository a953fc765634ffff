"""Config dataclasses with reference-default presets.

The PyTorch reference has *no* config system — every hyperparameter is a local
variable inside a trainer (SURVEY.md §5.6; train_teacher.py:53-67,
train_student_kd.py:92-111, train_student_kd_optimized.py:208-229).  This
module reifies those hardcoded values as dataclass defaults so each entry
point reproduces the reference exactly while staying overridable.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class PrecisionConfig:
    """bf16-compute / f32-params policy (replaces torch.amp, SURVEY §2.9 N5)."""

    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"  # set "float32" for parity tests

    def compute(self):
        import jax.numpy as jnp

        return jnp.dtype(self.compute_dtype)

    def param(self):
        import jax.numpy as jnp

        return jnp.dtype(self.param_dtype)


@dataclass(frozen=True)
class DataConfig:
    """Data pipeline semantics from src/data_loader.py."""

    root_dir: str = "data/flickr8k"
    captions_file: str = "data/flickr8k/captions_clean.csv"
    image_size: int = 224
    freq_threshold: int = 5          # data_loader.py:50
    batch_size: int = 32
    batch_size_cap: int = 16         # silent cap, data_loader.py:120-121
    max_caption_len: int = 48        # static pad length (framework choice; covers
                                     # Flickr8k captions, <=25 tokens in practice)
    # ImageNet normalization (data_loader.py:109)
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    drop_last: bool = True
    shuffle: bool = True


@dataclass(frozen=True)
class TeacherConfig:
    """CaptioningTeacher — production config 512/8/4/0.15
    (train_teacher.py:58-61; all real callers use these, SURVEY §2.2)."""

    vocab_size: int = 5000
    embed_size: int = 512
    num_heads: int = 8
    num_decoder_layers: int = 4
    dropout: float = 0.15
    # ViT-S/16 encoder (timm vit_small_patch16_224, teacher_model.py:36)
    encoder_dim: int = 384
    encoder_depth: int = 12
    encoder_heads: int = 6
    encoder_mlp_ratio: float = 4.0
    patch_size: int = 16
    image_size: int = 224
    max_pe_len: int = 5000           # teacher_model.py:13

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_tokens(self) -> int:     # 196 patches + CLS = 197
        return self.num_patches + 1


@dataclass(frozen=True)
class StudentConfig:
    """CNN-LSTM students. ``variant`` selects full / compact / enhanced
    (student_model.py:263-264, student_model_compact.py:198-199,
    student_model_enhanced.py:378)."""

    vocab_size: int = 5000
    variant: str = "full"            # full | compact | enhanced
    embed_size: int = 256
    hidden_size: int = 512
    num_layers: int = 2
    dropout: float = 0.2
    use_attention_refinement: bool = True
    feature_tokens: int = 49         # 7x7 spatial locations (8x8=64 for enhanced)
    image_size: int = 224
    # decoder recurrence implementation: "scan" (lax.scan, any platform) or
    # "pallas" (fused TPU kernel fwd + custom-VJP bwd; full 2-layer variant)
    decoder_impl: str = "scan"
    # Reference freezes backbone prefixes (ResNet children 0-5 / MobileNet
    # features 0-9) assuming PRETRAINED weights (student_model.py:23-30).
    # False trains the whole backbone — required for from-scratch training,
    # where frozen random layers destroy image information.
    freeze_backbone: bool = True


def _student_cfg(defaults: dict, over: dict) -> StudentConfig:
    return StudentConfig(**{**defaults, **over})


def full_student_config(vocab_size: int, **over) -> StudentConfig:
    return _student_cfg(dict(
        vocab_size=vocab_size, variant="full", embed_size=256, hidden_size=512,
        num_layers=2, dropout=0.2, use_attention_refinement=True,
        feature_tokens=49), over)


def compact_student_config(vocab_size: int, **over) -> StudentConfig:
    """Compact defaults (student_model_compact.py:198-199); the optimized KD
    trainer uses 256/256/1/0.1 no-refinement (train_student_kd_optimized.py:308-315)."""
    return _student_cfg(dict(
        vocab_size=vocab_size, variant="compact", embed_size=256,
        hidden_size=256, num_layers=1, dropout=0.1,
        use_attention_refinement=False, feature_tokens=49), over)


def enhanced_student_config(vocab_size: int, **over) -> StudentConfig:
    """Enhanced defaults 384/768/3 (student_model_enhanced.py:378); 8x8=64 tokens."""
    return _student_cfg(dict(
        vocab_size=vocab_size, variant="enhanced", embed_size=384,
        hidden_size=768, num_layers=3, dropout=0.15,
        use_attention_refinement=True, feature_tokens=64), over)


@dataclass(frozen=True)
class DistillConfig:
    """DistillationLoss weights (distillation_utils.py:12-28).

    With the defaults the ground-truth CE coefficient (1-a-b-g) is exactly 0.0
    — a reference quirk preserved because it changes training outputs
    (SURVEY §7 'faithful quirks')."""

    alpha: float = 0.7               # token-level KD
    beta: float = 0.2                # encoder feature KD
    gamma: float = 0.1               # decoder hidden-state KD
    temperature: float = 4.0


@dataclass(frozen=True)
class OptimizedDistillConfig:
    """OptimizedDistillationLoss (train_student_kd_optimized.py:34-128)."""

    alpha: float = 0.8
    beta: float = 0.15
    gamma: float = 0.05
    temperature: float = 3.0
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    warmup_epochs: int = 3


@dataclass(frozen=True)
class TeacherTrainConfig:
    """train_teacher.py:53-67 hardcoded hyperparameters."""

    learning_rate: float = 1e-4
    batch_size: int = 12
    accumulation_steps: int = 3
    num_epochs: int = 25
    weight_decay: float = 0.01
    grad_clip: float = 0.5           # train_teacher.py:213-214
    label_smoothing: float = 0.1     # train_teacher.py:131-155
    encoder_lr_scale: float = 0.1    # train_teacher.py:157-171
    patience: int = 5
    validate_every: int = 2
    # CosineAnnealingWarmRestarts(T_0=5, T_mult=2, eta_min=1e-6), train_teacher.py:174
    sched_t0: int = 5
    sched_t_mult: int = 2
    sched_eta_min: float = 1e-6


@dataclass(frozen=True)
class KDTrainConfig:
    """train_student_kd.py:92-111 hardcoded hyperparameters."""

    learning_rate: float = 2e-4
    batch_size: int = 16
    accumulation_steps: int = 2
    num_epochs: int = 1              # code says 1 (README says 30) — preserved
    weight_decay: float = 0.01
    grad_clip: float = 1.0
    encoder_lr_scale: float = 0.1
    patience: int = 7
    validate_every: int = 2
    sched_t0: int = 5
    sched_t_mult: int = 2
    sched_eta_min: float = 1e-6
    dropout: float = 0.3             # student built with dropout 0.3 here
    # Flagged TPU deviation: run the FROZEN teacher's forward in bf16 (KD
    # targets still fp32).  The reference keeps its teacher fp32 under AMP
    # (distillation_utils.py:274-286) — that stays the default.
    teacher_bf16: bool = False


@dataclass(frozen=True)
class OptimizedKDTrainConfig:
    """train_student_kd_optimized.py:208-229 hardcoded hyperparameters."""

    learning_rate: float = 3e-4
    batch_size: int = 16
    accumulation_steps: int = 2
    num_epochs: int = 30
    weight_decay: float = 0.01
    others_weight_decay: float = 0.005   # :362-366
    others_lr_scale: float = 1.5
    encoder_lr_scale: float = 0.1
    grad_clip: float = 1.0
    patience: int = 5
    validate_every: int = 1
    warmup_pct: float = 0.1              # OneCycleLR, :369-378
    div_factor: float = 10.0
    final_div_factor: float = 100.0


@dataclass(frozen=True)
class DecodeConfig:
    """Caption decode defaults (teacher_model.py:108-117, student_model.py:314)."""

    max_length: int = 20
    beam_size: int = 5
    length_penalty: float = 0.6
    temperature: float = 1.0
    num_return_sequences: int = 1


def replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)
