"""On-device image preprocessing and augmentation (fused into the train step).

Replaces PIL/torchvision host transforms (SURVEY §2.9 N4): uint8 NHWC batches
stream to the device; normalization and the stochastic augmentations run as
XLA ops inside the jitted step, keyed by ``jax.random`` for determinism.

Reference transform stacks being reproduced:
  * default: Resize(224) + ToTensor + ImageNet normalize (data_loader.py:106-110)
  * teacher train: + ColorJitter(0.1,0.1,0.1,0.05) + RandomHorizontalFlip(0.3)
    (train_teacher.py:78-84)
  * KD train: ColorJitter(0.2,0.2,0.2,0.1) + flip 0.5 (train_student_kd.py:122-134)
  * optimized KD: Resize(256) + RandomCrop(224) + flip + rotation(5) + jitter
    (train_student_kd_optimized.py:245-253)
"""

from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclass(frozen=True)
class AugmentConfig:
    brightness: float = 0.0
    contrast: float = 0.0
    saturation: float = 0.0
    hue: float = 0.0
    hflip_prob: float = 0.0
    rotation_deg: float = 0.0
    random_crop: bool = False   # expects input larger than out_size
    out_size: int = 224


TEACHER_TRAIN_AUG = AugmentConfig(brightness=0.1, contrast=0.1, saturation=0.1,
                                  hue=0.05, hflip_prob=0.3)
KD_TRAIN_AUG = AugmentConfig(brightness=0.2, contrast=0.2, saturation=0.2,
                             hue=0.1, hflip_prob=0.5)
OPTIMIZED_KD_AUG = AugmentConfig(brightness=0.2, contrast=0.2, saturation=0.2,
                                 hue=0.1, hflip_prob=0.5, rotation_deg=5.0,
                                 random_crop=True)


def normalize(images_u8: jnp.ndarray, *, dtype=jnp.float32,
              mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jnp.ndarray:
    """uint8 NHWC -> normalized float NCHW (the reference model contract)."""
    x = images_u8.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    return jnp.transpose(x, (0, 3, 1, 2)).astype(dtype)


def _rgb_to_gray(x: jnp.ndarray) -> jnp.ndarray:
    # itu-r 601 luma, matching torchvision rgb_to_grayscale
    w = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    return jnp.sum(x * w, axis=-1, keepdims=True)


def color_jitter(rng: jax.Array, x: jnp.ndarray, cfg: AugmentConfig) -> jnp.ndarray:
    """Per-image brightness/contrast/saturation/hue jitter on [0,1] NHWC floats.

    Factor sampling follows torchvision ColorJitter: U(max(0,1-f), 1+f) for
    b/c/s, U(-hue, hue) for hue.
    """
    n = x.shape[0]
    kb, kc, ks, kh = jax.random.split(rng, 4)

    def u(key, f):
        return jax.random.uniform(key, (n, 1, 1, 1), minval=max(0.0, 1.0 - f),
                                  maxval=1.0 + f)

    if cfg.brightness > 0:
        x = jnp.clip(x * u(kb, cfg.brightness), 0.0, 1.0)
    if cfg.contrast > 0:
        mean_gray = jnp.mean(_rgb_to_gray(x), axis=(1, 2), keepdims=True)
        x = jnp.clip(mean_gray + (x - mean_gray) * u(kc, cfg.contrast), 0.0, 1.0)
    if cfg.saturation > 0:
        gray = _rgb_to_gray(x)
        x = jnp.clip(gray + (x - gray) * u(ks, cfg.saturation), 0.0, 1.0)
    if cfg.hue > 0:
        # cheap hue rotation approximation in YIQ space (avoids HSV branching)
        theta = jax.random.uniform(kh, (n, 1, 1), minval=-cfg.hue,
                                   maxval=cfg.hue) * 2.0 * jnp.pi
        cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        i = 0.596 * r - 0.274 * g - 0.322 * b
        q = 0.211 * r - 0.523 * g + 0.312 * b
        i2 = i * cos_t - q * sin_t
        q2 = i * sin_t + q * cos_t
        r2 = y + 0.956 * i2 + 0.621 * q2
        g2 = y - 0.272 * i2 - 0.647 * q2
        b2 = y - 1.106 * i2 + 1.703 * q2
        x = jnp.clip(jnp.stack([r2, g2, b2], axis=-1), 0.0, 1.0)
    return x


def random_hflip(rng: jax.Array, x: jnp.ndarray, prob: float) -> jnp.ndarray:
    n = x.shape[0]
    flip = jax.random.bernoulli(rng, prob, (n, 1, 1, 1))
    return jnp.where(flip, x[:, :, ::-1, :], x)


def random_rotation(rng: jax.Array, x: jnp.ndarray, max_deg: float) -> jnp.ndarray:
    """Small-angle batched rotation via bilinear resampling."""
    n, h, w, c = x.shape
    theta = jax.random.uniform(rng, (n,), minval=-max_deg, maxval=max_deg)
    theta = theta * jnp.pi / 180.0
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = jnp.arange(h, dtype=jnp.float32) - cy
    xs = jnp.arange(w, dtype=jnp.float32) - cx
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    cos_t = jnp.cos(theta)[:, None, None]
    sin_t = jnp.sin(theta)[:, None, None]
    src_y = cos_t * yy - sin_t * xx + cy
    src_x = sin_t * yy + cos_t * xx + cx

    y0 = jnp.clip(jnp.floor(src_y), 0, h - 1)
    x0 = jnp.clip(jnp.floor(src_x), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = src_y - y0
    wx = src_x - x0

    def gather(yi, xi):
        flat = x.reshape(n, h * w, c)
        idx = (yi * w + xi).astype(jnp.int32)
        return jnp.take_along_axis(flat, idx.reshape(n, -1, 1), axis=1).reshape(n, h, w, c)

    top = gather(y0, x0) * (1 - wx[..., None]) + gather(y0, x1) * wx[..., None]
    bot = gather(y1, x0) * (1 - wx[..., None]) + gather(y1, x1) * wx[..., None]
    out = top * (1 - wy[..., None]) + bot * wy[..., None]
    # zero outside source bounds (torchvision fills 0)
    valid = ((src_y >= 0) & (src_y <= h - 1) & (src_x >= 0) & (src_x <= w - 1))
    return jnp.where(valid[..., None], out, 0.0)


def random_crop(rng: jax.Array, x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    n, h, w, c = x.shape
    ky, kx = jax.random.split(rng)
    ty = jax.random.randint(ky, (n,), 0, h - out_size + 1)
    tx = jax.random.randint(kx, (n,), 0, w - out_size + 1)

    def crop_one(img, y0, x0):
        return jax.lax.dynamic_slice(img, (y0, x0, 0), (out_size, out_size, c))

    return jax.vmap(crop_one)(x, ty, tx)


def augment_and_normalize(
    rng: jax.Array, images_u8: jnp.ndarray, cfg: AugmentConfig, *,
    dtype=jnp.float32, mean=IMAGENET_MEAN, std=IMAGENET_STD,
) -> jnp.ndarray:
    """Full fused train-time pipeline: uint8 NHWC -> augmented NCHW floats."""
    x = images_u8.astype(jnp.float32) / 255.0
    k_crop, k_rot, k_jit, k_flip = jax.random.split(rng, 4)
    if cfg.random_crop and x.shape[1] > cfg.out_size:
        x = random_crop(k_crop, x, cfg.out_size)
    if cfg.rotation_deg > 0:
        x = random_rotation(k_rot, x, cfg.rotation_deg)
    if cfg.brightness or cfg.contrast or cfg.saturation or cfg.hue:
        x = color_jitter(k_jit, x, cfg)
    if cfg.hflip_prob > 0:
        x = random_hflip(k_flip, x, cfg.hflip_prob)
    x = (x - jnp.asarray(mean)) / jnp.asarray(std)
    return jnp.transpose(x, (0, 3, 1, 2)).astype(dtype)
