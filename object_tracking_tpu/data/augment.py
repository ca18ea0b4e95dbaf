"""Jittable, PRNG-keyed image augmentation.

Replaces the reference's cv2+imgaug host pipeline
(/root/reference/utility/preprocessing.py:111-134 `aug_pipe`,
:141-189 `aug_image`) with pure JAX ops on the device:

- geometric: random up-to-`scale_max` zoom + translate
  (preprocessing.py:149-159) as separable bilinear resampling expressed
  as two matmuls (fixed output shape → jit-safe; MXU-friendly and
  orders of magnitude faster to compile on TPU than the gather-based
  `scale_and_translate` lowering), horizontal flip (:162-163),
  with the matching bbox fix-up incl. flip mirroring (:172-188);
- photometric, each applied with probability ~ the reference's
  SomeOf(0, 4) pipe (:117-133): gaussian blur (depthwise conv),
  additive gaussian noise, pixel dropout, brightness add, channel
  multiply, contrast normalization.

All randomness flows from an explicit PRNG key. The reference's
per-sequence numpy reseed trick — identical augmentation across a video
window (preprocessing.py:344-347, 364) — becomes simply *reusing one key*
across the window (`augment_sequence`), which is exact rather than
best-effort.

Branchless probabilistic application (`where(apply, aug(x), x)`) keeps
control flow static for XLA.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    scale_max: float = 1.1        # preprocessing.py:150
    flip_prob: float = 0.5        # :162
    blur_prob: float = 0.25       # aug_pipe SomeOf(0-4) over 6 ops ≈ 1/3
    blur_sigma: float = 1.5       # GaussianBlur((0, 3.0)) midpoint
    noise_prob: float = 0.25
    noise_std: float = 0.02       # AdditiveGaussianNoise(0.05*255) scaled
    dropout_prob: float = 0.25
    dropout_rate: float = 0.05    # Dropout((0.01, 0.1))
    brightness_prob: float = 0.25
    brightness_delta: float = 0.04  # Add((-10, 10))/255
    multiply_prob: float = 0.25
    multiply_range: Tuple[float, float] = (0.5, 1.5)
    contrast_prob: float = 0.25
    contrast_range: Tuple[float, float] = (0.5, 2.0)


def _linear_resample_matrix(n: int, scale: jnp.ndarray,
                            offset: jnp.ndarray) -> jnp.ndarray:
    """(n_out, n_in) bilinear sampling matrix: out[i] = in((i - t)/s) in
    half-pixel-center convention — numerically equal (≤2e-6) to
    jax.image.scale_and_translate(method='linear') for scale >= 1.

    Expressed as a dense matrix so the zoom+translate becomes two
    matmuls: the axon TPU compiler takes ~150s to lower
    scale_and_translate's gather graph at 416² but compiles matmuls
    instantly, and the MXU executes them faster than gathers anyway.
    """
    i = jnp.arange(n, dtype=jnp.float32)
    src = (i + 0.5 + offset) / scale - 0.5
    j = jnp.arange(n, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[:, None] - j[None, :]))


def _zoom_translate(image: jnp.ndarray, scale: jnp.ndarray,
                    offx: jnp.ndarray, offy: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) zoom-by-scale + translate-by-(-offx, -offy), separable."""
    h, w = image.shape[:2]
    wy = _linear_resample_matrix(h, scale, offy)
    wx = _linear_resample_matrix(w, scale, offx)
    out = jnp.einsum('ij,jwc->iwc', wy, image)
    return jnp.einsum('xj,ijc->ixc', wx, out)


def _gaussian_kernel(sigma: float, radius: int = 2) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _blur(image: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable gaussian blur on (H, W, C)."""
    k = _gaussian_kernel(sigma)
    img = jnp.moveaxis(image, -1, 0)[:, None]          # (C, 1, H, W)
    kh = k.reshape(1, 1, -1, 1)
    kw = k.reshape(1, 1, 1, -1)
    dn = ('NCHW', 'OIHW', 'NCHW')
    out = jax.lax.conv_general_dilated(img, kh, (1, 1), 'SAME',
                                       dimension_numbers=dn)
    out = jax.lax.conv_general_dilated(out, kw, (1, 1), 'SAME',
                                       dimension_numbers=dn)
    return jnp.moveaxis(out[:, 0], 0, -1)


@functools.partial(jax.jit, static_argnames=('cfg',))
def augment_frame(key: jax.Array, image: jnp.ndarray,
                  boxes_xyxy: jnp.ndarray,
                  cfg: AugmentConfig = AugmentConfig()):
    """Augment one frame and its boxes.

    Args:
      key: PRNG key; reuse across a window for sequence-coherent aug.
      image: (H, W, 3) float32 in [0, 1], already at network size.
      boxes_xyxy: (M, 4) pixel boxes.

    Returns:
      (image', boxes') with identical shapes.
    """
    h, w = image.shape[:2]
    (k_scale, k_offx, k_offy, k_flip, k_photo) = jax.random.split(key, 5)

    # ---- geometric: zoom + translate (preprocessing.py:149-159) --------
    scale = jax.random.uniform(k_scale, (), minval=1.0,
                               maxval=cfg.scale_max)
    max_offx = (scale - 1.0) * w
    max_offy = (scale - 1.0) * h
    offx = jax.random.uniform(k_offx, ()) * max_offx
    offy = jax.random.uniform(k_offy, ()) * max_offy

    image = _zoom_translate(image, scale, offx, offy)

    x1 = boxes_xyxy[:, 0] * scale - offx
    y1 = boxes_xyxy[:, 1] * scale - offy
    x2 = boxes_xyxy[:, 2] * scale - offx
    y2 = boxes_xyxy[:, 3] * scale - offy

    # ---- horizontal flip (:162-163, bbox mirror :185-187) --------------
    flip = jax.random.uniform(k_flip, ()) < cfg.flip_prob
    image = jnp.where(flip, image[:, ::-1], image)
    fx1 = jnp.where(flip, w - x2, x1)
    fx2 = jnp.where(flip, w - x1, x2)
    boxes = jnp.stack([
        jnp.clip(fx1, 0, w), jnp.clip(y1, 0, h),
        jnp.clip(fx2, 0, w), jnp.clip(y2, 0, h)], axis=-1)

    # ---- photometric (aug_pipe :117-133) -------------------------------
    ks = jax.random.split(k_photo, 12)
    u = lambda i: jax.random.uniform(ks[i], ())

    blurred = _blur(image, cfg.blur_sigma)
    image = jnp.where(u(0) < cfg.blur_prob, blurred, image)

    noise = jax.random.normal(ks[1], image.shape) * cfg.noise_std
    image = jnp.where(u(2) < cfg.noise_prob, image + noise, image)

    keep = jax.random.uniform(ks[3], image.shape[:2] + (1,)) \
        > cfg.dropout_rate
    image = jnp.where(u(4) < cfg.dropout_prob, image * keep, image)

    delta = jax.random.uniform(ks[5], (), minval=-cfg.brightness_delta,
                               maxval=cfg.brightness_delta)
    image = jnp.where(u(6) < cfg.brightness_prob, image + delta, image)

    mul = jax.random.uniform(ks[7], (), minval=cfg.multiply_range[0],
                             maxval=cfg.multiply_range[1])
    image = jnp.where(u(8) < cfg.multiply_prob, image * mul, image)

    alpha = jax.random.uniform(ks[9], (), minval=cfg.contrast_range[0],
                               maxval=cfg.contrast_range[1])
    mean = jnp.mean(image, axis=(0, 1), keepdims=True)
    image = jnp.where(u(10) < cfg.contrast_prob,
                      (image - mean) * alpha + mean, image)

    return jnp.clip(image, 0.0, 1.0), boxes


@functools.partial(jax.jit, static_argnames=('cfg',))
def augment_sequence(key: jax.Array, images: jnp.ndarray,
                     boxes_xyxy: jnp.ndarray,
                     cfg: AugmentConfig = AugmentConfig()):
    """Augment a (T, H, W, 3) window with ONE key — every frame gets the
    same transform, the sequence-coherence requirement the reference
    implements by reseeding numpy per sequence (preprocessing.py:344-347,
    364). boxes_xyxy: (T, M, 4)."""
    return jax.vmap(lambda im, bx: augment_frame(key, im, bx, cfg))(
        images, boxes_xyxy)


# Batched entry points at module level: all generator instances (train,
# val, every pipeline) share ONE jit cache entry per (shape, cfg) instead
# of each wrapping its own jit(vmap(...)) closure and recompiling.
@functools.partial(jax.jit, static_argnames=('cfg',))
def augment_frames_batch(keys: jax.Array, images: jnp.ndarray,
                         boxes_xyxy: jnp.ndarray,
                         cfg: AugmentConfig = AugmentConfig()):
    """(B,) keys + (B, H, W, 3) + (B, M, 4) — independent per frame."""
    return jax.vmap(lambda k, im, bx: augment_frame(k, im, bx, cfg))(
        keys, images, boxes_xyxy)


@functools.partial(jax.jit, static_argnames=('cfg',))
def augment_sequences_batch(keys: jax.Array, images: jnp.ndarray,
                            boxes_xyxy: jnp.ndarray,
                            cfg: AugmentConfig = AugmentConfig()):
    """(B,) keys + (B, T, H, W, 3) + (B, T, M, 4) — one key per window."""
    return jax.vmap(
        lambda k, im, bx: augment_sequence(k, im, bx, cfg))(
        keys, images, boxes_xyxy)
