"""Device-side batch augmentation for the HBM-resident training path.

The host-side augmentations (data/transforms.py) match MONAI semantics but
run per-volume on CPU. When the corpus lives in HBM
(data/device_cache.py), augmentation must happen on device to keep the
host link idle. These are batched, jit-compatible, static-shape transforms
driven by a jax PRNG key:

- random_flip: per-sample axis-0 flip with probability p
  (RandFlipd parity, reference datasets/ADNI.py:153),
- random_intensity_scale / shift: cheap photometric jitter (keeps the MXU
  path busy while adding variety; zoom/rotation resampling on device is a
  gather-heavy follow-up).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def random_flip(batch_images, key, prob: float = 0.3, axis: int = 1):
    """Per-sample flip along a spatial axis of (B, X, Y, Z, C)."""
    b = batch_images.shape[0]
    do = jax.random.bernoulli(key, prob, (b,))
    flipped = jnp.flip(batch_images, axis=axis)
    shape = (b,) + (1,) * (batch_images.ndim - 1)
    return jnp.where(do.reshape(shape), flipped, batch_images)


def random_intensity_scale(batch_images, key, prob: float = 0.3,
                           factor: float = 0.1):
    b = batch_images.shape[0]
    k1, k2 = jax.random.split(key)
    do = jax.random.bernoulli(k1, prob, (b,))
    scale = 1.0 + jax.random.uniform(k2, (b,), minval=-factor, maxval=factor)
    scale = jnp.where(do, scale, 1.0)
    shape = (b,) + (1,) * (batch_images.ndim - 1)
    return batch_images * scale.reshape(shape).astype(batch_images.dtype)


def random_intensity_shift(batch_images, key, prob: float = 0.3,
                           offset: float = 0.1):
    b = batch_images.shape[0]
    k1, k2 = jax.random.split(key)
    do = jax.random.bernoulli(k1, prob, (b,))
    shift = jax.random.uniform(k2, (b,), minval=-offset, maxval=offset)
    shift = jnp.where(do, shift, 0.0)
    shape = (b,) + (1,) * (batch_images.ndim - 1)
    return batch_images + shift.reshape(shape).astype(batch_images.dtype)


def augment_batch(batch_images, key, flip_prob: float = 0.3,
                  scale_prob: float = 0.3, shift_prob: float = 0.0):
    """Composite device augmentation; each call site folds its own key."""
    k1, k2, k3 = jax.random.split(key, 3)
    x = random_flip(batch_images, k1, flip_prob)
    x = random_intensity_scale(x, k2, scale_prob)
    if shift_prob > 0:
        x = random_intensity_shift(x, k3, shift_prob)
    return x
