"""Device-side batch augmentation for the HBM-resident training path.

The host-side augmentations (data/transforms.py) match MONAI semantics but
run per-volume on CPU. When the corpus lives in HBM
(data/device_cache.py), augmentation must happen on device to keep the
host link idle. These are batched, jit-compatible, static-shape transforms
driven by a jax PRNG key:

- random_flip: per-sample axis-0 flip with probability p
  (RandFlipd parity, reference datasets/ADNI.py:153),
- random_rotate_zoom: per-sample rotation about the first spatial axis
  (RandRotated range_x parity, reference datasets/ADNI.py:154) composed
  with a central zoom (RandZoomd parity, 155), applied as ONE trilinear
  resampling pass — output shape unchanged (static shapes on TPU),
- random_intensity_scale / shift: cheap photometric jitter (no MONAI
  equivalent; opt-in extras).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _trilinear_sample(vol, x, y, z):
    """Sample vol (X, Y, Z, C) at fractional coords x/y/z (X, Y, Z);
    zero outside the source extent (matches the host resamplers'
    'no padding' semantics, data/transforms.py)."""
    dx, dy, dz = vol.shape[0], vol.shape[1], vol.shape[2]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, dx - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, dy - 2)
    z0 = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, dz - 2)
    wx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    wy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
    wz = jnp.clip(z - z0, 0.0, 1.0)[..., None]
    out = jnp.zeros(x.shape + (vol.shape[-1],), vol.dtype)
    for ix in (0, 1):
        for iy in (0, 1):
            for iz in (0, 1):
                w = ((wx if ix else 1 - wx)
                     * (wy if iy else 1 - wy)
                     * (wz if iz else 1 - wz))
                out = out + vol[x0 + ix, y0 + iy, z0 + iz] * w.astype(vol.dtype)
    inside = ((x >= 0) & (x <= dx - 1) & (y >= 0) & (y <= dy - 1)
              & (z >= 0) & (z <= dz - 1))
    return out * inside[..., None].astype(vol.dtype)


def rotate_zoom_volume(vol, angle, zoom):
    """Rotate one (X, Y, Z, C) volume by `angle` rad about axis 0 and zoom
    about the center by `zoom`, resampled onto the original grid in one
    trilinear pass. angle=0, zoom=1 is the identity. Matches the host
    rand_rotate/rand_zoom geometry (data/transforms.py _rotate_x /
    _trilinear) with a single interpolation instead of two."""
    dx, dy, dz = vol.shape[0], vol.shape[1], vol.shape[2]
    cx, cy, cz = (dx - 1) / 2.0, (dy - 1) / 2.0, (dz - 1) / 2.0
    gx, gy, gz = jnp.meshgrid(
        jnp.arange(dx, dtype=jnp.float32),
        jnp.arange(dy, dtype=jnp.float32),
        jnp.arange(dz, dtype=jnp.float32), indexing="ij")
    # inverse zoom about the center (output grid -> zoomed-space coords)
    xs = (gx - cx) / zoom + cx
    ys = (gy - cy) / zoom + cy
    zs = (gz - cz) / zoom + cz
    # inverse rotation about axis 0 (same formula as the host _rotate_x)
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    yr = cos * (ys - cy) + sin * (zs - cz) + cy
    zr = -sin * (ys - cy) + cos * (zs - cz) + cz
    return _trilinear_sample(vol, xs, yr, zr)


def random_rotate_zoom(batch_images, key, rotate_prob: float = 0.3,
                       range_x: float = 0.05, zoom_prob: float = 0.3,
                       min_zoom: float = 0.95, max_zoom: float = 1.0):
    """Per-sample random rotation (about axis 0) + central zoom of a
    (B, X, Y, Z, C) batch, MONAI RandRotated/RandZoomd parity
    (reference datasets/ADNI.py:154-155)."""
    b = batch_images.shape[0]
    kr1, kr2, kz1, kz2 = jax.random.split(key, 4)
    do_r = jax.random.bernoulli(kr1, rotate_prob, (b,))
    angle = jnp.where(
        do_r, jax.random.uniform(kr2, (b,), minval=-range_x, maxval=range_x),
        0.0)
    do_z = jax.random.bernoulli(kz1, zoom_prob, (b,))
    zoom = jnp.where(
        do_z, jax.random.uniform(kz2, (b,), minval=min_zoom, maxval=max_zoom),
        1.0)
    return jax.vmap(rotate_zoom_volume)(batch_images, angle, zoom)


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
                  rotate_prob: float = 0.3, zoom_prob: float = 0.3,
                  scale_prob: float = 0.0, shift_prob: float = 0.0):
    """Composite device augmentation; each call site folds its own key.

    Defaults mirror the MONAI training pipeline: flip p=0.3, rotate p=0.3
    range_x=0.05, zoom p=0.3 in [0.95, 1.0] (reference
    datasets/ADNI.py:152-158). Intensity scale/shift are opt-in extras
    with no reference equivalent."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = random_flip(batch_images, k1, flip_prob)
    if rotate_prob > 0 or zoom_prob > 0:
        x = random_rotate_zoom(x, k2, rotate_prob, zoom_prob=zoom_prob)
    if scale_prob > 0:
        x = random_intensity_scale(x, k3, scale_prob)
    if shift_prob > 0:
        x = random_intensity_shift(x, k4, shift_prob)
    return x
