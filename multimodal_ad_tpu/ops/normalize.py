"""Device-side intensity normalization.

The reference normalizes on the CPU inside DataLoader workers (MONAI
ScaleIntensityd, reference datasets/ADNI.py:148; AdaptiveNormal,
datasets/AdaptiveNormal.py:20-51). On TPU it is strictly better to ship the
raw integer voxels (half the bytes of f32 over the host link) and normalize
on device, where the op fuses into the model's first convolution's input
pipeline under XLA (BASELINE.json north star: fused preprocessing streaming
HBM-resident volumes).

Both functions take (B, X, Y, Z, C) batches and normalize per-sample over
the spatial+channel axes, matching the host-side single-volume semantics in
data/transforms.py exactly.
"""

from __future__ import annotations

import jax.numpy as jnp


def scale_intensity(batch):
    """Per-sample min-max to [0, 1] (MONAI ScaleIntensityd default)."""
    x = batch.astype(jnp.float32)
    axes = tuple(range(1, x.ndim))
    mn = jnp.min(x, axis=axes, keepdims=True)
    mx = jnp.max(x, axis=axes, keepdims=True)
    return jnp.where(mx - mn < 1e-12, 0.0, (x - mn) / (mx - mn + 1e-30))


def adaptive_normal(batch, min_p: float = 0.001, max_p: float = 0.999):
    """Per-sample percentile normalize to [-1, 1]
    (reference datasets/AdaptiveNormal.py:20-51 semantics).

    The reference sorts only the non-negative voxels. On device we keep
    static shapes by sorting the full flattened volume with negatives
    replaced by +inf (so they land at the tail), tracking the non-negative
    count n per sample, and gathering at the reference's round-half-up index
    int((n-1)*p + 0.5).
    """
    x = batch.astype(jnp.float32)
    b = x.shape[0]
    flat = x.reshape(b, -1)
    nonneg = flat >= 0
    n = jnp.sum(nonneg, axis=1)  # (B,)
    sorted_vals = jnp.sort(jnp.where(nonneg, flat, jnp.inf), axis=1)

    def pick(p):
        idx = jnp.floor((n - 1) * p + 0.5).astype(jnp.int32)
        idx = jnp.clip(idx, 0, jnp.maximum(n - 1, 0))
        return jnp.take_along_axis(sorted_vals, idx[:, None], axis=1)[:, 0]

    lo, hi = pick(min_p), pick(max_p)
    mean = (hi + lo) / 2.0
    std = jnp.maximum((hi - lo) / 2.0, 1e-12)
    shape = (b,) + (1,) * (x.ndim - 1)
    out = (x - mean.reshape(shape)) / std.reshape(shape)
    return jnp.clip(out, -1.0, 1.0)


NORMALIZERS = {
    "scale_intensity": scale_intensity,
    "adaptive_normal": adaptive_normal,
}
