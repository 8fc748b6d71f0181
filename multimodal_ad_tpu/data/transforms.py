"""Volume preprocessing and augmentation.

Parity targets (reference datasets/ADNI.py:142-160):
  LoadImaged -> EnsureChannelFirstd -> ScaleIntensityd -> EnsureTyped,
  with optional RandFlipd(p=0.3, axis 0), RandRotated(p=0.3, range_x=0.05),
  RandZoomd(p=0.3, zoom 0.95..1.0) for training.

Plus the percentile normalizer the reference defines but never wires up
(reference datasets/AdaptiveNormal.py:20-51) — kept as a selectable
normalizer since BASELINE.json names it a capability.

Everything here is host-side NumPy on single volumes: decode/augment runs
in loader threads while the TPU computes the previous step (see
data/pipeline.py). Shapes stay static — rotation/zoom resample onto the
original grid. The deterministic extraction paths (augment=False) are pure
and reproducible, which is what the bit-comparable-CSV contract needs
(SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np


def scale_intensity(vol: np.ndarray) -> np.ndarray:
    """Min-max to [0, 1] — MONAI ScaleIntensityd default semantics."""
    vol = vol.astype(np.float32)
    mn, mx = float(vol.min()), float(vol.max())
    if mx - mn < 1e-12:
        return np.zeros_like(vol)
    return (vol - mn) / (mx - mn)


def adaptive_normal(vol: np.ndarray, min_p: float = 0.001, max_p: float = 0.999) -> np.ndarray:
    """Percentile normalize to [-1, 1].

    Matches reference datasets/AdaptiveNormal.py:20-51 exactly: sort the
    non-negative voxels, index at int((n-1)*p + 0.5) (round-half-up — the
    reference's round() wraps only the integer n-1), map [lo, hi] to
    [-1, 1] with clamping.
    """
    vol = vol.astype(np.float32)
    pix = np.sort(vol[vol >= 0].ravel())
    if pix.size == 0:
        return np.clip(vol, -1.0, 1.0)
    n = len(pix)

    def pick(p):
        idx = int((n - 1) * p + 0.5)
        return pix[min(max(idx, 0), n - 1)]

    lo, hi = pick(min_p), pick(max_p)
    mean = (hi + lo) / 2.0
    std = (hi - lo) / 2.0
    if std < 1e-12:
        return np.zeros_like(vol)
    return np.clip((vol - mean) / std, -1.0, 1.0)


def rand_flip(vol: np.ndarray, rng: np.random.Generator, prob: float = 0.3,
              axis: int = 0) -> np.ndarray:
    if rng.random() < prob:
        vol = np.flip(vol, axis=axis).copy()
    return vol


def _rotate_x(vol: np.ndarray, angle: float) -> np.ndarray:
    """Rotate around the first spatial axis (MONAI range_x) by `angle` rad,
    resampling with trilinear interpolation about the volume center."""
    d0, d1, d2 = vol.shape
    c1, c2 = (d1 - 1) / 2.0, (d2 - 1) / 2.0
    cos, sin = np.cos(angle), np.sin(angle)
    g1, g2 = np.meshgrid(np.arange(d1), np.arange(d2), indexing="ij")
    # inverse rotation of output coords -> input coords
    y = cos * (g1 - c1) + sin * (g2 - c2) + c1
    z = -sin * (g1 - c1) + cos * (g2 - c2) + c2
    return _sample_plane(vol, y, z)


def _sample_plane(vol, y, z):
    d0, d1, d2 = vol.shape
    y0 = np.clip(np.floor(y).astype(np.int64), 0, d1 - 2)
    z0 = np.clip(np.floor(z).astype(np.int64), 0, d2 - 2)
    wy = np.clip(y - y0, 0.0, 1.0).astype(np.float32)
    wz = np.clip(z - z0, 0.0, 1.0).astype(np.float32)
    out = np.empty_like(vol)
    v00 = vol[:, y0, z0]
    v01 = vol[:, y0, z0 + 1]
    v10 = vol[:, y0 + 1, z0]
    v11 = vol[:, y0 + 1, z0 + 1]
    out[:] = (
        v00 * (1 - wy) * (1 - wz)
        + v01 * (1 - wy) * wz
        + v10 * wy * (1 - wz)
        + v11 * wy * wz
    )
    # zero outside the source extent (match 'no padding' semantics)
    inside = (y >= 0) & (y <= d1 - 1) & (z >= 0) & (z <= d2 - 1)
    out *= inside[None].astype(np.float32)
    return out


def rand_rotate(vol: np.ndarray, rng: np.random.Generator, prob: float = 0.3,
                range_x: float = 0.05) -> np.ndarray:
    if rng.random() < prob:
        angle = rng.uniform(-range_x, range_x)
        vol = _rotate_x(vol, angle)
    return vol


def rand_zoom(vol: np.ndarray, rng: np.random.Generator, prob: float = 0.3,
              min_zoom: float = 0.95, max_zoom: float = 1.0) -> np.ndarray:
    """Zoom about the center, resampled back onto the original grid
    (output shape unchanged — static shapes on TPU)."""
    if rng.random() >= prob:
        return vol
    zoom = rng.uniform(min_zoom, max_zoom)
    if abs(zoom - 1.0) < 1e-6:
        return vol
    shape = vol.shape
    coords = [
        (np.arange(s, dtype=np.float32) - (s - 1) / 2.0) / zoom + (s - 1) / 2.0
        for s in shape
    ]
    return _trilinear(vol, *np.meshgrid(*coords, indexing="ij"))


def _trilinear(vol, x, y, z):
    d0, d1, d2 = vol.shape
    x0 = np.clip(np.floor(x).astype(np.int64), 0, d0 - 2)
    y0 = np.clip(np.floor(y).astype(np.int64), 0, d1 - 2)
    z0 = np.clip(np.floor(z).astype(np.int64), 0, d2 - 2)
    wx = np.clip(x - x0, 0.0, 1.0).astype(np.float32)
    wy = np.clip(y - y0, 0.0, 1.0).astype(np.float32)
    wz = np.clip(z - z0, 0.0, 1.0).astype(np.float32)
    out = np.zeros(vol.shape, np.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (wx if dx else 1 - wx)
                    * (wy if dy else 1 - wy)
                    * (wz if dz else 1 - wz)
                )
                out += vol[x0 + dx, y0 + dy, z0 + dz] * w
    inside = (
        (x >= 0) & (x <= d0 - 1) & (y >= 0) & (y <= d1 - 1) & (z >= 0) & (z <= d2 - 1)
    )
    return out * inside.astype(np.float32)


class VolumeTransform:
    """Composable per-volume preprocess: normalize [+ augment] + channel dim.

    Output layout is channels-LAST (X, Y, Z, C) — the TPU-native layout for
    XLA 3D convolutions — unlike the reference's channels-first MONAI
    pipeline (reference datasets/ADNI.py:147).
    """

    def __init__(self, augment: bool = False, normalizer: str = "scale_intensity",
                 seed: int = 0):
        self.augment = augment
        self.normalizer = {"scale_intensity": scale_intensity,
                           "adaptive_normal": adaptive_normal}[normalizer]
        self._seed = seed

    def __call__(self, vol: np.ndarray, sample_idx: int = 0,
                 epoch: int = 0) -> np.ndarray:
        vol = self.normalizer(vol)
        if self.augment:
            # Per-(epoch, sample) independent stream: reproducible regardless
            # of loader thread interleaving (unlike torch DataLoader workers)
            # AND fresh every epoch — MONAI's Rand* transforms re-randomize
            # per epoch (reference datasets/ADNI.py:152-158); seeding on the
            # sample alone would freeze augmentation into a fixed dataset
            # perturbation.
            rng = np.random.default_rng((self._seed, epoch, sample_idx))
            vol = rand_flip(vol, rng)
            vol = rand_rotate(vol, rng)
            vol = rand_zoom(vol, rng)
        return vol[..., None]  # (X, Y, Z, 1)


def make_transforms(augment: bool = False, seed: int = 0,
                    normalizer: str = "scale_intensity"):
    """(train_tf, eval_tf) pair; eval is always deterministic.

    Intentionally fixes the reference's slicing bug where augment=True leaks
    random flips/rotations into the *test* transform
    (reference datasets/ADNI.py:152-158; SURVEY.md §8.3).
    """
    return (VolumeTransform(augment=augment, normalizer=normalizer, seed=seed),
            VolumeTransform(augment=False, normalizer=normalizer))
