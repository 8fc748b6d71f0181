"""3D U-Nets: segmentation/feature U-Net and the classifier variant.

Two architectures, matching the reference's pair:

1. `UNet3D` — 3-level encoder (64/128/256) + bottleneck 512 + 3 up-blocks
   (reference models/unet3d.py:87-152). Odd input shapes round-trip by
   padding right/bottom to the next multiple of 8 and cropping back
   (the reference hardcodes (96,112,96) for 91x109x91 at unet3d.py:117-132;
   the general next-multiple rule reproduces those exact numbers).
   The 64-channel map from the last up-block's second conv — the ROI
   pooling source the reference grabs with a forward hook
   (image_features.py:56-60) — is exposed as an explicit `sow` tap and via
   `return_features=True`.

2. `UNet3DClassifier` — 4-level U-Net (base 32) with skip connections,
   decoder output -> GAP -> linear (reference train_unet3d.py:115-155).

Divergence (documented): the reference's UpConv3DBlock applies ONE
BatchNorm instance to both convs' outputs (unet3d.py:70,81-82 — the same
`self.bn` twice, sharing params and double-updating running stats); here
each conv gets its own norm. At eval with fresh stats the outputs agree.

TPU-first: channels-last, bf16 compute policy, static pad amounts computed
at trace time from shapes.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


def _pool(x):
    return nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))


def _pad_to_multiple(x, mult=8):
    """Pad spatial dims (right/bottom only) to a multiple of `mult`."""
    pads = [(0, 0)]
    crops = []
    for d in x.shape[1:4]:
        extra = (-d) % mult
        pads.append((0, extra))
        crops.append(d)
    pads.append((0, 0))
    return jnp.pad(x, pads), crops


def _crop_back(y, crops):
    return y[:, : crops[0], : crops[1], : crops[2], :]


class ConvBlock3D(nn.Module):
    """Double 3x3x3 conv; `halved_first=True` gives the reference
    Conv3DBlock channel pattern out//2 -> out (unet3d.py:26-35)."""

    features: int
    halved_first: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        c1 = self.features // 2 if self.halved_first else self.features
        x = nn.Conv(c1, (3, 3, 3), padding=1, **kw)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3, 3), padding=1, **kw)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(x)
        x = nn.relu(x)
        return x


class UpBlock3D(nn.Module):
    """Transpose-conv upsample + skip concat + double conv
    (reference UpConv3DBlock, unet3d.py:51-84)."""

    in_features: int
    last_layer: bool = False
    num_classes: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual, train: bool):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        mid = self.in_features // 2
        x = nn.ConvTranspose(self.in_features, (2, 2, 2), strides=(2, 2, 2),
                             **kw)(x)
        if residual is not None:
            x = jnp.concatenate([x, residual.astype(x.dtype)], axis=-1)
        x = nn.Conv(mid, (3, 3, 3), padding=1, **kw)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(x)
        x = nn.relu(x)
        x = nn.Conv(mid, (3, 3, 3), padding=1, **kw)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(x)
        x = nn.relu(x)
        self.sow("intermediates", "pre_head", x)
        if self.last_layer:
            x = nn.Conv(self.num_classes, (1, 1, 1), **kw)(x)
        return x


class UNet3D(nn.Module):
    """3-level U-Net; returns the segmentation map (and optionally the
    64-channel pre-head feature map for ROI pooling)."""

    in_channels: int = 1
    num_classes: int = 1
    level_channels: Sequence[int] = (64, 128, 256)
    bottleneck_channel: int = 512
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        c1, c2, c3 = self.level_channels
        x = x.astype(self.dtype)
        x_pad, crops = _pad_to_multiple(x, mult=8)

        r1 = ConvBlock3D(c1, **kw)(x_pad, train)
        r2 = ConvBlock3D(c2, **kw)(_pool(r1), train)
        r3 = ConvBlock3D(c3, **kw)(_pool(r2), train)
        b = ConvBlock3D(self.bottleneck_channel, **kw)(_pool(r3), train)

        y = UpBlock3D(self.bottleneck_channel, **kw)(b, r3, train)
        y = UpBlock3D(c3, **kw)(y, r2, train)
        last = UpBlock3D(c2, last_layer=True, num_classes=self.num_classes,
                         name="head_block", **kw)
        y = last(y, r1, train)

        return _crop_back(y, crops).astype(jnp.float32)


def unet_forward_with_features(model: UNet3D, variables, x):
    """(seg_out, feats64) — the 64-channel pre-head decoder map cropped to
    the input's spatial dims, replacing the reference's forward hooks
    (image_features.py:51-60 hook + 105-108 crop)."""
    out, inter = model.apply(variables, x, train=False,
                             mutable=["intermediates"])
    feats = inter["intermediates"]["head_block"]["pre_head"][0]
    feats = feats[:, : x.shape[1], : x.shape[2], : x.shape[3], :]
    return out, feats.astype(jnp.float32)


class UNetClassifierConvBlock(nn.Module):
    """Double conv at constant width (reference train_unet3d.py:77-90)."""

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3, 3), padding=1, **kw)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             **kw)(x)
            x = nn.relu(x)
        return x


def _center_pad_to(x, target_shape):
    """Symmetric spatial pad (torch F.pad diff//2 semantics,
    reference train_unet3d.py:102-107)."""
    pads = [(0, 0)]
    for d, t in zip(x.shape[1:4], target_shape):
        diff = t - d
        pads.append((diff // 2, diff - diff // 2))
    pads.append((0, 0))
    return jnp.pad(x, pads)


class UNet3DClassifier(nn.Module):
    """4-level U-Net classifier: decode to full resolution, GAP, linear
    (reference train_unet3d.py:115-155)."""

    in_channels: int = 1
    num_classes: int = 2
    base_ch: int = 32
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        bc = self.base_ch
        x = x.astype(self.dtype)

        e1 = UNetClassifierConvBlock(bc, **kw)(x, train)
        e2 = UNetClassifierConvBlock(bc * 2, **kw)(_pool(e1), train)
        e3 = UNetClassifierConvBlock(bc * 4, **kw)(_pool(e2), train)
        e4 = UNetClassifierConvBlock(bc * 8, **kw)(_pool(e3), train)
        b = UNetClassifierConvBlock(bc * 16, **kw)(_pool(e4), train)

        def up(x, skip, feat):
            x = nn.ConvTranspose(feat, (2, 2, 2), strides=(2, 2, 2), **kw)(x)
            x = _center_pad_to(x, skip.shape[1:4])
            x = jnp.concatenate([skip, x.astype(skip.dtype)], axis=-1)
            return UNetClassifierConvBlock(feat, **kw)(x, train)

        d4 = up(b, e4, bc * 8)
        d3 = up(d4, e3, bc * 4)
        d2 = up(d3, e2, bc * 2)
        d1 = up(d2, e1, bc)

        pooled = jnp.mean(d1, axis=(1, 2, 3))
        out = nn.Dense(self.num_classes, dtype=self.dtype,
                       param_dtype=self.param_dtype)(pooled)
        return out.astype(jnp.float32)
