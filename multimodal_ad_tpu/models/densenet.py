"""Dilated depthwise-separable DenseNet (2-D and 3-D).

The reference ships a 2-D dilated DenseNet whose bottleneck reuses one
BatchNorm across different channel widths — it crashes whenever
`inplanes % 4 != 0` — and its trainer file is empty
(reference models/denseNet.py:7-131, train_denseNet.py; SURVEY.md §8.6).
BASELINE.json's config list nevertheless names a "denseNet 3D MRI
classifier", so this is the working design:

- DenseNet-121-style layout (blocks [6, 12, 24, 16], growth rate g,
  transition compression 0.5 — denseNet.py's structure),
- each dense layer: BN -> ReLU -> 1x1 conv (4g bottleneck) -> BN -> ReLU ->
  dilated DEPTHWISE 3x3 conv -> 1x1 pointwise to g channels (the
  depthwise-separable + dilation idea the reference was going for),
- `spatial_dims` 2 or 3 — 3-D is the MRI classifier; 2-D covers the
  reference's original surface,
- per-layer norms (fixing the shared-BN crash), channels-last, bf16 policy.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn


class DenseLayer(nn.Module):
    growth: int
    dilation: int = 1
    spatial_dims: int = 3
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        k = self.spatial_dims
        bottleneck = 4 * self.growth

        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(x)
        y = nn.relu(y)
        y = nn.Conv(bottleneck, (1,) * k, use_bias=False, **kw)(y)

        y = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(y)
        y = nn.relu(y)
        # dilated depthwise 3x3 (feature_group_count == channels)
        y = nn.Conv(bottleneck, (3,) * k,
                    kernel_dilation=(self.dilation,) * k,
                    padding=self.dilation,
                    feature_group_count=bottleneck,
                    use_bias=False, **kw)(y)
        y = nn.Conv(self.growth, (1,) * k, use_bias=False, **kw)(y)
        return jnp.concatenate([x, y], axis=-1)


class Transition(nn.Module):
    out_features: int
    spatial_dims: int = 3
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        k = self.spatial_dims
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_features, (1,) * k, use_bias=False, **kw)(x)
        return nn.avg_pool(x, (2,) * k, strides=(2,) * k)


class DilatedDenseNet(nn.Module):
    """DenseNet classifier over 2-D slices or 3-D volumes."""

    num_classes: int = 2
    in_channels: int = 1
    growth: int = 16
    block_config: Sequence[int] = (6, 12, 24, 16)
    dilations: Sequence[int] = (1, 1, 2, 4)
    init_features: int = 64
    compression: float = 0.5
    spatial_dims: int = 3
    dropout_rate: float = 0.2
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        k = self.spatial_dims
        x = x.astype(self.dtype)

        # stem: 7/s2 conv + 3/s2 maxpool
        x = nn.Conv(self.init_features, (7,) * k, strides=(2,) * k,
                    padding=3, use_bias=False, **kw)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3,) * k, strides=(2,) * k, padding=((1, 1),) * k)

        features = self.init_features
        for bi, (n_layers, dilation) in enumerate(
                zip(self.block_config, self.dilations)):
            for _ in range(n_layers):
                x = DenseLayer(self.growth, dilation, k, **kw)(x, train)
                features += self.growth
            if bi != len(self.block_config) - 1:
                features = int(features * self.compression)
                x = Transition(features, k, **kw)(x, train)

        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=tuple(range(1, 1 + k)))  # GAP
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, **kw)(x)
        return x.astype(jnp.float32)


def densenet_3d(num_classes=2, in_channels=1, **kw):
    return DilatedDenseNet(num_classes=num_classes, in_channels=in_channels,
                           spatial_dims=3, **kw)


def densenet_2d(num_classes=2, in_channels=3, **kw):
    """2-D variant (the reference's original 3-channel surface)."""
    return DilatedDenseNet(num_classes=num_classes, in_channels=in_channels,
                           spatial_dims=2, **kw)
