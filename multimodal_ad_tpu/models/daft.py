"""DAFT: Dynamic Affine Feature Map Transform for image+tabular fusion.

Technique from "Combining 3D Image and Tabular Data via the Dynamic Affine
Feature Map Transform" (arXiv:2107.05990, retrieved in PAPERS.md): the
clinical-table vector conditions a late convolutional block by predicting
per-channel scale and shift for its feature map — FiLM-style modulation
inside the residual branch. This complements the token-fusion
MultimodalClassifier (models/transformer.py) with the lightweight
modulation approach the AD literature favors for small cohorts.

Implementation: a 3D ResNet backbone (models/resnet3d.py blocks) whose last
stage's first block is a DAFT block; the auxiliary MLP maps
(GAP(image feats) concat table) -> (scale, shift) per channel.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .resnet3d import BasicBlock, ConvBN, max_pool_3d


class DAFTBlock(nn.Module):
    """Residual block whose second conv output is modulated by
    v_scale * F + v_shift, with (v_scale, v_shift) predicted from the
    bottlenecked concat of pooled image features and the tabular vector
    (arXiv:2107.05990 eq. 1-3)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    bottleneck_factor: int = 7  # r in the paper
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, table, train: bool):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        out = ConvBN(self.planes, 3, self.stride, self.dilation, **kw)(x, train)
        out = nn.relu(out)
        out = ConvBN(self.planes, 3, 1, self.dilation, **kw)(out, train)

        # auxiliary unit: GAP(image) ++ table -> bottleneck -> 2*planes
        pooled = jnp.mean(out, axis=(1, 2, 3)).astype(jnp.float32)
        aux_in = jnp.concatenate([pooled, table.astype(jnp.float32)], axis=-1)
        hidden = max(4, (aux_in.shape[-1]) // self.bottleneck_factor)
        h = nn.Dense(hidden, name="aux_hidden")(aux_in)
        h = nn.relu(h)
        scale_shift = nn.Dense(2 * self.planes, name="aux_out")(h)
        scale, shift = jnp.split(scale_shift, 2, axis=-1)
        scale = (1.0 + scale)[:, None, None, None, :].astype(out.dtype)
        shift = shift[:, None, None, None, :].astype(out.dtype)
        out = out * scale + shift

        residual = x
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = ConvBN(self.planes, 1, self.stride, **kw)(x, train)
        return nn.relu(out + residual)


class DAFTResNet(nn.Module):
    """ResNet-ish 3D backbone with a DAFT block opening the last stage."""

    num_classes: int = 2
    layers: Sequence[int] = (1, 1, 1, 1)
    dropout_rate: float = 0.3
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image, table, train: bool = False):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = image.astype(self.dtype)
        x = nn.Conv(64, (7,) * 3, strides=(2,) * 3, padding=((3, 3),) * 3,
                    use_bias=False, **kw)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(x)
        x = nn.relu(x)
        x = max_pool_3d(x, 3, 2, 1)

        stage_spec = [(64, 1, 1), (128, 2, 1), (256, 1, 2)]
        for (planes, stride, dilation), n_blocks in zip(stage_spec, self.layers):
            for bi in range(n_blocks):
                x = BasicBlock(planes, stride=stride if bi == 0 else 1,
                               dilation=dilation, **kw)(x, train)

        # last stage opens with the DAFT-conditioned block
        x = DAFTBlock(512, stride=1, dilation=4, **kw)(x, table, train)
        for _ in range(1, self.layers[3]):
            x = BasicBlock(512, dilation=4, **kw)(x, train)

        x = jnp.mean(x, axis=(1, 2, 3))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        return x.astype(jnp.float32)
