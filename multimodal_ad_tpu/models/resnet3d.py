"""3D ResNet family (MedicalNet-style), TPU-native.

Architecture parity with reference models/resnet.py:40-264 and
models/ImageEncoder.py:121-248:

- conv 7x7x7 stride 2 stem -> 3x3x3 stride-2 max pool,
- 4 stages at 64/128/256/512 planes; stage 3 stride 1 dilation 2, stage 4
  stride 1 dilation 4 (resnet.py:140-143),
- BasicBlock (expansion 1) / Bottleneck (expansion 4),
- shortcut type 'A' (strided avg-pool + zero channel pad, resnet.py:26-37)
  or 'B' (1x1 conv + BN),
- depth->blocks: 10:[1,1,1,1], 18:[2,2,2,2], 34:[3,4,6,3], 50:[3,4,6,3]B,
  101:[3,4,23,3]B, 152:[3,8,36,3]B, 200:[3,24,36,3]B (resnet.py:218-264),
- classifier head = GAP -> dropout -> linear, replacing the reference's
  conv_seg swap-out (train_ResNet3D.py:66-71); the original transposed-conv
  segmentation head is also available (head='seg', resnet.py:145-169),
- encoder mode = headless with optional global pool
  (ImageEncoder.py:210-221).

TPU-first design choices (not a port):
- channels-last NDHWC layout — XLA's native conv layout on TPU,
- bf16 compute / fp32 params via linen dtype/param_dtype (the reference's
  AMP fp16 + GradScaler is unnecessary on TPU),
- BatchNorm uses plain jnp batch statistics: under GSPMD with a
  batch-sharded input, the reduction is global over the data axis
  automatically, so multi-chip training matches single-device stats,
- everything is trace-friendly: no data-dependent Python control flow.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

DEPTH_BLOCKS = {
    10: ("basic", (1, 1, 1, 1)),
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
    200: ("bottleneck", (3, 24, 36, 3)),
}
EXPANSION = {"basic": 1, "bottleneck": 4}
# Classifier-head input width = 512 * expansion. The reference's map
# (train_ResNet3D.py:65) lists depth 10 as 256, which is wrong for its own
# BasicBlock[1,1,1,1] architecture (would crash at runtime if exercised);
# corrected to 512 here.
FC_IN = {10: 512, 18: 512, 34: 512, 50: 2048, 101: 2048, 152: 2048, 200: 2048}


def max_pool_3d(x, window=3, stride=2, padding=1):
    """XLA reduce_window pool (backward = select-and-scatter).

    A dense slice/pad re-expression of the backward exists
    (ops/pool.py::max_pool_3d_fast) but measured SLOWER end-to-end on the
    chip (291 vs 315 vols/s train, paired A/B) — select-and-scatter's
    17.9 ms/step runs at 227 GB/s, ~2.5x off the bandwidth floor, while
    the dense form reads the stem grid ~50x. Kept as a documented
    negative result (benchmarks/TRAIN_OP_TRACE.md)."""
    return nn.max_pool(
        x,
        window_shape=(window,) * 3,
        strides=(stride,) * 3,
        padding=((padding, padding),) * 3,
    )


def avg_pool_3d(x, window, stride, padding=0):
    return nn.avg_pool(
        x,
        window_shape=(window,) * 3,
        strides=(stride,) * 3,
        padding=((padding, padding),) * 3,
    )


def global_avg_pool(x):
    return jnp.mean(x, axis=(1, 2, 3))


class ConvBN(nn.Module):
    """Conv3D (no bias) + BatchNorm, kaiming-init weights."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            kernel_size=(self.kernel,) * 3,
            strides=(self.stride,) * 3,
            kernel_dilation=(self.dilation,) * 3,
            padding=((pad, pad),) * 3,
            use_bias=False,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "truncated_normal"),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        return x


def _stem_s2d_index_map():
    """Static tap map for the space-to-depth stem: entry [td,th,tw,phase]
    is the flat index into the 7^3 kernel (or -1 where the phase has no
    tap). Derivation: output o of the 7^3/s2/pad-3 stem reads
    x[2o + k - 3]; writing the input index as 2m + p (block m, phase p),
    k = 2t + p - 1 for tap t = m - o + 2 in [0, 4)."""
    idx = np.full((4, 4, 4, 8), -1, np.int64)
    for td in range(4):
        for th in range(4):
            for tw in range(4):
                for pd in range(2):
                    for ph in range(2):
                        for pw in range(2):
                            kd, kh, kw = (2 * td + pd - 1, 2 * th + ph - 1,
                                          2 * tw + pw - 1)
                            if all(0 <= k <= 6 for k in (kd, kh, kw)):
                                idx[td, th, tw, (pd * 2 + ph) * 2 + pw] = (
                                    kd * 7 + kh) * 7 + kw
    return idx


_STEM_S2D_IDX = _stem_s2d_index_map()


class StemConv(nn.Module):
    """7^3 stride-2 stem conv, computed via space-to-depth.

    The naive stem is MXU-starved: C_in=1 pads to the 8-lane minimum and
    the contraction dim is only 343, so it runs at a few % of peak
    (measured 3.6% fwd / 1.7% f+b in isolation — benchmarks/stem_s2d.py).
    Space-to-depth packs the 2^3 input phases onto the channel axis and
    runs a DENSE 4^3 stride-1 conv over the half-resolution grid
    (lane-aligned 8*C_in contraction), the classic TPU ResNet conv0
    optimization. The parameter stays the reference-shaped (7,7,7,C,64)
    kernel — rearranged each call by a static gather (343*64 elements,
    negligible) — so checkpoints and MedicalNet torch-weight ingestion
    (utils/torch_weights.py) are unaffected.
    """

    features: int = 64
    s2d: bool = True
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out",
                                             "truncated_normal"),
            (7, 7, 7, c_in, self.features), self.param_dtype)
        k = kernel.astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC"))
        if not self.s2d:
            return jax.lax.conv_general_dilated(
                x, k, (2, 2, 2), ((3, 3),) * 3, dimension_numbers=dn)
        # weights: (7,7,7,C,F) -> (4,4,4,8*C,F), phase-major channels
        idx = jnp.asarray(_STEM_S2D_IDX.reshape(-1))
        w_flat = k.reshape(343, c_in, self.features)
        w2 = jnp.where((idx >= 0)[:, None, None],
                       jnp.take(w_flat, jnp.maximum(idx, 0), axis=0), 0)
        w2 = w2.reshape(4, 4, 4, 8 * c_in, self.features)
        # input: (B,D,H,W,C) -> (B,ceil(D/2),...,8C), x2[m, p] = x[2m+p]
        b, D, H, W, _ = x.shape
        xp = jnp.pad(x, ((0, 0), (0, D % 2), (0, H % 2), (0, W % 2),
                         (0, 0)))
        Dp, Hp, Wp = xp.shape[1:4]
        xs = xp.reshape(b, Dp // 2, 2, Hp // 2, 2, Wp // 2, 2, c_in)
        xs = xs.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        xs = xs.reshape(b, Dp // 2, Hp // 2, Wp // 2, 8 * c_in)
        dn2 = jax.lax.conv_dimension_numbers(
            xs.shape, w2.shape, ("NDHWC", "DHWIO", "NDHWC"))
        return jax.lax.conv_general_dilated(
            xs, w2, (1, 1, 1), ((2, 1),) * 3, dimension_numbers=dn2)


class ShortcutA(nn.Module):
    """Parameter-free shortcut: strided 1x1x1 avg pool + zero channel pad
    (reference models/resnet.py:26-37)."""

    out_features: int
    stride: int

    @nn.compact
    def __call__(self, x):
        if self.stride != 1:
            x = avg_pool_3d(x, window=1, stride=self.stride)
        pad = self.out_features - x.shape[-1]
        if pad > 0:
            x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, pad),))
        return x


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    shortcut_type: str = "B"
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool):
        cbn = partial(ConvBN, dtype=self.dtype, param_dtype=self.param_dtype)
        out = cbn(self.planes, 3, self.stride, self.dilation)(x, train)
        out = nn.relu(out)
        out = cbn(self.planes, 3, 1, self.dilation)(out, train)

        residual = x
        if self.stride != 1 or x.shape[-1] != self.planes:
            if self.shortcut_type == "A":
                residual = ShortcutA(self.planes, self.stride)(x)
            else:
                residual = cbn(self.planes, 1, self.stride)(x, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    shortcut_type: str = "B"
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool):
        cbn = partial(ConvBN, dtype=self.dtype, param_dtype=self.param_dtype)
        out_features = self.planes * 4
        out = nn.relu(cbn(self.planes, 1)(x, train))
        out = nn.relu(cbn(self.planes, 3, self.stride, self.dilation)(out, train))
        out = cbn(out_features, 1)(out, train)

        residual = x
        if self.stride != 1 or x.shape[-1] != out_features:
            if self.shortcut_type == "A":
                residual = ShortcutA(out_features, self.stride)(x)
            else:
                residual = cbn(out_features, 1, self.stride)(x, train)
        return nn.relu(out + residual)


class SegHead(nn.Module):
    """Transposed-conv segmentation head (reference resnet.py:145-169)."""

    num_seg_classes: int = 1
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        x = nn.ConvTranspose(32, kernel_size=(2,) * 3, strides=(2,) * 3, **kw)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(x)
        x = nn.relu(x)
        x = nn.Conv(32, kernel_size=(3,) * 3, padding=1, use_bias=False, **kw)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_seg_classes, kernel_size=(1,) * 3, use_bias=False, **kw)(x)
        return x


class ResNet3D(nn.Module):
    """3D ResNet backbone with selectable head.

    head: 'classifier' (GAP->dropout->linear, the generate_model swap at
    reference train_ResNet3D.py:66-71), 'seg' (conv_seg parity), 'pool'
    (GAP embedding — ImageEncoder global_pool=True), or 'none' (layer4
    feature map — ImageEncoder global_pool=False).
    """

    depth: int = 18
    num_classes: int = 2
    in_channels: int = 1
    shortcut_type: str = "B"
    head: str = "classifier"
    dropout_rate: float = 0.5
    num_seg_classes: int = 1
    remat: bool = False  # rematerialize blocks: trade FLOPs for HBM
    s2d_stem: bool = True  # space-to-depth stem conv (see StemConv)
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.depth not in DEPTH_BLOCKS:
            raise ValueError(f"unsupported depth {self.depth}")
        # flax infers conv input width, so a wrong-channel input would train
        # silently against the declared config — fail fast instead
        if x.shape[-1] != self.in_channels:
            raise ValueError(
                f"input has {x.shape[-1]} channels, model declares "
                f"in_channels={self.in_channels}")
        kind, layers = DEPTH_BLOCKS[self.depth]
        block_cls = BasicBlock if kind == "basic" else Bottleneck
        if self.remat:
            # jax.checkpoint per residual block: activations are recomputed
            # in the backward pass, cutting peak HBM for deep/big-batch runs
            block_cls = nn.remat(block_cls, static_argnums=(2,))

        x = x.astype(self.dtype)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        # stem: 7^3/s2 conv -> BN -> relu -> 3^3/s2 maxpool. Named
        # "Conv_0" so the param tree path matches the original nn.Conv
        # stem (checkpoint/ingestion compatibility).
        x = StemConv(64, s2d=self.s2d_stem, name="Conv_0", **kw)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, **kw)(x)
        x = nn.relu(x)
        x = max_pool_3d(x, 3, 2, 1)

        stage_spec = [  # (planes, stride, dilation) — resnet.py:137-143
            (64, 1, 1),
            (128, 2, 1),
            (256, 1, 2),
            (512, 1, 4),
        ]
        for (planes, stride, dilation), n_blocks in zip(stage_spec, layers):
            for bi in range(n_blocks):
                x = block_cls(
                    planes,
                    stride=stride if bi == 0 else 1,
                    dilation=dilation,
                    shortcut_type=self.shortcut_type,
                    **kw,
                )(x, train)
            # activation tap for feature extraction (JAX has no hooks;
            # taps are explicit — SURVEY.md §7.2 step 5)
            self.sow("intermediates", "stage_out", x)

        if self.head == "seg":
            return SegHead(self.num_seg_classes, **kw)(x, train)
        if self.head == "pool":
            return global_avg_pool(x).astype(jnp.float32)
        if self.head == "none":
            return x
        # classifier
        x = global_avg_pool(x)
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype,
                     param_dtype=self.param_dtype)(x)
        return x.astype(jnp.float32)


def _factory(depth):
    def make(**kw):
        return ResNet3D(depth=depth, **kw)
    make.__name__ = f"resnet{depth}"
    make.__doc__ = f"3D ResNet-{depth} (reference models/resnet.py:218-264 parity)."
    return make


resnet10 = _factory(10)
resnet18 = _factory(18)
resnet34 = _factory(34)
resnet50 = _factory(50)
resnet101 = _factory(101)
resnet152 = _factory(152)
resnet200 = _factory(200)


def image_encoder(depth=18, in_channels=1, shortcut_type="B",
                  global_pool=False, **kw):
    """Headless encoder (reference models/ImageEncoder.py:227-248)."""
    return ResNet3D(depth=depth, in_channels=in_channels,
                    shortcut_type=shortcut_type,
                    head="pool" if global_pool else "none", **kw)


def generate_model(model_type="resnet", model_depth=18, resnet_shortcut="B",
                   nb_class=2, dropout_rate=0.5, in_channels=1,
                   compute_dtype=jnp.bfloat16, param_dtype=jnp.float32,
                   s2d_stem=True, **_ignored):
    """Config-driven factory (reference train_ResNet3D.py:44-84 semantics,
    minus device placement — JAX handles that via sharding).

    ``s2d_stem=False`` selects the naive 7^3/s2 stem — slower on the MXU
    but free of the space-to-depth divisibility rule, so a volume axis can
    be spatially sharded to ANY degree (parallel/mesh.py spatial_sharding
    layout note). The parameter layout is identical either way, so the two
    stems are checkpoint-compatible."""
    assert model_type == "resnet"
    assert model_depth in DEPTH_BLOCKS
    return ResNet3D(
        depth=model_depth,
        num_classes=nb_class,
        in_channels=in_channels,
        shortcut_type=resnet_shortcut,
        head="classifier",
        dropout_rate=dropout_rate,
        dtype=compute_dtype,
        param_dtype=param_dtype,
        s2d_stem=s2d_stem,
    )
