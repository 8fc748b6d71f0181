"""3D U-Net family: round-trip shapes, feature taps, classifier."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_ad_tpu.models.unet3d import (UNet3D, UNet3DClassifier,
                                             unet_forward_with_features)


def init_vars(model, x):
    return model.init({"params": jax.random.PRNGKey(0)}, x, train=False)


class TestUNet3D:
    @pytest.mark.slow
    def test_odd_shape_roundtrip(self):
        """91x109x91 in -> 91x109x91 out (reference unet3d.py:163-168
        self-test; pad-to-(96,112,96) happens internally)."""
        model = UNet3D(in_channels=1, num_classes=1, level_channels=(8, 16, 32),
                       bottleneck_channel=64, dtype=jnp.float32)
        x = jnp.zeros((1, 23, 27, 23, 1))
        variables = init_vars(model, x)
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 23, 27, 23, 1)

    @pytest.mark.slow
    def test_multiple_of_8_unpadded(self):
        model = UNet3D(level_channels=(8, 16, 32), bottleneck_channel=64,
                       dtype=jnp.float32)
        x = jnp.zeros((1, 16, 24, 16, 1))
        out = model.apply(init_vars(model, x), x, train=False)
        assert out.shape == (1, 16, 24, 16, 1)

    @pytest.mark.slow
    def test_feature_tap_64ch(self):
        """The pre-head decoder map (ROI pooling source) has level_channels[0]
        channels and input spatial dims (reference image_features.py:103-108)."""
        model = UNet3D(level_channels=(64, 128, 256), bottleneck_channel=512,
                       dtype=jnp.float32)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 11, 13, 11, 1)),
                        jnp.float32)
        variables = init_vars(model, x)
        out, feats = unet_forward_with_features(model, variables, x)
        assert out.shape == (1, 11, 13, 11, 1)
        assert feats.shape == (1, 11, 13, 11, 64)

    def test_default_channel_plan(self):
        """64/128/256 + bottleneck 512 (reference unet3d.py:101-108).
        Shape-only: eval_shape skips the ~20s full-width compile on the
        1-CPU box, keeping a fast-tier default-UNet check."""
        model = UNet3D(dtype=jnp.float32)
        x = jnp.zeros((1, 8, 8, 8, 1))
        variables = jax.eval_shape(lambda: init_vars(model, x))
        p = variables["params"]
        assert p["ConvBlock3D_0"]["Conv_0"]["kernel"].shape[-1] == 32  # 64//2
        assert p["ConvBlock3D_0"]["Conv_1"]["kernel"].shape[-1] == 64
        assert p["ConvBlock3D_3"]["Conv_1"]["kernel"].shape[-1] == 512


class TestUNet3DClassifier:
    @pytest.mark.slow
    def test_logits_shape_odd_input(self):
        model = UNet3DClassifier(base_ch=4, num_classes=2, dtype=jnp.float32)
        x = jnp.zeros((2, 21, 25, 21, 1))
        variables = init_vars(model, x)
        out = model.apply(variables, x, train=False)
        assert out.shape == (2, 2)
        assert out.dtype == jnp.float32

    def test_classifier_head_width_is_base_ch(self):
        # eval_shape: param shapes without compiling the init forward —
        # keeps this the family's cheap fast-tier smoke
        model = UNet3DClassifier(base_ch=4, num_classes=2, dtype=jnp.float32)
        x = jnp.zeros((1, 16, 16, 16, 1))
        variables = jax.eval_shape(
            lambda: model.init({"params": jax.random.PRNGKey(0)}, x,
                               train=False))
        dense = variables["params"]["Dense_0"]["kernel"]
        assert dense.shape == (4, 2)  # GAP over base_ch map (train_unet3d.py:137-138)

    @pytest.mark.slow
    def test_train_updates_batch_stats(self):
        model = UNet3DClassifier(base_ch=2, num_classes=2, dtype=jnp.float32)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 16, 1)),
                        jnp.float32)
        variables = init_vars(model, x)
        out, updates = model.apply(variables, x, train=True,
                                   mutable=["batch_stats"])
        assert out.shape == (2, 2)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            variables["batch_stats"], updates["batch_stats"])
        assert max(jax.tree_util.tree_leaves(diffs)) > 0
