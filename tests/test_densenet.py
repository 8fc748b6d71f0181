"""Dilated DenseNet (2-D/3-D)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_ad_tpu.models.densenet import (DilatedDenseNet, densenet_2d,
                                               densenet_3d)

SMALL = DilatedDenseNet(num_classes=2, growth=4, block_config=(2, 2),
                        dilations=(1, 2), init_features=8, spatial_dims=3,
                        dtype=jnp.float32)


def init_vars(model, x):
    return model.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, x, train=False)


class TestDenseNet:
    @pytest.mark.slow
    def test_3d_logits(self):
        x = jnp.zeros((2, 16, 20, 16, 1))
        out = SMALL.apply(init_vars(SMALL, x), x, train=False)
        assert out.shape == (2, 2)
        assert out.dtype == jnp.float32

    def test_2d_variant(self):
        model = DilatedDenseNet(num_classes=3, growth=4, block_config=(2, 2),
                                dilations=(1, 2), init_features=8,
                                spatial_dims=2, in_channels=3,
                                dtype=jnp.float32)
        x = jnp.zeros((1, 32, 32, 3))
        out = model.apply(init_vars(model, x), x, train=False)
        assert out.shape == (1, 3)

    @pytest.mark.slow
    def test_odd_inplanes_no_crash(self):
        """growth=6, init=10 -> feature counts not divisible by 4 — the
        configuration class that crashes the reference (denseNet.py:28-30,
        SURVEY.md §8.6) must work here."""
        model = DilatedDenseNet(num_classes=2, growth=6, block_config=(3,),
                                dilations=(1,), init_features=10,
                                spatial_dims=3, dtype=jnp.float32)
        x = jnp.zeros((1, 16, 16, 16, 1))
        out = model.apply(init_vars(model, x), x, train=False)
        assert out.shape == (1, 2)

    def test_dense_growth_arithmetic(self):
        """After block 1 (2 layers, g=4): 8+8=16 -> transition 8 channels.
        Shape-only: eval_shape avoids the init compile (fast tier)."""
        x = jnp.zeros((1, 16, 16, 16, 1))
        variables = jax.eval_shape(lambda: init_vars(SMALL, x))
        trans_conv = variables["params"]["Transition_0"]["Conv_0"]["kernel"]
        assert trans_conv.shape[-2:] == (16, 8)

    def test_depthwise_bottleneck(self):
        x = jnp.zeros((1, 16, 16, 16, 1))
        variables = jax.eval_shape(lambda: init_vars(SMALL, x))
        dw = variables["params"]["DenseLayer_0"]["Conv_1"]["kernel"]
        # depthwise: input-channel dim is 1 (feature_group_count == channels)
        assert dw.shape == (3, 3, 3, 1, 16)  # bottleneck = 4*growth = 16

    def test_factories(self):
        assert densenet_3d().spatial_dims == 3
        assert densenet_2d().in_channels == 3

    @pytest.mark.slow
    def test_trains_one_step(self):
        import optax

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 16, 16, 16, 1)), jnp.float32)
        y = jnp.asarray([0, 1, 0, 1])
        x = x + 2.0 * y[:, None, None, None, None]
        variables = init_vars(SMALL, x)
        params, bs = variables["params"], variables["batch_stats"]

        def loss_fn(p):
            logits, _ = SMALL.apply(
                {"params": p, "batch_stats": bs}, x, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(2)})
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        l0, g = jax.value_and_grad(loss_fn)(params)
        p1 = jax.tree_util.tree_map(lambda a, b: a - 0.05 * b, params, g)
        assert float(loss_fn(p1)) < float(l0)
