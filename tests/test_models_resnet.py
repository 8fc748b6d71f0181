"""3D ResNet family: shapes, heads, shortcut types, dtype policy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_ad_tpu.models.resnet3d import (DEPTH_BLOCKS, FC_IN, ResNet3D,
                                               generate_model, image_encoder,
                                               resnet10, resnet18)


def init_and_apply(model, x, train=False):
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False)
    out = model.apply(variables, x, train=train,
                      mutable=["batch_stats"] if train else False,
                      rngs={"dropout": jax.random.PRNGKey(2)} if train else None)
    return out, variables


def shapes_of(model, x, train=False):
    """init_and_apply under jax.eval_shape: shape/param-layout assertions
    without paying the 1-CPU compile (keeps shape-only tests in the fast
    tier); numeric fast smokes stay on init_and_apply."""
    return jax.eval_shape(lambda: init_and_apply(model, x, train=train))


SMALL = (1, 20, 24, 20, 1)


class TestResNet3D:
    @pytest.mark.parametrize("depth", [10, 18])
    def test_classifier_output_shape(self, depth):
        model = generate_model(model_depth=depth, nb_class=2,
                               compute_dtype=jnp.float32)
        x = jnp.zeros(SMALL)
        out, _ = shapes_of(model, x)
        assert out.shape == (1, 2)
        assert out.dtype == jnp.float32

    @pytest.mark.slow
    def test_bottleneck_classifier(self):
        model = generate_model(model_depth=50, nb_class=2,
                               compute_dtype=jnp.float32)
        out, variables = init_and_apply(model, jnp.zeros(SMALL))
        assert out.shape == (1, 2)
        # final dense must see 2048 features (reference fc_in map,
        # train_ResNet3D.py:65)
        dense = [v for k, v in variables["params"].items() if "Dense" in k][0]
        assert dense["kernel"].shape[0] == FC_IN[50]

    def test_fc_in_map_basic(self):
        for depth in (10, 18):
            model = generate_model(model_depth=depth, compute_dtype=jnp.float32)
            _, variables = shapes_of(model, jnp.zeros(SMALL))
            dense = [v for k, v in variables["params"].items() if "Dense" in k][0]
            assert dense["kernel"].shape[0] == FC_IN[depth]

    def test_dilated_stages_keep_resolution(self):
        """Stages 3/4 use stride 1 + dilation (reference resnet.py:140-143):
        layer4 output spatial = input/8 (stem /2, pool /2, stage2 /2)."""
        model = image_encoder(depth=10, global_pool=False, dtype=jnp.float32)
        x = jnp.zeros((1, 32, 32, 32, 1))
        out, _ = shapes_of(model, x)
        assert out.shape == (1, 4, 4, 4, 512)

    def test_encoder_global_pool(self):
        model = image_encoder(depth=18, global_pool=True, dtype=jnp.float32)
        out, _ = shapes_of(model, jnp.zeros(SMALL))
        assert out.shape == (1, 512)

    def test_shortcut_a_has_no_downsample_params(self):
        ma = ResNet3D(depth=10, shortcut_type="A", dtype=jnp.float32)
        mb = ResNet3D(depth=10, shortcut_type="B", dtype=jnp.float32)
        _, va = shapes_of(ma, jnp.zeros(SMALL))
        _, vb = shapes_of(mb, jnp.zeros(SMALL))
        na = sum(x.size for x in jax.tree_util.tree_leaves(va["params"]))
        nb = sum(x.size for x in jax.tree_util.tree_leaves(vb["params"]))
        assert na < nb  # 'A' shortcut is parameter-free (resnet.py:26-37)

    def test_seg_head_shape(self):
        model = ResNet3D(depth=10, head="seg", num_seg_classes=1,
                         dtype=jnp.float32)
        x = jnp.zeros((1, 32, 32, 32, 1))
        out, _ = shapes_of(model, x)
        # conv_seg upsamples layer4 (/8) by 2 -> /4 (resnet.py:145-169)
        assert out.shape == (1, 8, 8, 8, 1)

    def test_bf16_policy_params_stay_fp32(self):
        # dtype-only assertions: eval_shape carries dtypes without compiling
        model = generate_model(model_depth=10, compute_dtype=jnp.bfloat16)
        out, variables = shapes_of(model, jnp.zeros(SMALL))
        for leaf in jax.tree_util.tree_leaves(variables["params"]):
            assert leaf.dtype == jnp.float32
        assert out.dtype == jnp.float32  # logits re-cast for stable softmax

    def test_train_mode_updates_batch_stats(self):
        model = generate_model(model_depth=10, compute_dtype=jnp.float32)
        x = jnp.asarray(np.random.default_rng(0).normal(size=SMALL),
                        jnp.float32)
        (out, updates), variables = init_and_apply(model, x, train=True)
        old = variables["batch_stats"]
        new = updates["batch_stats"]
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), old, new)
        assert max(jax.tree_util.tree_leaves(diffs)) > 0

    @pytest.mark.slow  # ~55s on the 1-CPU box (dropout-graph compile);
    def test_dropout_active_only_in_train(self):  # batch-stats test is the
        # family's fast train-mode smoke
        model = generate_model(model_depth=10, dropout_rate=0.5,
                               compute_dtype=jnp.float32)
        x = jnp.asarray(np.random.default_rng(0).normal(size=SMALL), jnp.float32)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x,
            train=False)
        e1 = model.apply(variables, x, train=False)
        e2 = model.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))

    def test_depth_blocks_table(self):
        assert DEPTH_BLOCKS[18] == ("basic", (2, 2, 2, 2))
        assert DEPTH_BLOCKS[200] == ("bottleneck", (3, 24, 36, 3))

    def test_factories(self):
        assert resnet10().depth == 10
        assert resnet18(num_classes=4).num_classes == 4

    def test_intermediates_taps(self):
        """Explicit activation taps replace torch forward hooks
        (reference models/mymodel.py:62-85)."""
        model = image_encoder(depth=10, global_pool=False, dtype=jnp.float32)
        x = jnp.zeros((1, 16, 16, 16, 1))
        out, inter = jax.eval_shape(lambda: model.apply(  # shape-only
            model.init({"params": jax.random.PRNGKey(0)}, x, train=False),
            x, train=False, mutable=["intermediates"]))
        taps = inter["intermediates"]["stage_out"]
        assert len(taps) == 4  # one per stage
        assert taps[0].shape[-1] == 64 and taps[3].shape[-1] == 512


class TestStemS2D:
    """Space-to-depth stem (StemConv): numerically identical to the native
    7^3/s2 conv on the SAME (7,7,7,C,64) parameter, for odd spatial shapes
    and multi-channel inputs, and the param tree path is unchanged."""

    @pytest.mark.parametrize("shape,cin", [((19, 22, 21), 1),
                                           pytest.param((20, 24, 20), 1,
                                                        marks=pytest.mark.slow),
                                           pytest.param((19, 22, 21), 2,
                                                        marks=pytest.mark.slow)])
    def test_native_parity_same_params(self, shape, cin):
        # each variant is its own ~10-15s compile on the 1-CPU box; one
        # odd-shape 1-channel parity case stays as the fast numeric smoke
        x = jax.random.normal(jax.random.PRNGKey(0), (2, *shape, cin),
                              jnp.float32)
        m_ref = ResNet3D(depth=10, in_channels=cin, s2d_stem=False,
                         dtype=jnp.float32)
        m_s2d = ResNet3D(depth=10, in_channels=cin, s2d_stem=True,
                         dtype=jnp.float32)
        v = m_ref.init(jax.random.PRNGKey(1), x, False)
        ya = np.asarray(m_ref.apply(v, x, False))
        yb = np.asarray(m_s2d.apply(v, x, False))
        np.testing.assert_allclose(ya, yb, atol=1e-4, rtol=1e-4)
        # same checkpoint-facing parameter layout
        assert v["params"]["Conv_0"]["kernel"].shape == (7, 7, 7, cin, 64)

    @pytest.mark.slow  # full fwd+bwd compile ~30s on the 1-CPU box; the
    def test_s2d_stem_gradients_flow(self):  # parity tests stay fast
        x = jax.random.normal(jax.random.PRNGKey(0), SMALL, jnp.float32)
        model = ResNet3D(depth=10, s2d_stem=True, dtype=jnp.float32)
        v = model.init({"params": jax.random.PRNGKey(1),
                        "dropout": jax.random.PRNGKey(2)}, x, False)

        def loss(params):
            out = model.apply({**v, "params": params}, x, train=True,
                              mutable=["batch_stats"],
                              rngs={"dropout": jax.random.PRNGKey(3)})[0]
            return (out.astype(jnp.float32) ** 2).mean()

        g = jax.grad(loss)(v["params"])
        gk = np.asarray(g["Conv_0"]["kernel"])
        assert np.isfinite(gk).all() and np.abs(gk).max() > 0
