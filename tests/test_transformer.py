"""Cross-modal transformer toolkit + multimodal fusion classifier."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_ad_tpu.models.transformer import (CrossAttention,
                                                  CrossTransformer,
                                                  CrossTransformerModAvg,
                                                  MultimodalClassifier, SFCN,
                                                  SmallCNN3D, Transformer,
                                                  positional_encoding_1d,
                                                  volume_to_tokens)


def init_apply(model, *args, train=False, **kw):
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, *args,
                           train=train, **kw)
    return model.apply(variables, *args, train=train, **kw,
                       rngs={"dropout": jax.random.PRNGKey(2)}), variables


class TestTokenizers:
    def test_small_cnn_downsamples_16x(self):
        # shape-only: eval_shape avoids a ~20s 1-CPU compile (fast tier)
        m = SmallCNN3D(dim=32, dtype=jnp.float32)
        x = jnp.zeros((1, 32, 32, 32, 1))
        out, _ = jax.eval_shape(lambda: init_apply(m, x))
        assert out.shape == (1, 2, 2, 2, 32)

    def test_sfcn_shapes(self):
        m = SFCN(dtype=jnp.float32)
        x = jnp.zeros((1, 32, 32, 32, 1))
        out, _ = jax.eval_shape(lambda: init_apply(m, x))  # shape-only
        assert out.shape == (1, 2, 2, 2, 64)

    def test_volume_to_tokens_with_pos(self):
        fm = jnp.zeros((2, 2, 3, 2, 16))
        toks = volume_to_tokens(fm)
        assert toks.shape == (2, 12, 16)
        # positions differ across tokens
        assert not np.allclose(np.asarray(toks[0, 0]), np.asarray(toks[0, 1]))

    def test_positional_encoding_odd_channels(self):
        pe = positional_encoding_1d(5, 7)
        assert pe.shape == (5, 7)
        np.testing.assert_allclose(pe[0, 0], 0.0, atol=1e-7)


class TestAttention:
    def test_self_vs_cross(self):
        m = CrossAttention(dim=16, heads=2, dim_head=8)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 4, 16)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 6, 16)), jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), x)
        self_out = m.apply(variables, x)
        cross_out = m.apply(variables, x, context=ctx)
        assert self_out.shape == cross_out.shape == (1, 4, 16)
        assert not np.allclose(np.asarray(self_out), np.asarray(cross_out))

    def test_kv_include_self(self):
        m = CrossAttention(dim=16, heads=2, dim_head=8)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(1, 4, 16)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(1, 6, 16)), jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), x)
        a = m.apply(variables, x, context=ctx)
        b = m.apply(variables, x, context=ctx, kv_include_self=True)
        assert not np.allclose(np.asarray(a), np.asarray(b))


class TestCrossTransformers:
    def test_cross_transformer_shapes(self):
        m = CrossTransformer(dim=16, depth=2, heads=2, dim_head=8, mlp_dim=32)
        rng = np.random.default_rng(0)
        mri = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
        pet = jnp.asarray(rng.normal(size=(2, 7, 16)), jnp.float32)
        # shape-only -> eval_shape (skips a ~7s compile on the 1-CPU box)
        mo, po = jax.eval_shape(lambda: m.apply(
            m.init(jax.random.PRNGKey(0), mri, pet), mri, pet))
        assert mo.shape == (2, 5, 16) and po.shape == (2, 7, 16)

    def test_share_mode_fewer_params(self):
        """share=True must work (reference's share branch crashes,
        SURVEY.md §8.8) and reuse one encoder pair."""
        rng = np.random.default_rng(0)
        mri = jnp.asarray(rng.normal(size=(1, 3, 16)), jnp.float32)
        pet = jnp.asarray(rng.normal(size=(1, 3, 16)), jnp.float32)
        shared = CrossTransformer(dim=16, depth=3, share=True, dim_head=8)
        unshared = CrossTransformer(dim=16, depth=3, share=False, dim_head=8)
        # param-count + does-the-share-branch-trace checks need no numerics:
        # eval_shape catches the reference's structural crash at trace time
        vs = jax.eval_shape(lambda: shared.init(jax.random.PRNGKey(0),
                                                mri, pet))
        vu = jax.eval_shape(lambda: unshared.init(jax.random.PRNGKey(0),
                                                  mri, pet))
        ns = sum(x.size for x in jax.tree_util.tree_leaves(vs))
        nu = sum(x.size for x in jax.tree_util.tree_leaves(vu))
        assert ns * 2 < nu
        # forward traces (vs passed as an eval_shape ARG so its
        # ShapeDtypeStruct leaves become tracers inside apply)
        jax.eval_shape(lambda v: shared.apply(v, mri, pet), vs)

    def test_mod_avg_cls_token(self):
        m = CrossTransformerModAvg(dim=16, depth=1, heads=2, dim_head=8,
                                   mlp_dim=32)
        rng = np.random.default_rng(0)
        mri = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
        pet = jnp.asarray(rng.normal(size=(2, 5, 16)), jnp.float32)
        cls = jax.eval_shape(lambda: m.apply(  # shape-only
            m.init(jax.random.PRNGKey(0), mri, pet), mri, pet))
        assert cls.shape == (2, 64)  # 4 * dim (GAP+GMP per modality)


class TestMultimodalClassifier:
    @pytest.mark.slow  # 12-48s compile on the throttly 1-CPU box; the
    def test_mri_only(self):  # tokenizer/attention/cross-transformer tests
        # + test_missing_modality_raises keep the family's fast coverage
        m = MultimodalClassifier(num_classes=2, dim=16, depth=1, heads=2,
                                 dim_head=8, mlp_dim=32, dtype=jnp.float32)
        x = jnp.zeros((2, 16, 16, 16, 1))
        out, _ = init_apply(m, x)
        assert out.shape == (2, 2)

    @pytest.mark.slow  # second volume tokenizer = ~30s compile on 1 CPU
    def test_mri_pet(self):
        m = MultimodalClassifier(num_classes=2, dim=16, depth=1, heads=2,
                                 dim_head=8, mlp_dim=32, use_pet=True,
                                 dtype=jnp.float32)
        x = jnp.zeros((1, 16, 16, 16, 1))
        out, _ = init_apply(m, x, pet=x)
        assert out.shape == (1, 2)

    @pytest.mark.slow  # ~40s on the 1-CPU box (volume tokenizer + table MLP)
    def test_mri_table(self):
        m = MultimodalClassifier(num_classes=2, dim=16, depth=1, heads=2,
                                 dim_head=8, mlp_dim=32, use_table=True,
                                 dtype=jnp.float32)
        x = jnp.zeros((2, 16, 16, 16, 1))
        t = jnp.zeros((2, 96))
        out, _ = init_apply(m, x, table=t)
        assert out.shape == (2, 2)

    def test_missing_modality_raises(self):
        m = MultimodalClassifier(use_pet=True, dtype=jnp.float32)
        x = jnp.zeros((1, 16, 16, 16, 1))
        with pytest.raises(ValueError, match="requires"):
            # the validation fires at trace time — eval_shape skips compile
            jax.eval_shape(lambda: m.init({"params": jax.random.PRNGKey(0)},
                                          x, train=False))

    @pytest.mark.slow
    def test_trainable_end_to_end(self):
        """One gradient step decreases loss on a tiny separable batch."""
        import optax

        m = MultimodalClassifier(num_classes=2, dim=16, depth=1, heads=2,
                                 dim_head=8, mlp_dim=32, dropout=0.0,
                                 dtype=jnp.float32)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(4, 16, 16, 16, 1)), jnp.float32)
        y = jnp.asarray([0, 1, 0, 1])
        x = x + 3.0 * y[:, None, None, None, None]
        variables = m.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        params, bs = variables["params"], variables["batch_stats"]

        def loss_fn(p):
            logits, _ = m.apply({"params": p, "batch_stats": bs}, x,
                                train=True, mutable=["batch_stats"],
                                rngs={"dropout": jax.random.PRNGKey(1)})
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        l0, g = jax.value_and_grad(loss_fn)(params)
        p1 = jax.tree_util.tree_map(lambda a, b: a - 0.05 * b, params, g)
        l1 = loss_fn(p1)
        assert float(l1) < float(l0)
