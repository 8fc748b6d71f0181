"""DAFT image+tabular fusion network."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_ad_tpu.models.daft import DAFTBlock, DAFTResNet


def init_apply(model, *args, train=False):
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)}, *args,
                           train=False)
    out = model.apply(variables, *args, train=train,
                      mutable=["batch_stats"] if train else False,
                      rngs={"dropout": jax.random.PRNGKey(2)} if train else None)
    return out, variables


class TestDAFT:
    @pytest.mark.slow
    def test_logits_shape(self):
        model = DAFTResNet(num_classes=2, dtype=jnp.float32)
        img = jnp.zeros((2, 16, 20, 16, 1))
        tab = jnp.zeros((2, 9))
        out, _ = init_apply(model, img, tab)
        assert out.shape == (2, 2)

    @pytest.mark.slow  # full-model compile ~27s on the 1-CPU box; the fast
    def test_table_modulates_output(self):  # smoke is the identity test below
        """Different tabular vectors must change the prediction (the whole
        point of the affine conditioning)."""
        model = DAFTResNet(num_classes=2, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.normal(size=(1, 16, 16, 16, 1)), jnp.float32)
        t1 = jnp.zeros((1, 5))
        t2 = jnp.ones((1, 5)) * 3.0
        variables = model.init({"params": jax.random.PRNGKey(0)}, img, t1,
                               train=False)
        o1 = model.apply(variables, img, t1, train=False)
        o2 = model.apply(variables, img, t2, train=False)
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_daft_block_identity_at_zero_aux(self):
        """With aux weights zeroed, scale=1/shift=0 -> plain residual block."""
        block = DAFTBlock(planes=8, dtype=jnp.float32)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 8, 8)), jnp.float32)
        tab = jnp.asarray(rng.normal(size=(1, 4)), jnp.float32)
        variables = block.init({"params": jax.random.PRNGKey(0)}, x, tab,
                               train=False)
        p = jax.tree_util.tree_map(np.array, variables["params"])
        p["aux_out"]["kernel"][:] = 0.0
        p["aux_out"]["bias"][:] = 0.0
        v0 = {"params": p, "batch_stats": variables["batch_stats"]}
        out_zero = block.apply(v0, x, tab, train=False)
        out_other_tab = block.apply(v0, x, tab * 100, train=False)
        np.testing.assert_allclose(np.asarray(out_zero),
                                   np.asarray(out_other_tab), atol=1e-6)

    @pytest.mark.slow
    def test_trains(self):
        import optax

        model = DAFTResNet(num_classes=2, dtype=jnp.float32, dropout_rate=0.0)
        rng = np.random.default_rng(2)
        img = jnp.asarray(rng.normal(size=(4, 16, 16, 16, 1)), jnp.float32)
        tab = jnp.asarray(rng.normal(size=(4, 6)), jnp.float32)
        y = jnp.asarray([0, 1, 0, 1])
        tab = tab + 2.0 * y[:, None]
        variables = model.init({"params": jax.random.PRNGKey(0)}, img, tab,
                               train=False)
        params, bs = variables["params"], variables["batch_stats"]

        def loss_fn(p):
            logits, _ = model.apply({"params": p, "batch_stats": bs}, img,
                                    tab, train=True, mutable=["batch_stats"],
                                    rngs={"dropout": jax.random.PRNGKey(3)})
            return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

        l0, g = jax.value_and_grad(loss_fn)(params)
        p1 = jax.tree_util.tree_map(lambda a, b: a - 0.05 * b, params, g)
        assert float(loss_fn(p1)) < float(l0)
