"""Multi-scale hypergraph forecaster (MSHyper rebuild)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_ad_tpu.models.hypergraph import (MSHyperModel,
                                                 build_pyramid_incidence,
                                                 build_pyramid_sizes,
                                                 hypergraph_conv)


class TestIncidence:
    def test_pyramid_sizes(self):
        assert build_pyramid_sizes(16, (4, 4)) == [16, 4, 1]

    def test_incidence_structure(self):
        H = build_pyramid_incidence(8, (2,), inner_size=2)
        n = 8 + 4
        assert H.shape[0] == n
        # every node belongs to at least one hyperedge
        assert (H.sum(axis=1) >= 1).all()
        # inter-scale edges connect 1 coarse + 2 fine nodes
        sizes = H.sum(axis=0)
        assert sizes.max() <= 3

    def test_conv_degree_normalization(self):
        """A constant node signal stays constant through the two-pass
        degree-normalized conv (mean-of-means property)."""
        H = jnp.asarray(build_pyramid_incidence(6, (2,), inner_size=2))
        x = jnp.ones((1, H.shape[0], 4)) * 5.0
        out = hypergraph_conv(x, H)
        np.testing.assert_allclose(np.asarray(out), 5.0, rtol=1e-5)

    def test_conv_shapes(self):
        H = jnp.asarray(build_pyramid_incidence(8, (2,)))
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, H.shape[0], 3)), jnp.float32)
        out = hypergraph_conv(x, H)
        assert out.shape == x.shape


class TestMSHyper:
    def test_forecast_shapes(self):
        # shape-only via eval_shape (the attention variant's compile is
        # ~11s on 1 CPU); numerics run fast in test_instance_norm_denorm
        # and with attention in the slow test_learns_persistence
        model = MSHyperModel(seq_len=16, pred_len=4, channels=3, d_model=16)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 3)),
                        jnp.float32)
        variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
        out = jax.eval_shape(model.apply, variables, x)
        assert out.shape == (2, 4, 3)

    def test_instance_norm_denorm(self):
        """Scaling the input scales the forecast (instance-norm round trip)."""
        model = MSHyperModel(seq_len=16, pred_len=4, channels=2, d_model=16,
                             use_attention=False)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 16, 2)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x)
        y1 = model.apply(variables, x)
        y2 = model.apply(variables, x * 10.0)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y1) * 10.0,
                                   rtol=1e-3, atol=1e-3)

    @pytest.mark.slow
    def test_learns_persistence(self):
        """A few gradient steps reduce forecasting loss on an AR(1) task."""
        import optax

        model = MSHyperModel(seq_len=16, pred_len=4, channels=1, d_model=8,
                             window_sizes=(4,), use_attention=False)
        rng = np.random.default_rng(2)
        series = np.cumsum(rng.normal(size=(8, 20, 1)), axis=1).astype(np.float32)
        x, y = jnp.asarray(series[:, :16]), jnp.asarray(series[:, 16:])
        variables = model.init(jax.random.PRNGKey(0), x)

        def loss_fn(v):
            return jnp.mean((model.apply(v, x) - y) ** 2)

        tx = optax.adam(1e-2)
        opt = tx.init(variables)
        l0 = float(loss_fn(variables))
        for _ in range(20):
            g = jax.grad(loss_fn)(variables)
            upd, opt = tx.update(g, opt)
            variables = optax.apply_updates(variables, upd)
        assert float(loss_fn(variables)) < l0
