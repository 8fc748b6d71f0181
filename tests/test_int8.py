"""Post-training int8 inference path (models/resnet3d_int8.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_ad_tpu.models.resnet3d import ResNet3D
from multimodal_ad_tpu.models.resnet3d_int8 import (calibrate_int8,
                                                    export_int8,
                                                    resnet3d_folded_apply,
                                                    resnet3d_int8_apply)


def _trained_like_model(depth=10, shortcut="B", shape=(24, 28, 24), seed=0):
    """Init a model and push a few train-mode batches through so the
    BatchNorm running statistics are realistic (not the 0/1 init)."""
    model = ResNet3D(depth=depth, num_classes=2, shortcut_type=shortcut,
                     dropout_rate=0.0)
    rng = np.random.default_rng(seed)
    x0 = jnp.asarray(rng.normal(size=(2, *shape, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), x0, train=False)
    state = {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}
    for i in range(3):
        xb = jnp.asarray(rng.normal(size=(2, *shape, 1)) + 0.2 * i,
                         jnp.float32)
        _, upd = model.apply(state, xb, train=True,
                             rngs={"dropout": jax.random.PRNGKey(i)},
                             mutable=["batch_stats"])
        state["batch_stats"] = upd["batch_stats"]
    return model, state, shape


class TestInt8Export:
    @pytest.mark.slow  # ~30s on the 1-CPU box (two big-graph compiles)
    def test_folded_forward_matches_eval_mode(self):
        """BN folding + topology: the folded fp graph reproduces the flax
        eval-mode forward (bf16-level tolerance). The fast-tier smoke for
        this property is test_shortcut_a_variant (smaller graphs)."""
        model, state, shape = _trained_like_model()
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(3, *shape, 1)), jnp.float32)
        ref = np.asarray(model.apply(state, x, train=False), np.float32)
        qp = export_int8(state, depth=10)
        fold = np.asarray(resnet3d_folded_apply(qp, x), np.float32)
        assert ref.shape == fold.shape == (3, 2)
        np.testing.assert_allclose(fold, ref, atol=0.15, rtol=0.05)

    @pytest.mark.slow  # ~14s on the 1-CPU box
    def test_int8_logits_track_fp(self):
        """Quantized logits stay close to fp and agree on argmax."""
        model, state, shape = _trained_like_model(seed=3)
        rng = np.random.default_rng(2)
        cal = [jnp.asarray(rng.normal(size=(2, *shape, 1)), jnp.float32)
               for _ in range(2)]
        qp = export_int8(state, depth=10)
        scales = calibrate_int8(qp, cal)
        assert all(s > 0 for s in scales.values())
        x = jnp.asarray(rng.normal(size=(4, *shape, 1)), jnp.float32)
        fp = np.asarray(model.apply(state, x, train=False), np.float32)
        q8 = np.asarray(resnet3d_int8_apply(qp, scales, x), np.float32)
        # logit error small relative to the logit spread
        spread = np.abs(fp).max() + 1e-6
        assert np.abs(q8 - fp).max() / spread < 0.25, (fp, q8)
        assert (q8.argmax(1) == fp.argmax(1)).mean() >= 0.75

    @pytest.mark.slow  # two graph compiles ~27s on the 1-CPU box
    def test_shortcut_a_variant(self):
        """Shortcut-A (parameter-free) blocks export and run."""
        model, state, shape = _trained_like_model(shortcut="A", seed=5)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(2, *shape, 1)), jnp.float32)
        qp = export_int8(state, depth=10, shortcut_type="A")
        assert any(b["down"] == "A" for b in qp["blocks"])
        ref = np.asarray(model.apply(state, x, train=False), np.float32)
        fold = np.asarray(resnet3d_folded_apply(qp, x), np.float32)
        np.testing.assert_allclose(fold, ref, atol=0.15, rtol=0.05)

    @pytest.mark.slow  # depth-50 has 16 Bottleneck blocks: big CPU compile
    def test_bottleneck_folded_forward(self):
        """Bottleneck export (1^3 -> 3^3 -> 1^3 + downsample at ConvBN_3):
        the folded graph reproduces the flax eval-mode forward."""
        model, state, shape = _trained_like_model(depth=50, seed=9,
                                                  shape=(16, 20, 16))
        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(size=(2, *shape, 1)), jnp.float32)
        qp = export_int8(state, depth=50)
        assert all(b["kind"] == "bottleneck" for b in qp["blocks"])
        assert "conv3" in qp["blocks"][0]
        ref = np.asarray(model.apply(state, x, train=False), np.float32)
        fold = np.asarray(resnet3d_folded_apply(qp, x), np.float32)
        np.testing.assert_allclose(fold, ref, atol=0.2, rtol=0.05)
        # the quantized bottleneck graph runs and tracks fp
        cal = [jnp.asarray(rng.normal(size=(2, *shape, 1)), jnp.float32)]
        scales = calibrate_int8(qp, cal)
        q8 = np.asarray(resnet3d_int8_apply(qp, scales, x), np.float32)
        spread = np.abs(ref).max() + 1e-6
        assert np.abs(q8 - ref).max() / spread < 0.3, (ref, q8)

    @pytest.mark.slow  # export + calibrate + 2 quantized graphs (~45s)
    def test_save_load_roundtrip(self, tmp_path):
        """save_int8/load_int8: the reloaded artifact produces IDENTICAL
        int8 logits (the graph is fully determined by the saved tensors),
        and the artifact is much smaller than the fp parameters."""
        import os

        from multimodal_ad_tpu.models.resnet3d_int8 import (load_int8,
                                                            save_int8)

        model, state, shape = _trained_like_model(seed=11)
        rng = np.random.default_rng(10)
        cal = [jnp.asarray(rng.normal(size=(2, *shape, 1)), jnp.float32)]
        qp = export_int8(state, depth=10)
        scales = calibrate_int8(qp, cal)
        x = jnp.asarray(rng.normal(size=(3, *shape, 1)), jnp.float32)
        ref = np.asarray(resnet3d_int8_apply(qp, scales, x))

        path = save_int8(str(tmp_path / "model_int8.npz"), qp, scales)
        qp2, scales2 = load_int8(path)
        assert scales2 == scales
        out = np.asarray(resnet3d_int8_apply(qp2, scales2, x))
        np.testing.assert_array_equal(out, ref)
        # int8 artifact beats the fp param footprint by ~4x
        fp_bytes = sum(a.size * 4 for a in
                       jax.tree_util.tree_leaves(state["params"]))
        assert os.path.getsize(path) < fp_bytes / 2

    def test_weight_quantization_is_per_channel(self):
        # export_int8 is pure numpy over the state values: an eval_shape'd
        # param tree filled with host randoms is enough here (no compile, no
        # eager init forward), keeping this the family's fast-tier smoke.
        # Positive fills keep the BN fold's sqrt(var+eps) real.
        model = ResNet3D(depth=10, num_classes=2, dropout_rate=0.0)
        rng = np.random.default_rng(7)
        x0 = jnp.zeros((1, 16, 16, 16, 1), jnp.float32)
        shapes = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(7), x0, train=False))
        variables = jax.tree_util.tree_map(
            lambda s: (rng.random(s.shape, np.float32) + 0.1).astype(s.dtype),
            shapes)
        state = {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
        qp = export_int8(state, depth=10)
        blk = qp["blocks"][0]
        assert blk["conv1"]["wq"].dtype == np.int8
        C = blk["conv1"]["wq"].shape[-1]
        assert blk["conv1"]["s"].shape == (C,)
        # every channel uses the full int8 range (per-channel, not global)
        assert (np.abs(blk["conv1"]["wq"]).max(axis=(0, 1, 2, 3)) == 127).all()
