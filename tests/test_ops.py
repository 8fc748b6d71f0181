"""Device ops: ROI pooling (XLA + Pallas-interpret) and normalization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_ad_tpu.data.synthetic import make_atlas
from multimodal_ad_tpu.data.transforms import adaptive_normal as host_adaptive
from multimodal_ad_tpu.data.transforms import scale_intensity as host_scale
from multimodal_ad_tpu.ops.normalize import adaptive_normal as dev_adaptive
from multimodal_ad_tpu.ops.normalize import scale_intensity as dev_scale
from multimodal_ad_tpu.ops.roi_pool import (roi_counts, roi_pool_pallas,
                                            roi_pool_xla)


def reference_roi_pool_dense(feats, labels, num_rois):
    """Direct NumPy transcription of the reference's dense broadcast
    reduction (image_features.py:111-114), as the golden model."""
    b, x, y, z, c = feats.shape
    onehot = np.stack([(labels == r).astype(np.float32)
                       for r in range(1, num_rois + 1)])  # (R, X, Y, Z)
    num = (feats[:, None] * onehot[None, :, :, :, :, None]).sum(axis=(2, 3, 4))
    den = onehot.sum(axis=(1, 2, 3)).clip(1e-6)
    return num / den[None, :, None]


@pytest.fixture(scope="module")
def roi_case():
    rng = np.random.default_rng(0)
    shape = (12, 14, 12)
    labels = make_atlas(shape, n_rois=5, seed=1)
    feats = rng.normal(size=(2, *shape, 8)).astype(np.float32)
    return feats, labels, 5


class TestRoiPool:
    def test_xla_matches_reference_dense(self, roi_case):
        feats, labels, r = roi_case
        ours = np.asarray(roi_pool_xla(jnp.asarray(feats), jnp.asarray(labels), r))
        golden = reference_roi_pool_dense(feats, labels, r)
        np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)

    def test_pallas_interpret_matches_xla(self, roi_case):
        feats, labels, r = roi_case
        a = np.asarray(roi_pool_xla(jnp.asarray(feats), jnp.asarray(labels), r))
        b = np.asarray(roi_pool_pallas(jnp.asarray(feats), jnp.asarray(labels),
                                       r, tile_n=512, interpret=True))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_empty_roi_clamped(self):
        """An ROI id with zero voxels divides by the 1e-6 clamp, not zero
        (reference image_features.py:113)."""
        labels = np.ones((4, 4, 4), np.int32)  # only ROI 1 present
        feats = np.ones((1, 4, 4, 4, 2), np.float32)
        out = np.asarray(roi_pool_xla(jnp.asarray(feats), jnp.asarray(labels), 3))
        assert np.isfinite(out).all()
        np.testing.assert_allclose(out[0, 0], 1.0, rtol=1e-5)
        np.testing.assert_allclose(out[0, 1:], 0.0)

    def test_counts(self):
        labels = np.array([[[0, 1], [1, 2]], [[2, 2], [3, 0]]], np.int32)
        counts = np.asarray(roi_counts(jnp.asarray(labels), 4))
        np.testing.assert_array_equal(counts, [2, 3, 1, 0])

    def test_flat_input_accepted(self, roi_case):
        feats, labels, r = roi_case
        b, x, y, z, c = feats.shape
        flat = feats.reshape(b, -1, c)
        a = np.asarray(roi_pool_xla(jnp.asarray(feats), jnp.asarray(labels), r))
        bb = np.asarray(roi_pool_xla(jnp.asarray(flat), jnp.asarray(labels), r))
        np.testing.assert_allclose(a, bb, rtol=1e-6)


class TestDeviceNormalize:
    def test_scale_intensity_matches_host(self, rng):
        vols = rng.normal(20, 7, size=(3, 9, 10, 8)).astype(np.float32)
        dev = np.asarray(dev_scale(jnp.asarray(vols[..., None])))[..., 0]
        host = np.stack([host_scale(v) for v in vols])
        np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-6)

    def test_scale_intensity_int16_input(self, rng):
        vols = rng.integers(0, 4000, size=(2, 6, 7, 6, 1)).astype(np.int16)
        out = np.asarray(dev_scale(jnp.asarray(vols)))
        assert out.dtype == np.float32
        assert out.min() == 0.0 and out.max() == 1.0

    def test_adaptive_normal_matches_host(self, rng):
        vols = np.abs(rng.normal(100, 30, size=(3, 11, 9, 10))).astype(np.float32)
        vols[:, 0, 0, 0] = -3.0  # negatives excluded from percentile pick
        dev = np.asarray(dev_adaptive(jnp.asarray(vols[..., None])))[..., 0]
        host = np.stack([host_adaptive(v) for v in vols])
        np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)

    def test_constant_volume(self):
        vols = jnp.ones((1, 4, 4, 4, 1))
        assert np.isfinite(np.asarray(dev_scale(vols))).all()
        assert np.isfinite(np.asarray(dev_adaptive(vols))).all()


class TestFusedGatherNormalize:
    """Pallas fused gather+normalize (ops/fused_gather.py): interpret-mode
    parity against both the XLA twin and the production scale_intensity."""

    def test_parity_and_padding(self, rng):
        from multimodal_ad_tpu.ops.fused_gather import (
            flatten_corpus, gather_normalize_pallas, gather_normalize_xla)
        from multimodal_ad_tpu.ops.normalize import scale_intensity

        vols = rng.integers(-50, 4096, (5, 9, 11, 10, 1)).astype(np.int16)
        corpus, vox = flatten_corpus(vols)
        assert corpus.shape[2] == 128 and corpus.shape[1] * 128 >= vox
        idx = np.array([3, 0, 4, 4], np.int32)
        a = np.asarray(gather_normalize_xla(jnp.asarray(corpus), idx, vox))
        p = np.asarray(gather_normalize_pallas(jnp.asarray(corpus), idx, vox,
                                               interpret=True))
        np.testing.assert_allclose(a, p, atol=1e-6)
        # padding tail repeats the (scaled) first voxel — an in-volume
        # value, so min/max needed no mask; consumers read [:vox]
        np.testing.assert_allclose(
            p.reshape(4, -1)[:, vox:],
            np.broadcast_to(p.reshape(4, -1)[:, :1],
                            (4, p.reshape(4, -1).shape[1] - vox)),
            atol=1e-6)
        # matches the production normalizer on the unflattened batch
        ref = np.asarray(scale_intensity(jnp.asarray(vols[idx])))
        np.testing.assert_allclose(p.reshape(4, -1)[:, :vox],
                                   ref.reshape(4, -1), atol=1e-6)

    def test_constant_volume_is_zeroed(self):
        from multimodal_ad_tpu.ops.fused_gather import (
            flatten_corpus, gather_normalize_pallas)

        vols = np.full((2, 4, 4, 4, 1), 7, np.int16)
        corpus, vox = flatten_corpus(vols)
        p = np.asarray(gather_normalize_pallas(
            jnp.asarray(corpus), np.array([1], np.int32), vox,
            interpret=True))
        assert (p == 0).all()  # scale_intensity maps constant volumes to 0
