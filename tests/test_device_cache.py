"""HBM-resident dataset cache + device-resident training path."""

import numpy as np
import pytest

from multimodal_ad_tpu.data.device_cache import (DeviceDataset,
                                                 DeviceEpochIterator,
                                                 build_device_dataset)


class TestDeviceDataset:
    def test_gather(self, rng):
        vols = rng.normal(size=(10, 6, 6, 6, 1)).astype(np.float32)
        labels = np.arange(10) % 2
        ds = DeviceDataset(vols, labels)
        b = ds.gather(np.array([3, 7], np.int32))
        assert b["image"].shape == (2, 6, 6, 6, 1)
        np.testing.assert_array_equal(np.asarray(b["label"]), [1, 1])

    def test_int16_store_halves_bytes(self, rng):
        vols = rng.integers(0, 4000, size=(4, 6, 6, 6, 1)).astype(np.int16)
        ds = DeviceDataset(vols, np.zeros(4), store_dtype=np.int16)
        assert ds.volumes.dtype == np.int16

    def test_fused_norm_layout_roundtrip(self, rng):
        """fused_norm=True stores only the lane-aligned flat corpus view;
        gather must round-trip it exactly and gather_normalized must match
        ops.normalize.scale_intensity bit-for-bit (on CPU the fused path
        is the jitted XLA twin of the Pallas kernel)."""
        import jax
        import jax.numpy as jnp

        from multimodal_ad_tpu.ops.normalize import scale_intensity

        vols = rng.integers(-5, 4000, size=(6, 5, 7, 5, 1)).astype(np.int16)
        labels = np.arange(6) % 2
        ds0 = DeviceDataset(vols, labels)
        ds1 = DeviceDataset(vols, labels, fused_norm=True)
        idx = np.array([3, 0, 5, 3], np.int32)  # duplicates allowed
        np.testing.assert_array_equal(np.asarray(ds0.gather(idx)["image"]),
                                      np.asarray(ds1.gather(idx)["image"]))
        want = np.asarray(scale_intensity(ds0.gather(idx)["image"]))
        got = np.asarray(ds1.gather_normalized(idx)["image"])
        np.testing.assert_allclose(got, want, rtol=1e-6)
        # non-fused datasets expose the same API (plain gather+normalize)
        np.testing.assert_allclose(
            np.asarray(ds0.gather_normalized(idx)["image"]), want, rtol=1e-6)
        # bf16 output rounds only at the store
        bf = ds1.gather_normalized(idx, out_dtype=jnp.bfloat16)["image"]
        assert bf.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(bf, np.float32), want,
                                   atol=4e-3)
        # composes into jit (index-traced) like gather does
        f = jax.jit(lambda i: ds1.gather_normalized(i)["image"])
        np.testing.assert_allclose(np.asarray(f(idx)), want, rtol=1e-6)

    def test_uint8_quantized_store(self, rng):
        """quantize='uint8' halves the stored/wire bytes vs int16 and is
        invisible to the per-sample normalizer (affine invariance) up to
        the 1/255 rounding step."""
        from multimodal_ad_tpu.ops.normalize import scale_intensity

        vols = rng.integers(-7, 4000, size=(5, 6, 7, 6, 1)).astype(np.int16)
        labels = np.arange(5) % 2
        ds16 = DeviceDataset(vols, labels)
        dsq = DeviceDataset(vols, labels, quantize="uint8")
        assert dsq.volumes.dtype == np.uint8
        assert dsq.volumes.nbytes * 2 == ds16.volumes.nbytes
        idx = np.array([0, 4, 2], np.int32)
        want = np.asarray(scale_intensity(ds16.gather(idx)["image"]))
        got = np.asarray(scale_intensity(dsq.gather(idx)["image"]))
        assert np.abs(got - want).max() <= 1.1 / 255
        # the percentile normalizer also absorbs the map on NON-NEGATIVE
        # volumes (its nonneg filter sees every voxel either way)
        from multimodal_ad_tpu.ops.normalize import adaptive_normal

        pos = rng.integers(0, 4000, size=(4, 6, 7, 6, 1)).astype(np.int16)
        dp16 = DeviceDataset(pos, np.zeros(4))
        dpq = DeviceDataset(pos, np.zeros(4), quantize="uint8")
        pidx = np.array([0, 3], np.int32)
        a16 = np.asarray(adaptive_normal(dp16.gather(pidx)["image"]))
        aq = np.asarray(adaptive_normal(dpq.gather(pidx)["image"]))
        assert np.abs(aq - a16).max() <= 0.02  # rounding + percentile-pick
        # flat volume degrades to zeros, no divide-by-zero
        flat = np.full((1, 4, 4, 4, 1), 37, np.int16)
        dsf = DeviceDataset(flat, np.zeros(1), quantize="uint8")
        assert np.asarray(dsf.gather(np.array([0]))["image"]).max() == 0
        with pytest.raises(ValueError):
            DeviceDataset(vols, labels, quantize="uint8", fused_norm=True)
        with pytest.raises(ValueError):
            DeviceDataset(vols, labels, quantize="zstd")

    def test_epoch_iterator_padding_and_masks(self, rng):
        vols = rng.normal(size=(7, 6, 6, 6, 1)).astype(np.float32)
        ds = DeviceDataset(vols, np.arange(7) % 2)
        it = DeviceEpochIterator(ds, np.arange(7), batch_size=4)
        batches = list(it)
        assert len(batches) == 2
        assert np.asarray(batches[0]["mask"]).sum() == 4
        assert np.asarray(batches[1]["mask"]).sum() == 3
        assert batches[0]["image"].shape == (4, 6, 6, 6, 1)
        # normalization applied on device: per-sample [0, 1]
        img = np.asarray(batches[0]["image"])
        assert img.min() >= 0.0 and img.max() <= 1.0

    def test_epoch_iterator_reshuffles(self, rng):
        vols = rng.normal(size=(8, 4, 4, 4, 1)).astype(np.float32)
        ds = DeviceDataset(vols, np.arange(8))
        it = DeviceEpochIterator(ds, np.arange(8), batch_size=8, shuffle=True,
                                 seed=3)
        e1 = np.asarray(next(iter(it))["label"]).tolist()
        e2 = np.asarray(next(iter(it))["label"]).tolist()
        assert sorted(e1) == sorted(e2) == list(range(8))
        assert e1 != e2

    def test_build_from_manifest(self, adni_dir, mesh8):
        from multimodal_ad_tpu.data.adni import ADNIManifest

        m = ADNIManifest(adni_dir["label_file"], adni_dir["mri_dir"], "ADCN",
                         verbose=False)
        ds = build_device_dataset(m.data_dict[:4], mesh=mesh8,
                                  store_dtype=np.float32, num_threads=2)
        assert ds.n == 4
        assert ds.volumes.shape == (4, *adni_dir["shape"], 1)


@pytest.mark.slow
class TestHBMTraining:
    def test_cv_with_hbm_cache(self, adni_dir, tmp_path, mesh8):
        from multimodal_ad_tpu.core.config import Config
        from multimodal_ad_tpu.train.cv import train_cv

        cfg = Config(
            label_file=adni_dir["label_file"], mri_dir=adni_dir["mri_dir"],
            task="ADCN", num_epochs=2, batch_size=8, lr=1e-3, n_splits=2,
            model_depth=10, checkpoint_dir=str(tmp_path / "ckpt"),
            compute_dtype="float32", loader_threads=2, hbm_cache=True)
        results, ckpt_dir = train_cv(cfg, mesh=mesh8, verbose=False)
        assert 0.0 <= results["avg"]["ACC"] <= 1.0
        assert len(results["per_fold"]) == 2

    def test_hbm_matches_streaming_eval(self, adni_dir, mesh8):
        """Same model state must produce identical eval metrics through the
        HBM-resident and streaming input paths (normalization parity)."""
        import jax

        from multimodal_ad_tpu.data.adni import ADNIManifest
        from multimodal_ad_tpu.data.pipeline import VolumeBatcher
        from multimodal_ad_tpu.data.transforms import VolumeTransform
        from multimodal_ad_tpu.models.resnet3d import generate_model
        from multimodal_ad_tpu.parallel.mesh import replicate
        from multimodal_ad_tpu.train.cv import _run_epoch
        from multimodal_ad_tpu.train.loop import (create_train_state,
                                                  make_eval_step)
        import jax.numpy as jnp

        m = ADNIManifest(adni_dir["label_file"], adni_dir["mri_dir"], "ADCN",
                         verbose=False)
        recs = m.data_dict[:8]
        model = generate_model(model_depth=10, compute_dtype=jnp.float32)
        tf = VolumeTransform(augment=False)
        stream = VolumeBatcher(recs, tf, batch_size=8, num_threads=2)
        sample = next(iter(stream))
        state = create_train_state(model, jax.random.PRNGKey(0), sample,
                                   lambda e: 1e-3)
        state = replicate(state, mesh8)
        eval_step = make_eval_step()

        _, loss_s, m_s = _run_epoch(eval_step, state, stream, mesh8, train=False)

        ds = build_device_dataset(recs, mesh=mesh8, store_dtype=np.float32,
                                  num_threads=2)
        hbm = DeviceEpochIterator(ds, np.arange(8), batch_size=8)
        _, loss_h, m_h = _run_epoch(eval_step, state, hbm, mesh8, train=False)

        assert loss_s == pytest.approx(loss_h, rel=1e-4)
        assert m_s["ACC"] == m_h["ACC"]
        assert m_s["AUC"] == pytest.approx(m_h["AUC"], abs=1e-6)


class TestDeviceAugment:
    def test_flip_probability_semantics(self, rng):
        import jax
        import jax.numpy as jnp

        from multimodal_ad_tpu.ops.augment import random_flip

        x = jnp.asarray(rng.normal(size=(8, 4, 4, 4, 1)), jnp.float32)
        none = random_flip(x, jax.random.PRNGKey(0), prob=0.0)
        np.testing.assert_array_equal(np.asarray(none), np.asarray(x))
        allf = random_flip(x, jax.random.PRNGKey(0), prob=1.0)
        np.testing.assert_array_equal(np.asarray(allf),
                                      np.asarray(jnp.flip(x, axis=1)))

    def test_augmented_iterator_varies_but_masks_hold(self, rng):
        vols = rng.normal(size=(8, 6, 6, 6, 1)).astype(np.float32)
        ds = DeviceDataset(vols, np.arange(8) % 2)
        it_a = DeviceEpochIterator(ds, np.arange(8), batch_size=8,
                                   augment=True, seed=1, flip_prob=1.0)
        it_p = DeviceEpochIterator(ds, np.arange(8), batch_size=8,
                                   augment=False)
        a = np.asarray(next(iter(it_a))["image"])
        p = np.asarray(next(iter(it_p))["image"])
        assert not np.allclose(a, p)  # flips applied
        # labels/masks unaffected
        np.testing.assert_array_equal(
            np.asarray(next(iter(it_a))["label"]),
            np.asarray(next(iter(it_p))["label"]))

    def test_rotate_matches_host_numerics(self, rng):
        """Device rotate (zoom=1) must reproduce the host _rotate_x
        geometry exactly — same inverse-rotation formula, same clamping."""
        import jax.numpy as jnp

        from multimodal_ad_tpu.data.transforms import _rotate_x
        from multimodal_ad_tpu.ops.augment import rotate_zoom_volume

        v = rng.normal(size=(7, 9, 8)).astype(np.float32)
        for angle in (0.0, 0.05, -0.04):
            dev = np.asarray(rotate_zoom_volume(
                jnp.asarray(v[..., None]), jnp.float32(angle),
                jnp.float32(1.0)))[..., 0]
            host = _rotate_x(v, angle)
            np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)

    def test_zoom_matches_host_numerics(self, rng):
        import jax.numpy as jnp

        from multimodal_ad_tpu.data.transforms import rand_zoom
        from multimodal_ad_tpu.ops.augment import rotate_zoom_volume

        v = rng.normal(size=(7, 9, 8)).astype(np.float32)

        class _Always:
            def random(self):
                return 0.0  # force-apply

            def uniform(self, lo, hi):
                return 0.96

        host = rand_zoom(v, _Always(), prob=0.3)
        dev = np.asarray(rotate_zoom_volume(
            jnp.asarray(v[..., None]), jnp.float32(0.0),
            jnp.float32(0.96)))[..., 0]
        np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-5)

    def test_random_rotate_zoom_identity_when_disabled(self, rng):
        import jax
        import jax.numpy as jnp

        from multimodal_ad_tpu.ops.augment import random_rotate_zoom

        x = jnp.asarray(rng.normal(size=(4, 6, 6, 6, 1)), jnp.float32)
        out = random_rotate_zoom(x, jax.random.PRNGKey(0), rotate_prob=0.0,
                                 zoom_prob=0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   rtol=1e-6, atol=1e-6)
        out2 = random_rotate_zoom(x, jax.random.PRNGKey(0), rotate_prob=1.0,
                                  zoom_prob=1.0, min_zoom=0.9, max_zoom=0.95)
        assert not np.allclose(np.asarray(out2), np.asarray(x))

    def test_intensity_jitter_bounded(self, rng):
        import jax
        import jax.numpy as jnp

        from multimodal_ad_tpu.ops.augment import random_intensity_scale

        x = jnp.ones((4, 3, 3, 3, 1))
        out = np.asarray(random_intensity_scale(x, jax.random.PRNGKey(1),
                                                prob=1.0, factor=0.1))
        assert (out >= 0.9 - 1e-6).all() and (out <= 1.1 + 1e-6).all()
