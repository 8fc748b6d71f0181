"""Manifest, transforms, tabular loaders, splits, and the input pipeline."""

import numpy as np
import pytest

from multimodal_ad_tpu.data.adni import ADNIManifest, TASK_GROUPS
from multimodal_ad_tpu.data.pipeline import VolumeBatcher, device_prefetch
from multimodal_ad_tpu.data.splits import stratified_kfold, stratified_test_split
from multimodal_ad_tpu.data.tabular import (load_adni_data_binary,
                                            load_adni_data_quadclass,
                                            load_adni_table)
from multimodal_ad_tpu.data.transforms import (VolumeTransform, adaptive_normal,
                                               make_transforms, scale_intensity)


class TestManifest:
    def test_task_label_order(self, adni_dir):
        """ADCN task gives AD=0, CN=1 (reference datasets/ADNI.py:67-87)."""
        m = ADNIManifest(adni_dir["label_file"], adni_dir["mri_dir"], "ADCN",
                         verbose=False)
        assert m.label_dict == {"AD": 0, "CN": 1}
        assert len(m) == 12
        ad = [d for d in m.data_dict if d["Subject"].startswith("AD")]
        assert all(d["label"] == 0 for d in ad)

    def test_record_schema(self, adni_dir):
        m = ADNIManifest(adni_dir["label_file"], adni_dir["mri_dir"], "ADCN",
                         verbose=False)
        rec = m[0]
        assert set(rec) == {"MRI", "label", "Subject"}
        assert rec["MRI"].endswith(f"{rec['Subject']}.nii")

    def test_unsupported_task(self, adni_dir):
        with pytest.raises(ValueError):
            ADNIManifest(adni_dir["label_file"], adni_dir["mri_dir"], "NOPE")

    def test_all_task_mappings(self):
        assert TASK_GROUPS["ADCNSMCIPMCI"] == ["CN", "SMCI", "PMCI", "AD"]
        assert TASK_GROUPS["SMCIPMCI"] == ["SMCI", "PMCI"]


class TestTransforms:
    def test_scale_intensity_range(self, rng):
        v = rng.normal(10, 5, (8, 9, 10)).astype(np.float32)
        out = scale_intensity(v)
        assert out.min() == 0.0 and out.max() == 1.0

    def test_adaptive_normal_matches_reference_semantics(self, rng):
        """Port of the algorithm in reference datasets/AdaptiveNormal.py:20-51,
        checked against a direct torch transcription."""
        import torch

        v = np.abs(rng.normal(100, 30, (12, 13, 14))).astype(np.float32)
        v[0, 0, 0] = -5.0  # negative voxel must be excluded from percentiles

        def torch_ref(img):
            t = torch.from_numpy(img.copy())
            pix = t[t >= 0]
            pix, _ = torch.sort(pix)
            n = len(pix)

            def pick(p):
                # exact transcription: int(round(n-1) * p + 0.5)
                i = int(round(n - 1) * p + 0.5)
                return pix[min(max(i, 0), n - 1)]

            lo, hi = pick(0.001), pick(0.999)
            mean, std = (hi + lo) / 2.0, (hi - lo) / 2.0
            out = (t - mean) / std
            return torch.clamp(out, -1, 1).numpy()

        np.testing.assert_allclose(adaptive_normal(v), torch_ref(v),
                                   rtol=1e-5, atol=1e-5)

    def test_augment_changes_volume_deterministically(self, rng):
        v = rng.normal(size=(16, 16, 16)).astype(np.float32)
        tf = VolumeTransform(augment=True, seed=7)
        a = tf(v, sample_idx=3)
        b = tf(v, sample_idx=3)
        np.testing.assert_array_equal(a, b)  # same (epoch, idx) -> same aug
        assert a.shape == (16, 16, 16, 1)

    def test_augment_rerandomizes_per_epoch(self, rng):
        """MONAI Rand* transforms draw fresh randomness every epoch
        (reference datasets/ADNI.py:152-158); seeding on sample alone froze
        augmentation into a fixed dataset perturbation (round-1 bug)."""
        v = rng.normal(size=(16, 16, 16)).astype(np.float32)
        tf = VolumeTransform(augment=True, seed=7)
        diff = 0
        for idx in range(10):
            a = tf(v, sample_idx=idx, epoch=0)
            b = tf(v, sample_idx=idx, epoch=1)
            diff += int(not np.array_equal(a, b))
        # each of flip/rotate/zoom fires with p=0.3 per epoch; over 10
        # samples at least one must get a different draw across epochs
        assert diff > 0

    def test_eval_transform_is_deterministic_and_clean(self, rng):
        """Unlike the reference's augment-leak bug (SURVEY.md §8.3), the
        eval transform never augments."""
        v = rng.normal(size=(10, 10, 10)).astype(np.float32)
        _, tf_eval = make_transforms(augment=True)
        np.testing.assert_array_equal(tf_eval(v, 0), tf_eval(v, 1))
        np.testing.assert_allclose(tf_eval(v, 0)[..., 0], scale_intensity(v))


class TestTabular:
    def test_binary_loader(self, clinical_table):
        X, y = load_adni_data_binary(clinical_table, start_col=14)
        assert X.dtype == np.float32 and y.dtype == np.int64
        assert set(np.unique(y)) <= {0, 1}
        # CN=0, AD=1 per reference tabel_loader.py:8-10
        assert X.shape[1] > 0

    def test_quadclass_loader(self, clinical_table):
        X, y = load_adni_data_quadclass(clinical_table, start_col=14)
        assert set(np.unique(y)) == {0, 1, 2, 3}

    def test_start_col_excludes_label(self, clinical_table):
        X, y, cols = load_adni_table(clinical_table, classes=["CN", "AD"])
        assert "Group" not in cols

    def test_categorical_encoding(self, clinical_table):
        X, y, cols = load_adni_table(clinical_table, classes=["CN", "AD"])
        assert np.isfinite(X).all()  # categoricals became integer codes


class TestSplits:
    def test_split_is_stratified_and_seeded(self, adni_dir):
        m = ADNIManifest(adni_dir["label_file"], adni_dir["mri_dir"], "ADCN",
                         verbose=False)
        a1, b1 = stratified_test_split(m.data_dict, 1 / 3, 42)
        a2, b2 = stratified_test_split(m.data_dict, 1 / 3, 42)
        assert [d["Subject"] for d in b1] == [d["Subject"] for d in b2]
        labels = [d["label"] for d in b1]
        assert labels.count(0) == labels.count(1)

    def test_kfold_partitions(self, adni_dir):
        m = ADNIManifest(adni_dir["label_file"], adni_dir["mri_dir"], "ADCN",
                         verbose=False)
        seen = []
        for fold, tr, vl in stratified_kfold(m.data_dict, 3, 42):
            assert len(tr) + len(vl) == len(m)
            seen.extend(d["Subject"] for d in vl)
        assert sorted(seen) == sorted(d["Subject"] for d in m.data_dict)


class TestPipeline:
    def test_batcher_shapes_and_padding(self, adni_dir):
        m = ADNIManifest(adni_dir["label_file"], adni_dir["mri_dir"], "ADCN",
                         verbose=False)
        tf = VolumeTransform(augment=False)
        b = VolumeBatcher(m.data_dict[:5], tf, batch_size=4)
        batches = list(b)
        assert len(batches) == 2
        for batch in batches:
            assert batch["image"].shape == (4, *adni_dir["shape"], 1)
            assert batch["label"].shape == (4,)
            assert batch["mask"].shape == (4,)
        assert batches[0]["mask"].sum() == 4
        assert batches[1]["mask"].sum() == 1  # 5th sample + 3 pad rows

    def test_padding_rows_are_real_diverse_samples(self, adni_dir):
        """Ragged-batch padding cycles REAL samples from the epoch order so
        unmasked BatchNorm batch statistics aren't biased toward k copies of
        one row (round-1 advisor finding)."""
        m = ADNIManifest(adni_dir["label_file"], adni_dir["mri_dir"], "ADCN",
                         verbose=False)
        tf = VolumeTransform(augment=False)
        b = VolumeBatcher(m.data_dict[:5], tf, batch_size=4)
        first, last = list(b)
        # pad rows of the final batch are samples 0,1,2 of this epoch's order
        np.testing.assert_array_equal(last["image"][1:], first["image"][:3])
        assert len(last["subject"]) == 1  # subjects list stays real-only
        # pad rows are mutually distinct volumes, not one row repeated
        assert not np.array_equal(last["image"][1], last["image"][2])

    def test_batcher_augment_differs_across_epochs(self, adni_dir):
        m = ADNIManifest(adni_dir["label_file"], adni_dir["mri_dir"], "ADCN",
                         verbose=False)
        tf = VolumeTransform(augment=True, seed=7)
        b = VolumeBatcher(m.data_dict[:8], tf, batch_size=8)
        e1 = next(iter(b))["image"]
        e2 = next(iter(b))["image"]
        assert not np.array_equal(e1, e2)  # fresh augmentation per epoch

    def test_batcher_shuffle_is_epoch_dependent(self, adni_dir):
        m = ADNIManifest(adni_dir["label_file"], adni_dir["mri_dir"], "ADCN",
                         verbose=False)
        tf = VolumeTransform(augment=False)
        b = VolumeBatcher(m.data_dict, tf, batch_size=4, shuffle=True, seed=1)
        e1 = [s for batch in b for s in batch["subject"]]
        e2 = [s for batch in b for s in batch["subject"]]
        assert sorted(e1) == sorted(e2)
        assert e1 != e2  # reshuffled across epochs

    def test_device_prefetch_sharding(self, adni_dir, mesh8):
        import jax

        m = ADNIManifest(adni_dir["label_file"], adni_dir["mri_dir"], "ADCN",
                         verbose=False)
        tf = VolumeTransform(augment=False)
        b = VolumeBatcher(m.data_dict[:8], tf, batch_size=8)
        n = 0
        for batch in device_prefetch(iter(b), mesh8, depth=2):
            assert isinstance(batch["image"], jax.Array)
            assert len(batch["image"].sharding.device_set) == mesh8.size
            n += 1
        assert n == 1

    def test_prefetch_propagates_errors(self, mesh8):
        def bad():
            yield {"image": np.zeros((8, 2))}
            raise RuntimeError("decode failed")

        with pytest.raises(RuntimeError, match="decode failed"):
            list(device_prefetch(bad(), mesh8))
