"""Multimodal fusion training (MRI + PET + table)."""

import os

import numpy as np
import pytest

from multimodal_ad_tpu.core.config import Config
from multimodal_ad_tpu.data.adni import ADNIManifest
from multimodal_ad_tpu.data.pipeline import VolumeBatcher
from multimodal_ad_tpu.data.synthetic import make_adni_dir
from multimodal_ad_tpu.data.transforms import VolumeTransform
from multimodal_ad_tpu.train.fusion import embed_table_per_fold, train_fusion_cv

SHAPE = (16, 16, 16)


@pytest.fixture(scope="module")
def fusion_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fusion"))
    csv_path, mri_dir, pet_dir = make_adni_dir(
        root, n_per_class=6, classes=("AD", "CN"), shape=SHAPE, seed=5,
        pet=True)
    return {"label_file": csv_path, "mri_dir": mri_dir, "pet_dir": pet_dir}


def table_for(manifest):
    rng = np.random.default_rng(0)
    subjects = [r["Subject"] for r in manifest.data_dict]
    y = np.asarray([r["label"] for r in manifest.data_dict])
    X = (rng.normal(size=(len(subjects), 6)) + 1.5 * y[:, None]).astype(np.float32)
    return X, y, subjects


class TestMultimodalBatcher:
    def test_pet_and_table_keys(self, fusion_dir):
        m = ADNIManifest(fusion_dir["label_file"], fusion_dir["mri_dir"],
                         "ADCN", pet_dir=fusion_dir["pet_dir"], verbose=False)
        assert "PET" in m.data_dict[0]
        table = {r["Subject"]: np.full(4, r["label"], np.float32)
                 for r in m.data_dict}
        b = VolumeBatcher(m.data_dict[:4], VolumeTransform(),
                          batch_size=4, image_keys=("MRI", "PET"),
                          table_lookup=table, num_threads=2)
        batch = next(iter(b))
        assert batch["image"].shape == (4, *SHAPE, 1)
        assert batch["pet"].shape == (4, *SHAPE, 1)
        assert batch["table"].shape == (4, 4)
        np.testing.assert_array_equal(batch["table"][:, 0], batch["label"])


class TestTableEmbedding:
    def test_fold_embedding_no_crash_and_shape(self):
        from sklearn.linear_model import LogisticRegression

        class LogRegEmbedder(LogisticRegression):
            def get_embeddings(self, X, data_source="test"):
                return self.predict_proba(X)[None]

        rng = np.random.default_rng(0)
        subjects = [f"S{i}" for i in range(20)]
        X = rng.normal(size=(20, 5)).astype(np.float32)
        y = (np.arange(20) % 2)
        lut = embed_table_per_fold(X, y, subjects, subjects[:12],
                                   embedder=LogRegEmbedder(max_iter=200))
        assert set(lut) == set(subjects)
        assert lut["S0"].shape == (2,)


@pytest.mark.slow
class TestFusionTraining:
    def test_mri_pet_table_cv(self, fusion_dir, tmp_path, mesh8):
        from sklearn.linear_model import LogisticRegression

        class LogRegEmbedder(LogisticRegression):
            def get_embeddings(self, X, data_source="test"):
                return self.predict_proba(X)[None]

        m = ADNIManifest(fusion_dir["label_file"], fusion_dir["mri_dir"],
                         "ADCN", pet_dir=fusion_dir["pet_dir"], verbose=False)
        table_data = table_for(m)
        cfg = Config(
            label_file=fusion_dir["label_file"], mri_dir=fusion_dir["mri_dir"],
            pet_dir=fusion_dir["pet_dir"], task="ADCN", num_epochs=2,
            batch_size=8, lr=1e-3, n_splits=2,
            checkpoint_dir=str(tmp_path / "ckpt"), compute_dtype="float32",
            loader_threads=2)
        best, ckpt_dir = train_fusion_cv(
            cfg, use_pet=True, use_table=True, table_data=table_data,
            model_kw=dict(dim=16, depth=1, heads=2, dim_head=8, mlp_dim=32),
            records=m.data_dict, mesh=mesh8,
            embedder=LogRegEmbedder(max_iter=200), verbose=False)
        assert len(best) == 2
        assert all(np.isfinite(b) for b in best)
        assert os.path.isdir(os.path.join(ckpt_dir, "fusion_best_fold1"))
        assert os.path.isfile(os.path.join(ckpt_dir, "fusion_results.csv"))


@pytest.mark.slow
class TestFusionLearning:
    def test_fusion_learns_separable_modalities(self, tmp_path):
        """Learning proof for the multimodal path (the image-only twin lives
        in tests/test_learning.py): on statistically separable MRI+PET
        volumes plus a separable clinical table, the cross-transformer
        fusion model must reach a high validation selection score
        (0.3*AUC + 0.7*ACC) in every fold — the joint model optimizes, not
        just runs."""
        from sklearn.linear_model import LogisticRegression

        class LogRegEmbedder(LogisticRegression):
            def get_embeddings(self, X, data_source="test"):
                return self.predict_proba(X)[None]

        # same step-count regime as tests/test_learning.py: BatchNorm
        # running stats need ~100 optimizer steps to burn in before
        # eval-mode metrics are calibrated
        root = str(tmp_path / "sep")
        csv_path, mri_dir, pet_dir = make_adni_dir(
            root, n_per_class=24, classes=("AD", "CN"), shape=SHAPE, seed=9,
            pet=True, extent_jitter=0.3, center_jitter=0.04, noise=0.25)
        m = ADNIManifest(csv_path, mri_dir, "ADCN", pet_dir=pet_dir,
                         verbose=False)
        table_data = table_for(m)
        cfg = Config(
            label_file=csv_path, mri_dir=mri_dir, pet_dir=pet_dir,
            task="ADCN", num_epochs=20, batch_size=4, lr=1e-3, n_splits=2,
            checkpoint_dir=str(tmp_path / "ckpt"), compute_dtype="float32",
            loader_threads=2)
        import jax

        from multimodal_ad_tpu.parallel.mesh import make_mesh

        n_dev = min(4, len(jax.devices()))  # batch 4 must shard evenly
        mesh = make_mesh({"data": n_dev}, devices=jax.devices()[:n_dev])
        best, _ = train_fusion_cv(
            cfg, use_pet=True, use_table=True, table_data=table_data,
            model_kw=dict(dim=16, depth=1, heads=2, dim_head=8, mlp_dim=32),
            records=m.data_dict, mesh=mesh,
            embedder=LogRegEmbedder(max_iter=200), verbose=False)
        # 0.8 bound: chance is ~0.5 and each ~19-sample val fold has
        # ~0.05 ACC granularity, so 0.8 is >= 5 sigma above chance while
        # tolerating one borderline sample
        assert len(best) == 2
        for fold, score in enumerate(best, 1):
            assert score >= 0.8, (
                f"fusion fold {fold} best val score {score:.3f} < 0.8")

        # held-out proof, same bar as the flagship's
        # (tests/test_learning.py:72-73): the fold checkpoints must
        # generalize to the untouched 20% test split, not just the val folds
        from multimodal_ad_tpu.data.splits import stratified_test_split
        from multimodal_ad_tpu.train.fusion import test_fusion_models

        tr_val, test_data = stratified_test_split(m.data_dict,
                                                  cfg.split_ratio, cfg.seed)
        results = test_fusion_models(
            cfg, test_data, use_pet=True, use_table=True,
            table_data=table_data,
            model_kw=dict(dim=16, depth=1, heads=2, dim_head=8, mlp_dim=32),
            mesh=mesh, embedder=LogRegEmbedder(max_iter=200),
            train_subjects=[r["Subject"] for r in tr_val], verbose=False)
        assert results["avg"]["AUC"] >= 0.85, results["avg"]


@pytest.mark.slow
class TestDAFTFusion:
    def test_daft_arch_cv(self, fusion_dir, tmp_path, mesh8):
        from sklearn.linear_model import LogisticRegression

        class LogRegEmbedder(LogisticRegression):
            def get_embeddings(self, X, data_source="test"):
                return self.predict_proba(X)[None]

        m = ADNIManifest(fusion_dir["label_file"], fusion_dir["mri_dir"],
                         "ADCN", verbose=False)
        table_data = table_for(m)
        cfg = Config(
            label_file=fusion_dir["label_file"], mri_dir=fusion_dir["mri_dir"],
            task="ADCN", num_epochs=1, batch_size=8, lr=1e-3, n_splits=2,
            checkpoint_dir=str(tmp_path / "ckpt"), compute_dtype="float32",
            loader_threads=2)
        best, _ = train_fusion_cv(
            cfg, use_table=True, table_data=table_data, arch="daft",
            model_kw=dict(layers=(1, 1, 1, 1)),
            records=m.data_dict, mesh=mesh8,
            embedder=LogRegEmbedder(max_iter=200), verbose=False)
        assert len(best) == 2 and all(np.isfinite(b) for b in best)

    def test_daft_requires_table(self, fusion_dir, mesh8):
        cfg = Config(label_file=fusion_dir["label_file"],
                     mri_dir=fusion_dir["mri_dir"])
        with pytest.raises(ValueError, match="daft"):
            train_fusion_cv(cfg, use_table=False, arch="daft", mesh=mesh8)
