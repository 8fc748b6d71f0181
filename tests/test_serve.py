"""Serving: vmapped fold-ensemble predictor over trained checkpoints."""

import numpy as np
import pytest

from multimodal_ad_tpu.core.config import Config
from multimodal_ad_tpu.data.synthetic import make_adni_dir, make_volume

SHAPE = (16, 20, 16)


@pytest.fixture(scope="module")
def trained_ckpts(tmp_path_factory):
    """A real 2-fold train_cv run to serve from."""
    from multimodal_ad_tpu.train.cv import train_cv

    root = str(tmp_path_factory.mktemp("serve"))
    csv_path, mri_dir = make_adni_dir(root, n_per_class=8,
                                      classes=("AD", "CN"), shape=SHAPE,
                                      seed=3)
    cfg = Config(label_file=csv_path, mri_dir=mri_dir, task="ADCN",
                 num_epochs=2, batch_size=8, lr=1e-3, n_splits=2,
                 model_depth=10, checkpoint_dir=root + "/ckpt",
                 compute_dtype="float32", loader_threads=2,
                 input_W=SHAPE[0], input_H=SHAPE[1], input_D=SHAPE[2])
    train_cv(cfg, verbose=False)
    return cfg


@pytest.mark.slow
class TestEnsemblePredictor:
    def test_matches_python_loop_ensemble(self, trained_ckpts):
        """The single vmapped executable must equal the per-fold python
        loop average (the reference test.py semantics)."""
        import jax
        import jax.numpy as jnp

        from multimodal_ad_tpu.models.resnet3d import generate_model
        from multimodal_ad_tpu.serve import EnsemblePredictor
        from multimodal_ad_tpu.train import checkpoint as ckpt
        from multimodal_ad_tpu.train.loop import (create_train_state,
                                                  make_epoch_schedule)

        cfg = trained_ckpts
        pred = EnsemblePredictor.from_checkpoint_dir(cfg.checkpoint_dir)
        assert pred.n_folds == 2

        rng = np.random.default_rng(0)
        vols = np.stack([make_volume(rng, SHAPE, label=i % 2)
                         for i in range(4)])
        proba = pred.predict_proba(vols)
        assert proba.shape == (4, 2)
        np.testing.assert_allclose(proba.sum(axis=1), 1.0, rtol=1e-5)

        # manual per-fold average
        model = generate_model(model_depth=10, nb_class=2,
                               compute_dtype=jnp.float32)
        template = create_train_state(
            model, jax.random.PRNGKey(0),
            {"image": jnp.zeros((1, *SHAPE, 1), jnp.float32)},
            make_epoch_schedule(cfg.lr, cfg.num_epochs), cfg.weight_decay,
            cfg.grad_clip_norm, "adam")
        x = np.stack([pred.transform(v) for v in vols])
        accs = []
        for k in (1, 2):
            state, _ = ckpt.restore_state(
                f"{cfg.checkpoint_dir}/best_fold{k}", template)
            logits = model.apply({"params": state.params,
                                  "batch_stats": state.batch_stats},
                                 jnp.asarray(x), train=False)
            accs.append(np.asarray(jax.nn.softmax(logits, axis=-1)))
        manual = np.mean(accs, axis=0)
        np.testing.assert_allclose(proba, manual, rtol=1e-4, atol=1e-5)

    def test_predict_cli(self, trained_ckpts, tmp_path):
        import csv

        from multimodal_ad_tpu.cli.predict import main

        cfg = trained_ckpts
        out = str(tmp_path / "pred.csv")
        main(["--ckpt-dir", cfg.checkpoint_dir,
              "--label-file", cfg.label_file, "--mri-dir", cfg.mri_dir,
              "--task", "ADCN", "--out", out])
        rows = list(csv.reader(open(out)))
        assert rows[0] == ["Subject_ID", "pred", "prob_0", "prob_1"]
        assert len(rows) == 1 + 16
        for r in rows[1:]:
            assert abs(float(r[2]) + float(r[3]) - 1.0) < 1e-4

    def test_ragged_request_padding(self, trained_ckpts):
        from multimodal_ad_tpu.serve import EnsemblePredictor

        cfg = trained_ckpts
        pred = EnsemblePredictor.from_checkpoint_dir(cfg.checkpoint_dir,
                                                     batch_size=4)
        rng = np.random.default_rng(1)
        vols = np.stack([make_volume(rng, SHAPE, label=i % 2)
                         for i in range(7)])  # 4 + ragged 3
        proba = pred.predict_proba(vols)
        assert proba.shape == (7, 2)
        labels = pred.predict(vols)
        assert labels.shape == (7,)
        assert set(np.unique(labels)) <= {0, 1}
        # chunking must not change results vs one big batch
        pred8 = EnsemblePredictor.from_checkpoint_dir(cfg.checkpoint_dir,
                                                      batch_size=8)
        np.testing.assert_allclose(proba, pred8.predict_proba(vols),
                                   rtol=1e-4, atol=1e-5)

    def test_mesh_sharded_serving(self, trained_ckpts):
        """mesh= shards each request batch over the data axis (parameters
        replicated); results must equal single-device serving exactly, and
        a batch size that does not divide the axis is rejected."""
        from multimodal_ad_tpu.parallel.mesh import make_mesh
        from multimodal_ad_tpu.serve import EnsemblePredictor

        cfg = trained_ckpts
        mesh = make_mesh({"data": -1})
        rng = np.random.default_rng(7)
        vols = np.stack([make_volume(rng, SHAPE, label=i % 2)
                         for i in range(8)])
        single = EnsemblePredictor.from_checkpoint_dir(
            cfg.checkpoint_dir, batch_size=8).predict_proba(vols)
        sharded = EnsemblePredictor.from_checkpoint_dir(
            cfg.checkpoint_dir, batch_size=8, mesh=mesh)
        proba = sharded.predict_proba(vols)
        np.testing.assert_allclose(proba, single, rtol=1e-4, atol=1e-5)
        if mesh.shape["data"] > 1:
            with pytest.raises(ValueError):
                EnsemblePredictor.from_checkpoint_dir(
                    cfg.checkpoint_dir, batch_size=mesh.shape["data"] + 1,
                    mesh=mesh)

    def test_mesh_plus_int8(self, trained_ckpts):
        """The mesh and int8 options compose: a sharded request batch
        through the vmapped quantized ensemble (GSPMD replicates the
        int8 fold stack) matches unsharded int8 serving."""
        from multimodal_ad_tpu.parallel.mesh import make_mesh
        from multimodal_ad_tpu.serve import EnsemblePredictor

        cfg = trained_ckpts
        rng = np.random.default_rng(9)
        vols = np.stack([make_volume(rng, SHAPE, label=i % 2)
                         for i in range(8)])
        plain = EnsemblePredictor.from_checkpoint_dir(
            cfg.checkpoint_dir, batch_size=8)
        plain.quantize_int8(vols[:2])
        ref = plain.predict_proba(vols)
        meshed = EnsemblePredictor.from_checkpoint_dir(
            cfg.checkpoint_dir, batch_size=8, mesh=make_mesh({"data": -1}))
        meshed.quantize_int8(vols[:2])
        np.testing.assert_allclose(meshed.predict_proba(vols), ref,
                                   rtol=1e-4, atol=1e-5)

    def test_int8_quantized_serving(self, trained_ckpts):
        """quantize_int8 converts the ensemble to int8 graphs; predictions
        stay close to the bf16 ensemble's (argmax agreement on a trained
        model) and the probability contract holds."""
        from multimodal_ad_tpu.serve import EnsemblePredictor

        cfg = trained_ckpts
        rng = np.random.default_rng(5)
        vols = np.stack([make_volume(rng, SHAPE, label=i % 2)
                         for i in range(6)])
        ref = EnsemblePredictor.from_checkpoint_dir(
            cfg.checkpoint_dir, batch_size=8).predict_proba(vols)
        pred = EnsemblePredictor.from_checkpoint_dir(cfg.checkpoint_dir,
                                                     batch_size=8)
        assert pred.quantize_int8(vols[:2]) is pred
        q = pred.predict_proba(vols)
        assert q.shape == (6, 2)
        np.testing.assert_allclose(q.sum(1), 1.0, rtol=1e-5)
        assert (q.argmax(1) == ref.argmax(1)).mean() >= 5 / 6
        assert np.abs(q - ref).mean() < 0.08, (q, ref)

    def test_multichannel_volumes_preprocess(self):
        """A checkpoint trained with in_channels>1 must be servable with
        preprocess=True: every channel is normalized independently and kept
        (regression: channel 0 was silently extracted, then the model's
        channel guard rejected the 1-channel input)."""
        import jax
        import jax.numpy as jnp

        from multimodal_ad_tpu.models.resnet3d import generate_model
        from multimodal_ad_tpu.serve import EnsemblePredictor

        model = generate_model(model_depth=10, nb_class=2, in_channels=2,
                               compute_dtype=jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(0)},
                               jnp.zeros((1, *SHAPE, 2), jnp.float32),
                               train=False)
        pred = EnsemblePredictor(model, [variables, variables], batch_size=4)
        rng = np.random.default_rng(2)
        vols = np.stack([
            np.stack([make_volume(rng, SHAPE, label=i % 2),
                      make_volume(rng, SHAPE, label=i % 2)], axis=-1)
            for i in range(3)])
        proba = pred.predict_proba(vols)  # (3, X, Y, Z, 2) in, (3, 2) out
        assert proba.shape == (3, 2)
        np.testing.assert_allclose(proba.sum(axis=1), 1.0, rtol=1e-5)
