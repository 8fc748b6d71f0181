"""Mid-training resume + Experiment harness."""

import os

import numpy as np
import pytest

from multimodal_ad_tpu.core.config import Config
from multimodal_ad_tpu.tabular.benchmarking import Experiment


class TestExperiment:
    def test_run_save_plot(self, tmp_path):
        class Demo(Experiment):
            name = "demo"

            def run_experiment(self, x=2):
                # seeded determinism
                return {"acc": float(np.random.rand()), "x": x}

        e1 = Demo(seed=7, output_dir=str(tmp_path))
        r1 = e1.run(x=3)
        r2 = Demo(seed=7, output_dir=str(tmp_path)).run(x=3)
        assert r1["acc"] == r2["acc"]  # reproducible
        assert r1["x"] == 3 and "wall_time_s" in r1
        path = e1.save()
        assert os.path.getsize(path) > 10
        png = e1.plot()
        assert os.path.getsize(png) > 500

    def test_requires_run(self, tmp_path):
        class Demo(Experiment):
            def run_experiment(self):
                return {}

        with pytest.raises(RuntimeError):
            Demo(output_dir=str(tmp_path)).save()


@pytest.mark.slow
class TestResume:
    def test_restore_legacy_checkpoint_without_step(self, tmp_path):
        """Checkpoints written before the per-step dropout counter carried
        no 'step' entry; restore_state must load them (step defaults to 0)
        instead of failing on the tree-structure mismatch."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        import orbax.checkpoint as ocp

        from multimodal_ad_tpu.models.resnet3d import generate_model
        from multimodal_ad_tpu.train import checkpoint as ckpt
        from multimodal_ad_tpu.train.loop import create_train_state

        model = generate_model(model_depth=10, nb_class=2,
                               compute_dtype=jnp.float32)
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            {"image": jnp.zeros((1, 8, 8, 8, 1), jnp.float32)}, lambda _: 1e-3)
        legacy_tree = {k: v for k, v in ckpt._tree_of(state).items()
                       if k != "step"}
        path = str(tmp_path / "legacy_ckpt")
        saver = ocp.StandardCheckpointer()
        saver.save(path, legacy_tree, force=True)
        saver.wait_until_finished()

        restored, _ = ckpt.restore_state(path, state)
        assert int(restored.step) == 0
        np.testing.assert_array_equal(
            np.asarray(restored.params["Conv_0"]["kernel"]),
            np.asarray(state.params["Conv_0"]["kernel"]))

    def test_resume_continues_fold(self, adni_dir, tmp_path, mesh8):
        from multimodal_ad_tpu.train.cv import train_cv

        common = dict(
            label_file=adni_dir["label_file"], mri_dir=adni_dir["mri_dir"],
            task="ADCN", batch_size=8, lr=1e-3, n_splits=2, model_depth=10,
            checkpoint_dir=str(tmp_path / "ckpt"), compute_dtype="float32",
            loader_threads=2, resume=True)

        # phase 1: 1 epoch
        cfg1 = Config(num_epochs=1, **common)
        train_cv(cfg1, mesh=mesh8, verbose=False)
        assert os.path.isdir(str(tmp_path / "ckpt" / "last_fold1"))
        # fold finals exist -> a rerun with same epochs skips folds entirely
        import json
        meta = json.load(open(str(tmp_path / "ckpt" / "last_fold1" / "meta.json")))
        assert meta["metrics"]["epoch"] == 1

        # phase 2: extend to 3 epochs; folds resume from epoch 2
        cfg2 = Config(num_epochs=3, **common)
        results, _ = train_cv(cfg2, mesh=mesh8, verbose=False)
        meta = json.load(open(str(tmp_path / "ckpt" / "last_fold1" / "meta.json")))
        assert meta["metrics"]["epoch"] == 3
        # CSV shows epochs 1 (phase 1) then 2,3 (phase 2) per fold
        import csv
        rows = list(csv.reader(open(str(tmp_path / "ckpt" / "cv_results.csv"))))
        fold1_epochs = [int(r[1]) for r in rows[1:] if r[0] == "1"]
        assert fold1_epochs == [2, 3]  # phase-2 log starts fresh at epoch 2
        assert 0.0 <= results["avg"]["ACC"] <= 1.0
