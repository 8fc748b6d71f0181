"""U-Net denoising autoencoder trainer + trained-features extraction."""

import os

import numpy as np
import pytest

from multimodal_ad_tpu.core.config import Config
from multimodal_ad_tpu.models.unet3d import UNet3D


@pytest.mark.slow
class TestAutoencoder:
    def test_train_reduces_mse_and_feeds_extraction(self, adni_dir, tmp_path,
                                                    mesh8):
        import jax.numpy as jnp

        from multimodal_ad_tpu.data.adni import ADNIManifest
        from multimodal_ad_tpu.data.synthetic import make_atlas
        from multimodal_ad_tpu.eval.features import extract_unet_features
        from multimodal_ad_tpu.train.autoencoder import (
            load_autoencoder_variables, train_unet_autoencoder)

        model = UNet3D(in_channels=1, num_classes=1,
                       level_channels=(8, 16, 32), bottleneck_channel=64,
                       dtype=jnp.float32)
        cfg = Config(label_file=adni_dir["label_file"],
                     mri_dir=adni_dir["mri_dir"], task="ADCN", num_epochs=3,
                     batch_size=8, lr=3e-3,
                     checkpoint_dir=str(tmp_path / "ckpt"),
                     compute_dtype="float32", loader_threads=2)
        best, path = train_unet_autoencoder(cfg, mesh=mesh8, model=model,
                                            verbose=False)
        assert os.path.isdir(path)
        assert best < 0.05  # reconstructs the smooth synthetic blobs

        # restore into extraction
        model2, variables = load_autoencoder_variables(
            path, cfg, adni_dir["shape"], model=model)
        m = ADNIManifest(adni_dir["label_file"], adni_dir["mri_dir"], "ADCN",
                         verbose=False)
        labels = make_atlas(adni_dir["shape"], n_rois=3, seed=0)
        fpath, rpath = extract_unet_features(
            m.data_dict[:2], labels, ["A", "B", "C"], str(tmp_path / "out"),
            model=model2, variables=variables, batch_size=8, mesh=mesh8,
            num_threads=2)
        assert os.path.getsize(rpath) > 100
