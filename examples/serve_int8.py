"""Example: train a tiny fold ensemble, serve it, quantize to int8, and
persist/reload the quantized artifact.

The full deployment story is documented in SERVING.md; on a real v5e the
int8 graph measures 1.65x the bf16 serving throughput with argmax
agreement 1.000 (benchmarks/ROOFLINE.md).

Run:  python examples/serve_int8.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from multimodal_ad_tpu.core.config import Config
from multimodal_ad_tpu.data.synthetic import make_adni_dir, make_volume
from multimodal_ad_tpu.models.resnet3d_int8 import load_int8, save_int8
from multimodal_ad_tpu.serve import EnsemblePredictor
from multimodal_ad_tpu.train.cv import train_cv

SHAPE = (16, 20, 16)


def main():
    root = tempfile.mkdtemp(prefix="serve_int8_example_")
    label_csv, mri_dir = make_adni_dir(root, n_per_class=6,
                                       classes=("AD", "CN"), shape=SHAPE,
                                       seed=0)
    cfg = Config(label_file=label_csv, mri_dir=mri_dir, task="ADCN",
                 num_epochs=2, batch_size=8, lr=1e-3, n_splits=2,
                 model_depth=10, checkpoint_dir=os.path.join(root, "ckpt"),
                 compute_dtype="float32", loader_threads=2,
                 input_W=SHAPE[0], input_H=SHAPE[1], input_D=SHAPE[2])
    train_cv(cfg)

    rng = np.random.default_rng(0)
    volumes = np.stack([make_volume(rng, SHAPE, label=i % 2)
                        for i in range(6)])

    pred = EnsemblePredictor.from_checkpoint_dir(cfg.checkpoint_dir,
                                                 batch_size=8)
    bf16 = pred.predict_proba(volumes)
    pred.quantize_int8(volumes[:2])  # calibrate on representative volumes
    q8 = pred.predict_proba(volumes)
    agree = float((q8.argmax(1) == bf16.argmax(1)).mean())
    print(f"bf16 vs int8 argmax agreement: {agree:.2f}")

    # persist ONE fold's quantized graph and reload it standalone
    from multimodal_ad_tpu.models.resnet3d_int8 import (calibrate_int8,
                                                        export_int8,
                                                        resnet3d_int8_apply)
    import jax

    fold0 = jax.tree_util.tree_map(lambda s: np.asarray(s[0]), pred._stacked)
    qp = export_int8(fold0, depth=cfg.model_depth)
    cal = np.stack([pred.transform(v) for v in volumes[:2]])
    scales = calibrate_int8(qp, [cal])
    path = save_int8(os.path.join(root, "fold0_int8.npz"), qp, scales)
    qp2, scales2 = load_int8(path)
    x = np.stack([pred.transform(v) for v in volumes])
    logits = np.asarray(resnet3d_int8_apply(qp2, scales2, x))
    print(f"reloaded artifact ({os.path.getsize(path)/1e6:.1f} MB) "
          f"logits shape: {logits.shape}")
    return {"agreement": agree, "artifact": path}


if __name__ == "__main__":
    main()
