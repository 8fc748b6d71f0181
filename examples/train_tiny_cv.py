"""Example: end-to-end K-fold CV training on a synthetic miniature ADNI set.

Run:  python examples/train_tiny_cv.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_ad_tpu.core.config import Config
from multimodal_ad_tpu.data.synthetic import make_adni_dir
from multimodal_ad_tpu.train.cv import train_cv


def main():
    root = tempfile.mkdtemp(prefix="adni_example_")
    label_csv, mri_dir = make_adni_dir(root, n_per_class=6,
                                       classes=("AD", "CN"),
                                       shape=(24, 28, 24), seed=0)
    cfg = Config(label_file=label_csv, mri_dir=mri_dir, task="ADCN",
                 num_epochs=2, batch_size=8, lr=1e-3, n_splits=2,
                 model_depth=10, checkpoint_dir=os.path.join(root, "ckpt"),
                 loader_threads=2)
    results, ckpt_dir = train_cv(cfg)
    print("\ntest ACC:", round(results["avg"]["ACC"], 4),
          "AUC:", round(results["avg"]["AUC"], 4))
    print("checkpoints:", ckpt_dir)
    return results


if __name__ == "__main__":
    main()
