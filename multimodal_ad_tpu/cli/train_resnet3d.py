"""Train the 3D ResNet classifier with stratified K-fold CV.

Mirrors `python train_ResNet3D.py` (reference train_ResNet3D.py:448-450) —
and its PET clone train_resnet3d2.py, which is just this CLI with the PET
config (`--config config2.json`).

Usage:
    python -m multimodal_ad_tpu.cli.train_resnet3d --config config.json \
        [lr=1e-4 num_epochs=50 ...]
"""

from __future__ import annotations

from ..train.cv import train_cv
from .common import base_parser, load_config


def main(argv=None):
    args = base_parser(__doc__).parse_args(argv)
    cfg = load_config(args)
    results, ckpt_dir = train_cv(cfg)
    print(f"\ncheckpoints: {ckpt_dir}")
    return results


if __name__ == "__main__":
    main()
