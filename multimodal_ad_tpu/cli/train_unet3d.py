"""Train the U-Net 3D classifier on a single 64/16/20 split.

Mirrors `python train_unet3d.py` (reference train_unet3d.py — a
module-level script there; a proper CLI here).
"""

from __future__ import annotations

from ..train.single_split import train_unet_classifier
from .common import base_parser, load_config


def main(argv=None):
    args = base_parser(__doc__).parse_args(argv)
    cfg = load_config(args)
    best_auc, ckpt_dir = train_unet_classifier(cfg)
    print(f"\nbest val AUC: {best_auc:.4f}  checkpoints: {ckpt_dir}")
    return best_auc


if __name__ == "__main__":
    main()
