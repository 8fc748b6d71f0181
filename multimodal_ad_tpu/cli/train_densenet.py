"""Train the dilated DenseNet MRI classifier with K-fold CV.

The reference intended this path (config/cfg_denseNet.json exists) but its
trainer is a 0-byte file and its model crashes (SURVEY.md §2.2, §8.6).
Same harness as train_resnet3d, DenseNet model.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.densenet import DilatedDenseNet
from ..train.cv import train_cv
from .common import base_parser, load_config


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("--growth", type=int, default=16)
    p.add_argument("--blocks", type=int, nargs="+", default=[6, 12, 24, 16])
    args = p.parse_args(argv)
    cfg = load_config(args)

    def factory():
        return DilatedDenseNet(
            num_classes=cfg.nb_class, in_channels=cfg.in_channels,
            growth=args.growth, block_config=tuple(args.blocks),
            dropout_rate=cfg.dropout_rate, spatial_dims=3,
            dtype=jnp.dtype(cfg.compute_dtype),
            param_dtype=jnp.dtype(cfg.param_dtype))

    results, ckpt_dir = train_cv(cfg, model_factory=factory)
    print(f"\ncheckpoints: {ckpt_dir}")
    return results


if __name__ == "__main__":
    main()
