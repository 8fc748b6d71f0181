"""Standalone test evaluation of saved fold checkpoints.

Mirrors `python test.py` (reference test.py:211-222): rebuild the seed-42
stratified test split, load best_fold{k} for k=1..n_splits, per-fold
metrics + confusion matrices, pooled ROC PNG.
"""

from __future__ import annotations

from ..data.adni import ADNIManifest
from ..data.splits import stratified_test_split
from ..train.cv import test_models
from .common import base_parser, load_config


def main(argv=None):
    args = base_parser(__doc__).parse_args(argv)
    cfg = load_config(args)
    records = ADNIManifest(cfg.label_file, cfg.mri_dir, cfg.task,
                           augment=False).data_dict
    _, test_data = stratified_test_split(records, cfg.split_ratio, cfg.seed)
    return test_models(cfg, test_data)


if __name__ == "__main__":
    main()
