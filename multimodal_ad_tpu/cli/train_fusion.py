"""Train the multimodal fusion classifier (MRI + PET + clinical table).

The end-to-end multimodal capability the reference sketched but never
wired (models/network.py cross-transformer + datasets/ADNI.ipynb
multimodal loader + tabpfn tabular branch; BASELINE.json config 5).

Usage:
    python -m multimodal_ad_tpu.cli.train_fusion --config config.json \
        --use-pet --use-table --table ADNI_Tabel.csv [key=value ...]
"""

from __future__ import annotations

import numpy as np

from ..train.fusion import train_fusion_cv
from .common import base_parser, load_config


def main(argv=None):
    p = base_parser(__doc__)
    p.add_argument("--use-pet", action="store_true")
    p.add_argument("--use-table", action="store_true")
    p.add_argument("--table", default=None, help="clinical CSV (ADNI_Tabel)")
    p.add_argument("--table-start-col", type=int, default=14)
    p.add_argument("--arch", choices=["cross_transformer", "daft"],
                   default="cross_transformer")
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--depth", type=int, default=2)
    args = p.parse_args(argv)
    cfg = load_config(args)

    table_data = None
    if args.use_table:
        if not args.table:
            p.error("--use-table requires --table")
        import pandas as pd

        from ..data.tabular import load_adni_table

        df = pd.read_csv(args.table, encoding="ISO-8859-1")
        X, y, _cols = load_adni_table(args.table, label_col="Group",
                                      classes=None,
                                      start_col=args.table_start_col)
        subjects = df[df["Group"].isin(["CN", "AD"])]["Subject_ID"].tolist()
        table_data = (X, y, subjects)

    model_kw = ({} if args.arch == "daft"
                else dict(dim=args.dim, depth=args.depth))
    best, ckpt_dir = train_fusion_cv(
        cfg, use_pet=args.use_pet, use_table=args.use_table,
        table_data=table_data, arch=args.arch, model_kw=model_kw)
    print(f"\nbest fold scores: {np.round(best, 4).tolist()}")
    print(f"checkpoints: {ckpt_dir}")
    return best


if __name__ == "__main__":
    main()
