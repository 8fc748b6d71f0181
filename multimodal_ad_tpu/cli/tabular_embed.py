"""Generate tabular in-context embeddings + quick downstream eval.

Mirrors `python tabel_test.py` (reference tabel_test.py:188-193) — with the
class-name typo fixed ("SMCI", not "SCMI"; SURVEY.md §8.4).

Usage:
    python -m multimodal_ad_tpu.cli.tabular_embed --table ADNI_Tabel.csv \
        --classes CN SMCI PMCI AD --n-fold 5 --test-size 0.2
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--table", required=True, help="clinical CSV")
    p.add_argument("--label-col", default="GROUP")
    p.add_argument("--classes", nargs="+", default=["CN", "SMCI", "PMCI", "AD"])
    p.add_argument("--start-col", type=int, default=14)
    p.add_argument("--n-fold", type=int, default=5)
    p.add_argument("--test-size", type=float, default=0.2)
    p.add_argument("--train-out", default="train_embeddings.csv")
    p.add_argument("--test-out", default="test_embeddings.csv")
    p.add_argument("--pretrain-steps", type=int, default=2000,
                   help="in-context learner meta-training steps")
    args = p.parse_args(argv)

    from ..tabular.icl import ICLClassifier
    from ..tabular.pipeline import quick_eval_from_saved, tabel_encoder_multi

    print("embeddings.......")
    clf = ICLClassifier(pretrain_steps=args.pretrain_steps)
    tabel_encoder_multi(args.table, start_col=args.start_col,
                        label_col=args.label_col, classes=args.classes,
                        n_fold=args.n_fold, test_size=args.test_size,
                        train_out=args.train_out, test_out=args.test_out,
                        embedder=clf)
    print("test model......")
    return quick_eval_from_saved(args.train_out, args.test_out)


if __name__ == "__main__":
    main()
