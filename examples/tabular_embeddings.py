"""Example: in-context tabular embeddings + downstream evaluation.

Run:  python examples/tabular_embeddings.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_ad_tpu.data.synthetic import make_table
from multimodal_ad_tpu.tabular import ICLClassifier, ICLConfig, pretrain_icl
from multimodal_ad_tpu.tabular.pipeline import (quick_eval_from_saved,
                                                tabel_encoder_multi)


def main():
    root = tempfile.mkdtemp(prefix="tab_example_")
    table_csv = os.path.join(root, "clinical.csv")
    make_table(n=120, classes=("CN", "AD"), seed=0).to_csv(table_csv,
                                                           index=False)

    cfg = ICLConfig(d_model=32, n_heads=2, n_layers=2, d_ff=64,
                    max_features=32, max_classes=4, max_context=128)
    params, _ = pretrain_icl(cfg, steps=200, batch=16, n_ctx=48, n_qry=16)
    clf = ICLClassifier(params=params, cfg=cfg)

    tr, te = tabel_encoder_multi(
        table_csv, label_col="Group", classes=["CN", "AD"], n_fold=3,
        test_size=0.3, train_out=os.path.join(root, "train_emb.csv"),
        test_out=os.path.join(root, "test_emb.csv"), embedder=clf)
    acc = quick_eval_from_saved(tr, te)
    print("downstream SVM accuracy:", round(acc, 4))
    return acc


if __name__ == "__main__":
    main()
