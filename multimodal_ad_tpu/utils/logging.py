"""CSV + TensorBoard experiment logging.

Reference parity: TB scalars fold{k}/{train,val}/{ACC,AUC,loss} + fold{k}/lr
(reference train_ResNet3D.py:255-261) and a cv_results.csv append log
(263-275). The reference's CSV header has 9 columns while its rows have 19
(SURVEY.md §8.1) — fixed here: the header matches the row schema.

TensorBoard is optional (torch's SummaryWriter if importable, else a
no-op), since event files are observability, not training state.
"""

from __future__ import annotations

import csv
import os

CV_CSV_HEADER = [
    "fold", "epoch",
    "tr_acc", "tr_pre", "tr_sen", "tr_spe", "tr_f1", "tr_auc", "tr_mcc", "tr_loss",
    "vl_acc", "vl_pre", "vl_sen", "vl_spe", "vl_f1", "vl_auc", "vl_mcc", "vl_loss",
    "lr",
]


class _NullWriter:
    def add_scalar(self, *a, **k):
        pass

    def close(self):
        pass


def make_tb_writer(log_dir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter
        return SummaryWriter(log_dir)
    except Exception:
        return _NullWriter()


class CVLogger:
    def __init__(self, checkpoint_dir: str, csv_name: str = "cv_results.csv",
                 tensorboard: bool = True):
        os.makedirs(checkpoint_dir, exist_ok=True)
        self.csv_path = os.path.join(checkpoint_dir, csv_name)
        with open(self.csv_path, "w", newline="") as f:
            csv.writer(f).writerow(CV_CSV_HEADER)
        self.tb = make_tb_writer(checkpoint_dir) if tensorboard else _NullWriter()

    def log_epoch(self, fold, epoch, tr_metrics, tr_loss, vl_metrics, vl_loss, lr):
        self.tb.add_scalar(f"fold{fold}/train/ACC", tr_metrics["ACC"], epoch)
        self.tb.add_scalar(f"fold{fold}/val/ACC", vl_metrics["ACC"], epoch)
        self.tb.add_scalar(f"fold{fold}/train/AUC", tr_metrics["AUC"], epoch)
        self.tb.add_scalar(f"fold{fold}/val/AUC", vl_metrics["AUC"], epoch)
        self.tb.add_scalar(f"fold{fold}/train/loss", tr_loss, epoch)
        self.tb.add_scalar(f"fold{fold}/val/loss", vl_loss, epoch)
        self.tb.add_scalar(f"fold{fold}/lr", lr, epoch)

        def six(x):
            return f"{x:.6f}"

        with open(self.csv_path, "a", newline="") as f:
            csv.writer(f).writerow(
                [fold, epoch]
                + [six(tr_metrics[k]) for k in ("ACC", "PRE", "SEN", "SPE", "F1", "AUC", "MCC")]
                + [six(tr_loss)]
                + [six(vl_metrics[k]) for k in ("ACC", "PRE", "SEN", "SPE", "F1", "AUC", "MCC")]
                + [six(vl_loss), six(lr)]
            )

    def close(self):
        self.tb.close()
