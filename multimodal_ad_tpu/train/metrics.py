"""7-metric classification evaluation (host-side, sklearn parity).

Matches reference train_ResNet3D.py:87-108 exactly: ACC/PRE/SEN/SPE/F1/AUC/
MCC plus the confusion matrix, with SPE = TN/(TN+FP+1e-8). AUC is computed
on the positive-class softmax probability (train_ResNet3D.py:220), and the
reference's test-time decision rule is prob > 0.5 (train_ResNet3D.py:388).

Metrics stay on host: they are cheap O(n) reductions over per-epoch
prediction vectors, not worth a device round-trip — the device-side work is
the jit'd forward that produced the logits.
"""

from __future__ import annotations

import numpy as np
from sklearn.metrics import (
    accuracy_score,
    confusion_matrix,
    f1_score,
    matthews_corrcoef,
    precision_score,
    recall_score,
    roc_auc_score,
)

METRIC_KEYS = ("ACC", "PRE", "SEN", "SPE", "F1", "AUC", "MCC")


def calculate_metrics(y_true, y_pred, y_score) -> dict:
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    y_score = np.asarray(y_score)

    cm = confusion_matrix(y_true, y_pred, labels=[0, 1])
    tn, fp, fn, tp = cm.ravel()

    try:
        auc = roc_auc_score(y_true, y_score)
    except ValueError:  # single-class batch
        auc = float("nan")

    return {
        "ACC": accuracy_score(y_true, y_pred),
        "PRE": precision_score(y_true, y_pred, zero_division=0),
        "SEN": recall_score(y_true, y_pred, zero_division=0),
        "SPE": tn / (tn + fp + 1e-8),
        "F1": f1_score(y_true, y_pred, zero_division=0),
        "AUC": auc,
        "MCC": matthews_corrcoef(y_true, y_pred),
        "cm": np.array([[tn, fp], [fn, tp]]),
    }


def _macro_specificity(cm: np.ndarray) -> float:
    """Macro one-vs-rest specificity: per class c, TN/(TN+FP) over the
    rest-vs-c binarization, averaged (same +1e-8 guard as the binary SPE)."""
    total = cm.sum()
    col = cm.sum(axis=0)
    row = cm.sum(axis=1)
    tp = np.diag(cm)
    fp = col - tp
    tn = total - row - col + tp
    return float(np.mean(tn / (tn + fp + 1e-8)))


def calculate_metrics_multiclass(y_true, y_pred, y_prob) -> dict:
    """Macro-averaged variant for the 3/4-class tasks
    (reference task ADCNSMCIPMCI, datasets/ADNI.py:77-79)."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    y_prob = np.asarray(y_prob)
    n_cls = y_prob.shape[-1] if y_prob.ndim == 2 else int(
        max(y_true.max(), y_pred.max())) + 1
    cm = confusion_matrix(y_true, y_pred, labels=np.arange(n_cls))
    try:
        auc = roc_auc_score(y_true, y_prob, multi_class="ovr", average="macro",
                            labels=np.arange(n_cls))
    except ValueError:
        auc = float("nan")
    return {
        "ACC": accuracy_score(y_true, y_pred),
        "PRE": precision_score(y_true, y_pred, average="macro", zero_division=0),
        "SEN": recall_score(y_true, y_pred, average="macro", zero_division=0),
        "SPE": _macro_specificity(cm),
        "F1": f1_score(y_true, y_pred, average="macro", zero_division=0),
        "AUC": auc,
        "MCC": matthews_corrcoef(y_true, y_pred),
        "cm": cm,
    }


def model_selection_score(metrics: dict, weights=(0.3, 0.7)) -> float:
    """Best-checkpoint criterion 0.3*AUC + 0.7*ACC
    (reference train_ResNet3D.py:289).

    AUC is NaN when a validation fold holds a single class (sklearn
    ValueError, caught above); a NaN score would never beat best_metric and
    the fold would finish with no best checkpoint, crashing the test-time
    restore. Fall back to ACC-only so selection still works.
    """
    w_auc, w_acc = weights
    if not np.isfinite(metrics["AUC"]):
        return float(metrics["ACC"])
    return w_auc * metrics["AUC"] + w_acc * metrics["ACC"]
