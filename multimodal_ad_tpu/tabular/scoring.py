"""Scoring utilities (tabpfn-extensions scoring parity).

Capability parity with reference models/tabpfn-extensions/src/
tabpfn_extensions/scoring/scoring_utils.py:21-259: NaN/single-class-safe
ROC-AUC and uniform classification/regression scorers.
"""

from __future__ import annotations

import numpy as np
from sklearn import metrics as skm


def safe_roc_auc_score(y_true, y_score, **kw) -> float:
    """ROC-AUC that returns nan instead of raising on degenerate inputs
    (single class present, NaNs in scores)."""
    y_true = np.asarray(y_true)
    y_score = np.asarray(y_score)
    valid = ~(np.isnan(y_score).reshape(len(y_score), -1).any(axis=1))
    y_true, y_score = y_true[valid], y_score[valid]
    if len(np.unique(y_true)) < 2 or len(y_true) == 0:
        return float("nan")
    try:
        if y_score.ndim == 2 and y_score.shape[1] == 2:
            y_score = y_score[:, 1]
        if y_score.ndim == 2:
            kw.setdefault("multi_class", "ovr")
        return float(skm.roc_auc_score(y_true, y_score, **kw))
    except ValueError:
        return float("nan")


def score_classification(metric: str, y_true, y_pred_or_proba) -> float:
    """metric in {'accuracy', 'roc_auc', 'f1', 'log_loss', 'balanced_accuracy'}.
    Probabilistic metrics expect probabilities; label metrics accept either
    (argmax applied to 2-D input)."""
    y = np.asarray(y_pred_or_proba)
    if metric == "roc_auc":
        return safe_roc_auc_score(y_true, y)
    if metric == "log_loss":
        return float(skm.log_loss(y_true, y))
    labels = np.argmax(y, axis=1) if y.ndim == 2 else y
    if metric == "accuracy":
        return float(skm.accuracy_score(y_true, labels))
    if metric == "balanced_accuracy":
        return float(skm.balanced_accuracy_score(y_true, labels))
    if metric == "f1":
        return float(skm.f1_score(y_true, labels, average="macro"))
    raise ValueError(f"unknown classification metric {metric}")


def score_regression(metric: str, y_true, y_pred) -> float:
    if metric in ("rmse",):
        return float(np.sqrt(skm.mean_squared_error(y_true, y_pred)))
    if metric in ("mse",):
        return float(skm.mean_squared_error(y_true, y_pred))
    if metric in ("mae",):
        return float(skm.mean_absolute_error(y_true, y_pred))
    if metric in ("r2",):
        return float(skm.r2_score(y_true, y_pred))
    raise ValueError(f"unknown regression metric {metric}")
