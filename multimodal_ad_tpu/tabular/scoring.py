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


def concordance_index(event_times, predicted_scores, event_observed=None
                      ) -> float:
    """Harrell's c-index, from scratch (lifelines is not in the image).

    Fraction of admissible pairs whose predicted scores order the same way
    as the event times, with prediction ties counting 0.5 — the statistic
    `lifelines.utils.concordance_index` computes for the reference's
    survival scorer (scoring_utils.py:255-259). Higher predicted score ↔
    longer survival. Admissible pairs under right-censoring: the
    earlier time must be an observed event (a censored subject is only
    known to survive PAST its time, so it is unordered against anything
    later); equal-time pairs are admissible only between an event and a
    censored subject (the event is known to precede the censored one's
    unobserved event)."""
    t = np.asarray(event_times, np.float64)
    p = np.asarray(predicted_scores, np.float64)
    e = (np.ones(len(t), bool) if event_observed is None
         else np.asarray(event_observed).astype(bool))
    if len(t) != len(p) or len(t) != len(e):
        raise ValueError("event_times/predicted_scores/event_observed "
                         "lengths differ")
    num = den = 0.0
    for i in range(len(t)):
        if not e[i]:
            continue
        # subjects strictly later than an observed event at t[i], plus
        # censored subjects tied at t[i]
        later = (t > t[i]) | ((t == t[i]) & ~e)
        later[i] = False
        den += later.sum()
        num += (p[i] < p[later]).sum() + 0.5 * (p[i] == p[later]).sum()
        # event-event ties at the same time are inadmissible (no order is
        # known), matching the lifelines default
    return float(num / den) if den else float("nan")


def score_survival(optimize_metric: str, y_true, y_pred,
                   event_observed=None) -> float:
    """Survival scorer (reference scoring_utils.py:227-259 surface):
    c-index between true event times and predicted scores under
    right-censoring; `event_observed` 1 = event, 0 = censored."""
    if optimize_metric in ("cindex", "c_index", "risk_score",
                           "risk_score_capped"):
        return concordance_index(y_true, y_pred, event_observed)
    raise ValueError(f"unknown survival metric {optimize_metric}")
