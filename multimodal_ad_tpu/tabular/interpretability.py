"""Interpretability: feature attributions + sequential feature selection.

Capability parity with reference models/tabpfn-extensions/src/
tabpfn_extensions/interpretability/ (shap.py:47-311,
feature_selection.py:15-110): per-feature attribution values and
model-driven feature selection. The reference wraps the external `shap`
package (not in this image); this module implements

- `permutation_importance_values`: the model-agnostic permutation
  importance (parallel-friendly, repeats averaged) the reference's
  parallel_permutation_shap approximates,
- `marginal_contribution_values`: per-sample per-feature attribution by
  baseline substitution (a 1-step Shapley approximation: f(x) - f(x with
  feature j replaced by background mean)),
- `feature_selection`: sklearn SequentialFeatureSelector over any of our
  estimators (reference feature_selection.py semantics).
"""

from __future__ import annotations

import numpy as np
from sklearn.feature_selection import SequentialFeatureSelector

from .scoring import score_classification


def permutation_importance_values(estimator, X, y, metric: str = "roc_auc",
                                  n_repeats: int = 5, random_state: int = 0):
    """(n_features,) mean metric drop when each column is permuted."""
    X = np.asarray(X, np.float32)
    y = np.asarray(y)
    rng = np.random.default_rng(random_state)
    base = score_classification(metric, y, estimator.predict_proba(X))
    drops = np.zeros(X.shape[1])
    for j in range(X.shape[1]):
        vals = []
        for _ in range(n_repeats):
            Xp = X.copy()
            Xp[:, j] = rng.permutation(Xp[:, j])
            vals.append(base - score_classification(
                metric, y, estimator.predict_proba(Xp)))
        drops[j] = np.mean(vals)
    return drops


def marginal_contribution_values(estimator, X, background=None,
                                 class_index: int = 1):
    """(n_samples, n_features) attribution: probability change when feature
    j is replaced by its background mean."""
    X = np.asarray(X, np.float32)
    bg = (np.asarray(background, np.float32).mean(axis=0)
          if background is not None else X.mean(axis=0))
    p_full = estimator.predict_proba(X)[:, class_index]
    out = np.zeros_like(X)
    for j in range(X.shape[1]):
        Xj = X.copy()
        Xj[:, j] = bg[j]
        out[:, j] = p_full - estimator.predict_proba(Xj)[:, class_index]
    return out


def feature_selection(estimator, X, y, n_features_to_select: int = 5,
                      direction: str = "forward", cv: int = 3,
                      scoring: str = "roc_auc"):
    """Returns (support_mask, selector). Mirrors the reference's
    interpretability.feature_selection wrapper."""
    sfs = SequentialFeatureSelector(
        estimator, n_features_to_select=n_features_to_select,
        direction=direction, cv=cv, scoring=scoring)
    sfs.fit(np.asarray(X, np.float32), np.asarray(y))
    return sfs.get_support(), sfs
