"""Cross-validation significance testing.

Parity with reference utils/p-value.py:13-43: paired t-test + Wilcoxon
signed-rank over per-fold metric vectors of two models.
"""

from __future__ import annotations

import numpy as np
from scipy import stats


def compute_p_values(a, b):
    """Returns {'t_stat', 't_p', 'wilcoxon_stat', 'wilcoxon_p'} for paired
    per-fold metrics a vs b."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    if a.shape != b.shape:
        raise ValueError("paired vectors must have equal length")
    t_stat, t_p = stats.ttest_rel(a, b)
    try:
        w_stat, w_p = stats.wilcoxon(a, b)
    except ValueError:  # all-zero differences
        w_stat, w_p = 0.0, 1.0
    return {
        "t_stat": float(t_stat),
        "t_p": float(t_p),
        "wilcoxon_stat": float(w_stat),
        "wilcoxon_p": float(w_p),
    }
