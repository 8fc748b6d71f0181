"""Backend utilities (tabpfn_extensions.utils parity).

Capability parity with reference models/tabpfn-extensions/src/
tabpfn_extensions/utils.py: device resolution, estimator detection,
categorical-feature inference, numerically safe softmax, grid expansion.
The reference's dual local/client backend resolver maps here to
JAX platform selection (there is no remote-API backend to resolve).
"""

from __future__ import annotations

import itertools

import numpy as np


def get_device(device: str = "auto") -> str:
    """'auto' -> the best available JAX backend ('tpu' > 'gpu' > 'cpu')."""
    if device != "auto":
        return device
    import jax

    return jax.default_backend()


def is_icl_estimator(est) -> bool:
    """True for our in-context estimators (reference `is_tabpfn` analogue)."""
    from .icl import ICLClassifier
    from .regression import ICLRegressor

    return isinstance(est, (ICLClassifier, ICLRegressor))


def infer_categorical_features(X, max_unique: int = 10) -> list[int]:
    """Column indices that look categorical: few unique values, all
    integral (reference utils.py infer_categorical_features semantics)."""
    X = np.asarray(X)
    out = []
    for j in range(X.shape[1]):
        col = X[:, j]
        col = col[~np.isnan(col.astype(np.float64))]
        u = np.unique(col)
        if len(u) <= max_unique and np.allclose(u, np.round(u.astype(np.float64))):
            out.append(j)
    return out


def softmax(x, axis: int = -1) -> np.ndarray:
    x = np.asarray(x, np.float64)
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def product_dict(**kwargs):
    """Cartesian product of keyword lists as dicts
    (reference utils.py product_dict)."""
    keys = list(kwargs)
    for combo in itertools.product(*kwargs.values()):
        yield dict(zip(keys, combo))
