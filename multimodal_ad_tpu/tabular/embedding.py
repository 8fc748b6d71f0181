"""K-fold out-of-fold embedding harness.

Exact semantics of the reference's TabPFNEmbedding
(reference models/tabpfn-extensions/src/tabpfn_extensions/embedding/
tabpfn_embedding.py:124-143, per arXiv:2502.17361):

- n_fold == 0: fit on the full train set; embeddings for the requested
  split come from that single fit,
- n_fold >= 2 and data_source == 'train': KFold(shuffle=False) over the
  train set; fit on k-1 folds, embed the held-out fold as 'test' data,
  concatenate along the sample axis (axis=1 of the (n_estimators, n, d)
  stack),
- n_fold >= 2 and data_source == 'test': single full fit,
- n_fold == 1: error.

The embedder is pluggable: anything with fit(X, y) and
get_embeddings(X, data_source) -> (n_estimators, n, d) — our ICLClassifier,
a future converted-weights TabPFN, or a bridge — satisfies it.
"""

from __future__ import annotations

import numpy as np
from sklearn.model_selection import KFold


class OoFEmbedding:
    def __init__(self, embedder=None, n_fold: int = 0):
        self.model = embedder
        self.n_fold = n_fold

    def fit(self, X_train, y_train):
        if self.model is None:
            raise ValueError("No model has been set.")
        self.model.fit(X_train, y_train)

    def get_embeddings(self, X_train, y_train, X, data_source: str):
        if self.model is None:
            raise ValueError("No model has been set.")
        X_train = np.asarray(X_train)
        y_train = np.asarray(y_train)
        X = np.asarray(X)

        if self.n_fold == 0:
            self.model.fit(X_train, y_train)
            return np.asarray(self.model.get_embeddings(X, data_source=data_source))
        if self.n_fold >= 2:
            if data_source == "test":
                self.model.fit(X_train, y_train)
                return np.asarray(
                    self.model.get_embeddings(X, data_source=data_source))
            kf = KFold(n_splits=self.n_fold, shuffle=False)
            embeddings = []
            for tr_idx, val_idx in kf.split(X_train):
                self.model.fit(X_train[tr_idx], y_train[tr_idx])
                embeddings.append(np.asarray(
                    self.model.get_embeddings(X_train[val_idx],
                                              data_source="test")))
            return np.concatenate(embeddings, axis=1)
        raise ValueError("n_fold must be greater than 1.")


# Alias mirroring the reference export name
TabPFNEmbedding = OoFEmbedding
