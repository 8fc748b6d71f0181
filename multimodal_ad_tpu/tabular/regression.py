"""In-context tabular regression + regressor wrappers.

The reference's tabular stack exports a regressor surface alongside the
classifier one (TabPFNRegressor, DecisionTree/RandomForest regressors,
AutoTabPFNRegressor, TunedTabPFNRegressor — reference
models/tabpfn-extensions/src/tabpfn_extensions/__init__.py:9-31).

`ICLRegressor` reuses the SAME meta-trained prior-fitted network as
ICLClassifier via target bucketing — the TabPFN v2 approach of modeling a
continuous target as a distribution over value buckets:

- fit(): z-score y, split it into `n_buckets` quantile buckets, relabel the
  context with bucket ids,
- predict(): bucket probabilities from the in-context forward, decoded as
  the expectation of per-bucket conditional means (Riemann decoding),
- no gradients at inference, exactly like the classifier.
"""

from __future__ import annotations

import numpy as np
from sklearn.base import BaseEstimator, RegressorMixin, clone
from sklearn.tree import DecisionTreeRegressor

from .icl import ICLClassifier


class ICLRegressor(RegressorMixin, BaseEstimator):
    def __init__(self, params=None, cfg=None, pretrain_steps: int = 300,
                 seed: int = 0, n_buckets: int = 8,
                 softmax_temperature: float = 1.0,
                 context_size: int | None = None,
                 preprocess: str | None = None):
        self.params = params
        self.cfg = cfg
        self.pretrain_steps = pretrain_steps
        self.seed = seed
        self.n_buckets = n_buckets
        self.softmax_temperature = softmax_temperature
        self.context_size = context_size
        self.preprocess = preprocess

    def fit(self, X, y):
        y = np.asarray(y, np.float64)
        self._mean, self._std = float(y.mean()), float(max(y.std(), 1e-9))
        z = (y - self._mean) / self._std

        from .icl import ICLConfig

        max_k = (self.cfg or ICLConfig()).max_classes
        k = min(self.n_buckets, max_k, max(2, len(np.unique(z))))
        # quantile bucket edges; strictly increasing
        edges = np.unique(np.quantile(z, np.linspace(0, 1, k + 1)[1:-1]))
        buckets = np.digitize(z, edges)
        # per-bucket conditional means are the decode values
        self._bucket_values = np.array([
            z[buckets == b].mean() if (buckets == b).any() else 0.0
            for b in range(len(edges) + 1)])

        self._clf = ICLClassifier(
            params=self.params, cfg=self.cfg,
            pretrain_steps=self.pretrain_steps, seed=self.seed,
            softmax_temperature=self.softmax_temperature,
            context_size=self.context_size, preprocess=self.preprocess)
        self._clf.fit(np.asarray(X, np.float32), buckets)
        return self

    def predict(self, X):
        proba = self._clf.predict_proba(X)  # columns follow clf.classes_
        vals = self._bucket_values[np.asarray(self._clf.classes_, int)]
        z_hat = proba @ vals
        return z_hat * self._std + self._mean

    def get_embeddings(self, X, data_source: str = "test"):
        return self._clf.get_embeddings(X, data_source)


class DecisionTreeICLRegressor(RegressorMixin, BaseEstimator):
    """Shallow regression tree with base regressors at the leaves
    (rf_pfn regressor parity)."""

    def __init__(self, estimator=None, max_depth: int = 2,
                 min_leaf_fit: int = 8, random_state: int = 0):
        self.estimator = estimator
        self.max_depth = max_depth
        self.min_leaf_fit = min_leaf_fit
        self.random_state = random_state

    def fit(self, X, y):
        X = np.asarray(X, np.float32)
        y = np.asarray(y, np.float64)
        self.tree_ = DecisionTreeRegressor(
            max_depth=self.max_depth, random_state=self.random_state,
            min_samples_leaf=max(2, self.min_leaf_fit // 2))
        self.tree_.fit(X, y)
        leaves = self.tree_.apply(X)
        self.leaf_models_ = {}
        self.leaf_means_ = {}
        for leaf in np.unique(leaves):
            m = leaves == leaf
            self.leaf_means_[int(leaf)] = float(y[m].mean())
            if m.sum() >= self.min_leaf_fit and np.std(y[m]) > 1e-12:
                est = (clone(self.estimator) if self.estimator is not None
                       else DecisionTreeRegressor(max_depth=3))
                est.fit(X[m], y[m])
                self.leaf_models_[int(leaf)] = est
        return self

    def predict(self, X):
        X = np.asarray(X, np.float32)
        leaves = self.tree_.apply(X)
        out = np.zeros(len(X))
        for leaf in np.unique(leaves):
            m = leaves == leaf
            model = self.leaf_models_.get(int(leaf))
            out[m] = (self.leaf_means_.get(int(leaf), 0.0) if model is None
                      else model.predict(X[m]))
        return out


class RandomForestICLRegressor(RegressorMixin, BaseEstimator):
    def __init__(self, estimator=None, n_estimators: int = 4,
                 max_depth: int = 2, min_leaf_fit: int = 8,
                 bootstrap: bool = True, random_state: int = 0):
        self.estimator = estimator
        self.n_estimators = n_estimators
        self.max_depth = max_depth
        self.min_leaf_fit = min_leaf_fit
        self.bootstrap = bootstrap
        self.random_state = random_state

    def fit(self, X, y):
        X = np.asarray(X, np.float32)
        y = np.asarray(y, np.float64)
        rng = np.random.default_rng(self.random_state)
        self.trees_ = []
        for t in range(self.n_estimators):
            idx = (rng.integers(0, len(X), len(X)) if self.bootstrap
                   else np.arange(len(X)))
            tree = DecisionTreeICLRegressor(
                estimator=self.estimator, max_depth=self.max_depth,
                min_leaf_fit=self.min_leaf_fit,
                random_state=self.random_state + t)
            tree.fit(X[idx], y[idx])
            self.trees_.append(tree)
        return self

    def predict(self, X):
        return np.mean([t.predict(X) for t in self.trees_], axis=0)


class TunedICLRegressor(RegressorMixin, BaseEstimator):
    """Random-search tuned regressor (TunedTabPFNRegressor parity)."""

    def __init__(self, base_estimator=None, n_trials: int = 10,
                 metric: str = "rmse", n_splits: int = 3,
                 random_state: int = 0):
        self.base_estimator = base_estimator
        self.n_trials = n_trials
        self.metric = metric
        self.n_splits = n_splits
        self.random_state = random_state

    def fit(self, X, y):
        from sklearn.model_selection import KFold

        from .scoring import score_regression

        X = np.asarray(X, np.float32)
        y = np.asarray(y, np.float64)
        rng = np.random.default_rng(self.random_state)
        kf = KFold(n_splits=self.n_splits, shuffle=True,
                   random_state=self.random_state)
        best_score, best_trial = np.inf, None
        for _ in range(self.n_trials):
            trial = {
                "n_buckets": int(rng.choice([4, 8, 16])),
                "softmax_temperature": float(rng.choice([0.75, 1.0, 1.25])),
                "seed": int(rng.integers(0, 10_000)),
                "preprocess": [None, None, "quantile", "whiten"][
                    int(rng.integers(0, 4))],
            }
            scores = []
            for tr, vl in kf.split(X):
                est = self._make(trial).fit(X[tr], y[tr])
                scores.append(score_regression(self.metric, y[vl],
                                               est.predict(X[vl])))
            score = float(np.mean(scores))
            if score < best_score:  # rmse/mse/mae: lower is better
                best_score, best_trial = score, trial
        self.best_params_ = best_trial
        self.best_score_ = best_score
        self.best_estimator_ = self._make(best_trial).fit(X, y)
        return self

    def _make(self, trial):
        if self.base_estimator is not None:
            est = clone(self.base_estimator)
            est.set_params(**{k: v for k, v in trial.items()
                              if k in est.get_params()})
            return est
        return ICLRegressor(n_buckets=trial["n_buckets"],
                            softmax_temperature=trial["softmax_temperature"],
                            seed=trial["seed"],
                            preprocess=trial.get("preprocess"))

    def predict(self, X):
        return self.best_estimator_.predict(X)
