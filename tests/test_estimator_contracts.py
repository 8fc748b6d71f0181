"""Reusable estimator-contract suite over every tabular estimator.

Mirrors the reference test architecture's BaseClassifierTests /
BaseRegressorTests pattern (reference models/tabpfn-extensions/tests/
test_base_tabpfn.py:25+): one contract suite, parametrized over all
concrete estimators — fit/predict shape+type checks, predict-before-fit
errors, clone-ability, probability normalization.
"""

import numpy as np
import pytest
from sklearn.base import clone
from sklearn.linear_model import LogisticRegression

from multimodal_ad_tpu.tabular import (AutoICLClassifier,
                                       DecisionTreeICLClassifier,
                                       DecisionTreeICLRegressor,
                                       ICLClassifier, ICLConfig,
                                       ICLRegressor, ManyClassClassifier,
                                       RandomForestICLClassifier,
                                       RandomForestICLRegressor,
                                       TunedICLClassifier, TunedICLRegressor,
                                       pretrain_icl)

TINY = ICLConfig(d_model=32, n_heads=2, n_layers=2, d_ff=64,
                 max_features=12, max_classes=4, max_context=64)


@pytest.fixture(scope="module")
def tiny_params():
    params, _ = pretrain_icl(TINY, steps=250, batch=16, n_ctx=48, n_qry=16,
                             lr=1e-3, seed=0)
    return params


@pytest.fixture(scope="module")
def tiny_reg_net():
    from multimodal_ad_tpu.tabular.icl_regression import (
        RegICLConfig, pretrain_icl_regression)

    cfg = RegICLConfig(d_model=32, n_heads=2, n_layers=2, d_ff=64,
                       max_features=12, max_context=64, n_bins=16)
    params, _ = pretrain_icl_regression(cfg, steps=300, batch=16, n_ctx=48,
                                        n_qry=16, lr=1e-3, seed=0, chunk=100)
    return params, cfg


def classifier_instances(tiny_params):
    icl = ICLClassifier(params=tiny_params, cfg=TINY)
    return [
        ("ICLClassifier", icl),
        ("DecisionTreeICL", DecisionTreeICLClassifier(
            LogisticRegression(max_iter=200))),
        ("RandomForestICL", RandomForestICLClassifier(
            LogisticRegression(max_iter=200), n_estimators=2)),
        ("ManyClass", ManyClassClassifier(
            LogisticRegression(max_iter=200), alphabet_size=10)),
        ("TunedICL", TunedICLClassifier(base_estimator=icl, n_trials=2,
                                        n_splits=2)),
        ("AutoICL", AutoICLClassifier(base_estimator=icl, n_configs=2)),
    ]


def regressor_instances(tiny_reg_net):
    params, cfg = tiny_reg_net
    icl = ICLRegressor(params=params, cfg=cfg)
    return [
        ("ICLRegressor", icl),
        ("DTICLRegressor", DecisionTreeICLRegressor()),
        ("RFICLRegressor", RandomForestICLRegressor(n_estimators=2)),
        ("TunedICLRegressor", TunedICLRegressor(base_estimator=icl,
                                                n_trials=2, n_splits=2)),
    ]


def cls_data(seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, 80)
    X = (rng.normal(size=(80, 6)) + 2.0 * y[:, None]).astype(np.float32)
    return X, y


def reg_data(seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(80, 6)).astype(np.float32)
    return X, X[:, 0] * 2.0 + 0.1 * rng.normal(size=80)


@pytest.mark.slow
class TestClassifierContracts:
    def test_all(self, tiny_params):
        X, y = cls_data()
        for name, est in classifier_instances(tiny_params):
            est = clone(est)  # clone-ability is part of the contract
            est.fit(X[:60], y[:60])
            pred = est.predict(X[60:])
            assert pred.shape == (20,), name
            assert set(np.unique(pred)) <= set(np.unique(y)), name
            proba = est.predict_proba(X[60:])
            assert proba.shape == (20, 2), name
            np.testing.assert_allclose(proba.sum(axis=1), 1.0, rtol=1e-5,
                                       err_msg=name)
            assert (proba >= 0).all(), name
            # classes_ attribute present and consistent
            assert hasattr(est, "classes_"), name
            acc = (pred == y[60:]).mean()
            assert acc > 0.5, (name, acc)

    def test_predict_before_fit_raises(self, tiny_params):
        for name, est in classifier_instances(tiny_params):
            with pytest.raises(Exception):
                clone(est).predict(np.zeros((2, 6), np.float32))


@pytest.mark.slow
class TestRegressorContracts:
    def test_all(self, tiny_reg_net):
        X, y = reg_data()
        for name, est in regressor_instances(tiny_reg_net):
            est = clone(est)
            est.fit(X[:60], y[:60])
            pred = est.predict(X[60:])
            assert pred.shape == (20,), name
            assert np.isfinite(pred).all(), name
            # better than predicting the mean
            mse = np.mean((pred - y[60:]) ** 2)
            base = np.mean((y[:60].mean() - y[60:]) ** 2)
            assert mse < base, (name, mse, base)

    def test_predict_before_fit_raises(self, tiny_reg_net):
        for name, est in regressor_instances(tiny_reg_net):
            with pytest.raises(Exception):
                clone(est).predict(np.zeros((2, 6), np.float32))
