"""In-context regression surface + backend utils."""

import numpy as np
import pytest
from sklearn.linear_model import LinearRegression

from multimodal_ad_tpu.tabular.regression import (DecisionTreeICLRegressor,
                                                  ICLRegressor,
                                                  RandomForestICLRegressor,
                                                  TunedICLRegressor)
from multimodal_ad_tpu.tabular.utils import (get_device,
                                             infer_categorical_features,
                                             is_icl_estimator, product_dict,
                                             softmax)


def linear_task(n=200, f=4, noise=0.1, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n, f)).astype(np.float32)
    w = rng.normal(size=f)
    y = X @ w + noise * rng.normal(size=n)
    return X, y


@pytest.fixture(scope="module")
def tiny_reg():
    from multimodal_ad_tpu.tabular.icl_regression import (
        RegICLConfig, pretrain_icl_regression)

    cfg = RegICLConfig(d_model=32, n_heads=2, n_layers=2, d_ff=64,
                       max_features=16, max_context=128, n_bins=16)
    params, _ = pretrain_icl_regression(cfg, steps=400, batch=16, n_ctx=64,
                                        n_qry=16, lr=1e-3, seed=1, chunk=100)
    return params, cfg


@pytest.mark.slow
class TestICLRegressor:
    def test_beats_mean_baseline(self, tiny_reg):
        params, cfg = tiny_reg
        X, y = linear_task(n=180, seed=2)
        reg = ICLRegressor(params=params, cfg=cfg)
        reg.fit(X[:120], y[:120])
        pred = reg.predict(X[120:])
        mse = np.mean((pred - y[120:]) ** 2)
        base = np.mean((y[:120].mean() - y[120:]) ** 2)
        assert mse < 0.6 * base, (mse, base)

    def test_target_scale_invariance(self, tiny_reg):
        params, cfg = tiny_reg
        X, y = linear_task(n=120, seed=3)
        r1 = ICLRegressor(params=params, cfg=cfg, preprocess=None).fit(X, y)
        r2 = ICLRegressor(params=params, cfg=cfg,
                          preprocess=None).fit(X, y * 100 + 7)
        np.testing.assert_allclose(r2.predict(X[:10]),
                                   r1.predict(X[:10]) * 100 + 7, rtol=1e-4)

    def test_quantile_decoding_monotone(self, tiny_reg):
        """Bar-CDF quantile decoding: q10 <= median <= q90, and the median
        output_type matches quantiles=[0.5]."""
        params, cfg = tiny_reg
        X, y = linear_task(n=150, seed=8)
        reg = ICLRegressor(params=params, cfg=cfg,
                           preprocess=None).fit(X[:100], y[:100])
        q10, q50, q90 = reg.predict(X[100:], output_type="quantiles",
                                    quantiles=[0.1, 0.5, 0.9])
        med = reg.predict(X[100:], output_type="median")
        assert (q10 <= q50 + 1e-9).all() and (q50 <= q90 + 1e-9).all()
        np.testing.assert_allclose(med, q50)

    def test_pairs_preprocess_reads_product_target(self, tiny_reg):
        """preprocess='pairs' screens a continuous target against product
        candidates (rank-rank correlation): y = x0*x1 becomes a directly
        readable column, which plain z-scored features cannot express.
        n_estimators=1 isolates the transform under test: the tiny fixture
        network is too small to be permutation-robust, so averaging
        feature-permuted views (harmless on the bundled asset) would
        dilute its one strong view and blur the comparison."""
        params, cfg = tiny_reg
        rng = np.random.default_rng(11)
        X = rng.normal(size=(220, 5)).astype(np.float32)
        y = X[:, 0] * X[:, 1] + 0.05 * rng.normal(size=220)
        tr, te = np.arange(160), np.arange(160, 220)
        mse = {}
        for kind in (None, "pairs"):
            reg = ICLRegressor(params=params, cfg=cfg, preprocess=kind,
                               n_estimators=1).fit(X[tr], y[tr])
            mse[kind] = float(np.mean((reg.predict(X[te]) - y[te]) ** 2))
        base = float(np.mean((y[tr].mean() - y[te]) ** 2))
        # margin sized for the tiny fixture net, which spends capacity on
        # the appended sign column (a binary distractor for a CONTINUOUS
        # product target); the bundled asset reaches R^2 ~0.93 here and the
        # ordering assertions below are the substance of the test
        assert mse["pairs"] < 0.62 * base, (mse, base)
        assert mse["pairs"] < 0.75 * mse[None], mse

    def test_extreme_quantiles_stay_ordered(self, tiny_reg):
        """q=1.0 must decode the TOP of the bar support, not wrap to the
        minimum when float rounding leaves cdf[-1] fractionally below 1
        (regression: argmax over an all-False crossing row returned 0)."""
        params, cfg = tiny_reg
        X, y = linear_task(n=80, seed=12)
        reg = ICLRegressor(params=params, cfg=cfg, preprocess=None).fit(X, y)
        q0, q50, q1 = reg.predict(X[:10], output_type="quantiles",
                                  quantiles=[0.0, 0.5, 1.0])
        assert (q0 <= q50 + 1e-9).all() and (q50 <= q1 + 1e-9).all()
        # the extreme quantiles must actually bracket the median by the
        # support, not collapse onto the bottom edge
        assert (q1 > q0).all()

    def test_embeddings_shape(self, tiny_reg):
        params, cfg = tiny_reg
        X, y = linear_task(n=60, seed=4)
        reg = ICLRegressor(params=params, cfg=cfg).fit(X, y)
        assert reg.get_embeddings(X[:5]).shape == (1, 5, cfg.d_model)


class TestTreeRegressors:
    def test_dt_regressor(self):
        X, y = linear_task(n=300, seed=5)
        reg = DecisionTreeICLRegressor(LinearRegression(), max_depth=2)
        reg.fit(X[:200], y[:200])
        mse = np.mean((reg.predict(X[200:]) - y[200:]) ** 2)
        assert mse < 0.1  # leaf linear models recover the linear fn

    def test_rf_regressor(self):
        X, y = linear_task(n=300, seed=6)
        reg = RandomForestICLRegressor(LinearRegression(), n_estimators=3)
        reg.fit(X[:200], y[:200])
        mse = np.mean((reg.predict(X[200:]) - y[200:]) ** 2)
        assert mse < 0.2

    def test_constant_leaf_fallback(self):
        X = np.zeros((20, 2), np.float32)
        y = np.ones(20)
        reg = DecisionTreeICLRegressor().fit(X, y)
        np.testing.assert_allclose(reg.predict(X), 1.0)


@pytest.mark.slow
class TestTunedRegressor:
    def test_tuning_runs_and_predicts(self, tiny_reg):
        params, cfg = tiny_reg
        X, y = linear_task(n=120, seed=7)
        base = ICLRegressor(params=params, cfg=cfg)
        reg = TunedICLRegressor(base_estimator=base, n_trials=3, n_splits=2)
        reg.fit(X[:90], y[:90])
        # best_params_ None = the selection guard kept the default config,
        # a legitimate outcome (hpo.guarded_selection); the contract is
        # that fit completes, the score is real, and predict works
        assert reg.best_params_ is None or isinstance(reg.best_params_, dict)
        assert np.isfinite(reg.best_score_)
        assert reg.predict(X[90:]).shape == (30,)


class TestBackendUtils:
    def test_get_device(self):
        assert get_device("cpu") == "cpu"
        assert get_device("auto") in ("cpu", "tpu", "gpu")

    def test_infer_categorical(self):
        X = np.column_stack([
            np.random.default_rng(0).normal(size=50),
            np.random.default_rng(0).integers(0, 3, 50).astype(float),
        ])
        assert infer_categorical_features(X) == [1]

    def test_softmax_stable(self):
        p = softmax(np.array([[1000.0, 1000.0]]))
        np.testing.assert_allclose(p, [[0.5, 0.5]])

    def test_product_dict(self):
        combos = list(product_dict(a=[1, 2], b=["x"]))
        assert combos == [{"a": 1, "b": "x"}, {"a": 2, "b": "x"}]

    def test_is_icl(self, ):
        from multimodal_ad_tpu.tabular.icl import ICLClassifier

        assert is_icl_estimator(ICLClassifier())
        assert not is_icl_estimator(LinearRegression())
