"""ICL backend quality benchmark: in-context learner vs classic baselines.

Quantifies the claim that the from-scratch prior-fitted transformer
(tabular/icl.py + bundled meta-trained asset) is a usable TabPFN-backend
substitute (SURVEY.md §7.3 option b). Runs seeded, CPU-only comparisons of

  ICL           — ICLClassifier with the bundled default asset
  AutoICL       — Caruana greedy posthoc ensemble over ICL configs
  TunedICL      — seeded random-search HPO over ICL inference params
  LogReg / SVM-RBF / GradBoost — sklearn baselines

on six synthetic table families (cluster, nonlinear-XOR, mixed-type,
imbalanced, correlated, many-class via ECOC), 3 seeds each, plus the
reference's actual use: OoF embeddings + linear SVM vs raw + linear SVM
(reference tabel_test.py:166-185).

Writes benchmarks/ICL_QUALITY.md. Usage: python benchmarks/icl_quality.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU-only by design: many small, shape-varied ICL fits would each trigger a
# remote compile on the hosted TPU tunnel. The env var alone is ignored by
# the hosted plugin (CLAUDE.md), so force via config before any jax use.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

SEEDS = (0, 1, 2)
N = 360  # samples per dataset (train 2/3, test 1/3)


# ---------------------------------------------------------------------------
# dataset families
# ---------------------------------------------------------------------------

def family_cluster(rng, n=N):
    y = rng.integers(0, 2, n)
    X = rng.normal(size=(n, 8)) + 1.2 * y[:, None] * rng.normal(
        0.8, 0.3, size=8)
    return X.astype(np.float32), y


def family_nonlinear(rng, n=N):
    """XOR of two features — linearly inseparable."""
    X = rng.normal(size=(n, 6))
    y = ((X[:, 0] > 0) ^ (X[:, 1] > 0)).astype(int)
    X[:, 2:] = rng.normal(size=(n, 4))  # distractors
    return X.astype(np.float32), y


def family_mixed(rng, n=N):
    """Numeric + integer-coded categoricals interacting with the label."""
    y = rng.integers(0, 2, n)
    num = rng.normal(size=(n, 4)) + 0.8 * y[:, None]
    cat = rng.integers(0, 3, size=(n, 3)).astype(np.float64)
    cat[:, 0] = np.where(y == 1, rng.integers(1, 3, n), rng.integers(0, 2, n))
    return np.concatenate([num, cat], 1).astype(np.float32), y


def family_imbalanced(rng, n=N):
    """~8% positive class."""
    y = (rng.random(n) < 0.08).astype(int)
    y[:4] = 1
    X = rng.normal(size=(n, 8)) + 1.5 * y[:, None]
    return X.astype(np.float32), y


def family_correlated(rng, n=N):
    """Signal hidden in a difference of two highly correlated features."""
    base = rng.normal(size=(n, 1))
    X = np.concatenate([base + 0.05 * rng.normal(size=(n, 1)),
                        base - 0.05 * rng.normal(size=(n, 1)),
                        rng.normal(size=(n, 6))], 1)
    y = (X[:, 0] - X[:, 1] > 0).astype(int)
    return X.astype(np.float32), y


def family_many_class(rng, n=N):
    """6 classes — exceeds a small alphabet, exercises ECOC wrapping."""
    y = rng.integers(0, 6, n)
    centers = rng.normal(0, 2.0, size=(6, 8))
    X = centers[y] + rng.normal(0, 0.9, size=(n, 8))
    return X.astype(np.float32), y


FAMILIES = {
    "cluster": family_cluster,
    "nonlinear-xor": family_nonlinear,
    "mixed-type": family_mixed,
    "imbalanced-8pct": family_imbalanced,
    "correlated": family_correlated,
    "many-class-6": family_many_class,
}


# ---------------------------------------------------------------------------
# models
# ---------------------------------------------------------------------------

def make_models(n_classes):
    from sklearn.ensemble import GradientBoostingClassifier
    from sklearn.linear_model import LogisticRegression
    from sklearn.pipeline import make_pipeline
    from sklearn.preprocessing import StandardScaler
    from sklearn.svm import SVC

    from multimodal_ad_tpu.tabular.ensembles import AutoICLClassifier
    from multimodal_ad_tpu.tabular.hpo import TunedICLClassifier
    from multimodal_ad_tpu.tabular.icl import ICLClassifier
    from multimodal_ad_tpu.tabular.many_class import ManyClassClassifier

    def icl():
        base = ICLClassifier()
        if n_classes > base._cfg.max_classes:
            return ManyClassClassifier(base)
        return base

    models = {
        "ICL": icl(),
        "LogReg": make_pipeline(StandardScaler(),
                                LogisticRegression(max_iter=1000)),
        "SVM-RBF": make_pipeline(StandardScaler(), SVC(probability=True)),
        "GradBoost": GradientBoostingClassifier(random_state=0),
    }
    if n_classes <= 2:  # ensemble/HPO wrappers benchmarked on binary tasks
        models["AutoICL"] = AutoICLClassifier(n_configs=6, random_state=0)
        models["TunedICL"] = TunedICLClassifier(n_trials=8, random_state=0)
    return models


def score(model, Xtr, ytr, Xte, yte):
    from sklearn.metrics import accuracy_score, roc_auc_score

    model.fit(Xtr, ytr)
    acc = accuracy_score(yte, model.predict(Xte))
    try:
        proba = model.predict_proba(Xte)
        if proba.shape[1] == 2:
            auc = roc_auc_score(yte, proba[:, 1])
        else:
            auc = roc_auc_score(yte, proba, multi_class="ovr")
    except Exception:
        auc = float("nan")
    return acc, auc


# ---------------------------------------------------------------------------
# regression families (ICLRegressor = bucket decoding over the same network)
# ---------------------------------------------------------------------------

def reg_linear(rng, n=N):
    X = rng.normal(size=(n, 6)).astype(np.float32)
    w = rng.normal(size=6)
    y = X @ w + 0.1 * rng.normal(size=n)
    return X, y.astype(np.float64)


def reg_sine(rng, n=N):
    """Smooth nonlinear surface."""
    X = rng.normal(size=(n, 4)).astype(np.float32)
    y = np.sin(1.5 * X[:, 0]) + 0.5 * X[:, 1] ** 2 + 0.1 * rng.normal(size=n)
    return X, y.astype(np.float64)


def reg_correlated(rng, n=N):
    """Target in the low-variance residual of two correlated features."""
    base = rng.normal(size=(n, 1))
    X = np.concatenate([base + 0.05 * rng.normal(size=(n, 1)),
                        base - 0.05 * rng.normal(size=(n, 1)),
                        rng.normal(size=(n, 4))], 1).astype(np.float32)
    y = 3.0 * (X[:, 0] - X[:, 1]) + 0.05 * rng.normal(size=n)
    return X, y.astype(np.float64)


REG_FAMILIES = {
    "linear": reg_linear,
    "sine-nonlinear": reg_sine,
    "correlated": reg_correlated,
}


def make_regressors():
    from sklearn.ensemble import GradientBoostingRegressor
    from sklearn.linear_model import Ridge
    from sklearn.pipeline import make_pipeline
    from sklearn.preprocessing import StandardScaler

    from multimodal_ad_tpu.tabular.regression import (ICLRegressor,
                                                      TunedICLRegressor)

    return {
        "ICLReg": ICLRegressor(),
        "TunedICLReg": TunedICLRegressor(n_trials=6, random_state=0),
        "Ridge": make_pipeline(StandardScaler(), Ridge()),
        "GradBoostReg": GradientBoostingRegressor(random_state=0),
    }


# The reference's downstream head is a LINEAR SVM (tabel_test.py:166-185):
# on a linearly-separable family (cluster) raw features are already
# near-optimal for it, so embeddings can only tie there. The nonlinear
# families are where the embeddings must EARN the pipeline: raw + linear
# SVM is structurally blind to XOR and to the low-variance difference
# direction of the correlated family.
EMB_FAMILIES = ("cluster", "nonlinear-xor", "correlated")


def embeddings_vs_raw(family, seed):
    """The reference's actual use: OoF ICL embeddings + linear SVM vs
    raw features + linear SVM (reference tabel_test.py:166-185)."""
    from sklearn.model_selection import train_test_split
    from sklearn.pipeline import make_pipeline
    from sklearn.preprocessing import StandardScaler
    from sklearn.svm import SVC

    from multimodal_ad_tpu.tabular.embedding import (EnsembleICLEmbedder,
                                                     OoFEmbedding)

    rng = np.random.default_rng(seed)
    X, y = FAMILIES[family](rng)
    Xtr, Xte, ytr, yte = train_test_split(X, y, test_size=1 / 3,
                                          random_state=seed, stratify=y)
    # the production default of the tabel_encoder pipelines: the
    # preprocess/seed-diverse ensemble embedder with 'rich' members
    emb = OoFEmbedding(EnsembleICLEmbedder(), n_fold=5)
    tr_emb = emb.get_embeddings(Xtr, ytr, Xte, "train")[0]
    te_emb = emb.get_embeddings(Xtr, ytr, Xte, "test")[0]

    def svm_acc(a, b):
        clf = make_pipeline(StandardScaler(), SVC(kernel="linear"))
        clf.fit(a, ytr)
        return float((clf.predict(b) == yte).mean())

    return svm_acc(tr_emb, te_emb), svm_acc(Xtr, Xte)


def main():
    from sklearn.model_selection import train_test_split

    results = {}  # {family: {model: [(acc, auc), ...]}}
    for fam, gen in FAMILIES.items():
        for seed in SEEDS:
            rng = np.random.default_rng(seed)
            X, y = gen(rng)
            Xtr, Xte, ytr, yte = train_test_split(
                X, y, test_size=1 / 3, random_state=seed, stratify=y)
            models = make_models(len(np.unique(y)))
            for name, model in models.items():
                t0 = time.time()
                acc, auc = score(model, Xtr, ytr, Xte, yte)
                results.setdefault(fam, {}).setdefault(name, []).append(
                    (acc, auc))
                print(f"{fam:16s} seed{seed} {name:9s} "
                      f"acc={acc:.3f} auc={auc:.3f} ({time.time()-t0:.1f}s)",
                      flush=True)

    reg_results = {}  # {family: {model: [r2, ...]}}
    from sklearn.metrics import r2_score
    for fam, gen in REG_FAMILIES.items():
        for seed in SEEDS:
            rng = np.random.default_rng(seed)
            X, y = gen(rng)
            Xtr, Xte, ytr, yte = train_test_split(
                X, y, test_size=1 / 3, random_state=seed)
            for name, model in make_regressors().items():
                t0 = time.time()
                model.fit(Xtr, ytr)
                r2 = r2_score(yte, model.predict(Xte))
                reg_results.setdefault(fam, {}).setdefault(name, []).append(r2)
                print(f"reg/{fam:14s} seed{seed} {name:12s} r2={r2:.3f} "
                      f"({time.time()-t0:.1f}s)", flush=True)

    emb_rows = {}  # {family: [(emb_acc, raw_acc), ...]}
    for fam in EMB_FAMILIES:
        for s in SEEDS:
            e, r = embeddings_vs_raw(fam, s)
            emb_rows.setdefault(fam, []).append((e, r))
            print(f"emb/{fam:14s} seed{s} emb={e:.3f} raw={r:.3f}",
                  flush=True)

    # ---- render markdown ----
    model_order = ["ICL", "AutoICL", "TunedICL", "LogReg", "SVM-RBF",
                   "GradBoost"]
    lines = [
        "# ICL backend quality benchmark",
        "",
        "Seeded CPU comparison of the in-context learner (bundled default "
        "asset) against sklearn baselines on six synthetic table families "
        "(3 seeds each, 240/120 train/test). Regenerate with "
        "`python benchmarks/icl_quality.py`.",
        "",
        "## Accuracy (mean over seeds; AUC in parens)",
        "",
        "| family | " + " | ".join(model_order) + " |",
        "|---|" + "---|" * len(model_order),
    ]
    for fam in FAMILIES:
        cells = []
        for m in model_order:
            vals = results[fam].get(m)
            if not vals:
                cells.append("—")
                continue
            acc = np.mean([v[0] for v in vals])
            auc = np.nanmean([v[1] for v in vals])
            cells.append(f"{acc:.3f} ({auc:.3f})")
        lines.append(f"| {fam} | " + " | ".join(cells) + " |")

    reg_order = ["ICLReg", "TunedICLReg", "Ridge", "GradBoostReg"]
    lines += [
        "",
        "## Regression R² (mean over seeds; ICLRegressor = the dedicated "
        "bar-distribution network, tabular/icl_regression.py)",
        "",
        "| family | " + " | ".join(reg_order) + " |",
        "|---|" + "---|" * len(reg_order),
    ]
    for fam in REG_FAMILIES:
        cells = [f"{np.mean(reg_results[fam][m]):.3f}" for m in reg_order]
        lines.append(f"| {fam} | " + " | ".join(cells) + " |")
    lines += [
        "",
        "The Tuned wrappers carry the selection-bias guard "
        "(tabular/hpo.py::guarded_selection): the default config is kept "
        "unless a trial beats it by more than paired-CV noise, so Tuned "
        "tracks plain ICL exactly on families where nothing helps; a "
        "guard-adopted trial can still land within test-set granularity "
        "of the default on held-out data (CV selects in expectation, not "
        "per draw).",
    ]

    lines += [
        "",
        "## Embeddings + linear SVM vs raw + linear SVM "
        "(reference tabel_test.py:166-185 use case)",
        "",
        "Mean accuracy over the 3 seeds. The downstream head is LINEAR, so "
        "raw features are already near-optimal on the linearly-separable "
        "cluster family; the nonlinear families measure what the "
        "embeddings actually add.",
        "",
        "| family | OoF-embeddings + SVM | raw + SVM |",
        "|---|---|---|",
    ]
    for fam in EMB_FAMILIES:
        e = np.mean([e for e, _ in emb_rows[fam]])
        r = np.mean([r for _, r in emb_rows[fam]])
        lines.append(f"| {fam} | {e:.3f} | {r:.3f} |")
    lines.append("")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ICL_QUALITY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print("\nwrote", out)


if __name__ == "__main__":
    main()
