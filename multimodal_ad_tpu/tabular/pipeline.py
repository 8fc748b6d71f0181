"""Tabular embedding pipelines (tabel_test.py parity).

- `tabel_encoder`: binary task; label column in the output CSVs is the
  integer class (reference tabel_test.py:22-83),
- `tabel_encoder_multi`: any class list; label column keeps the ORIGINAL
  string labels (reference tabel_test.py:85-162),
- `quick_eval_from_saved`: StandardScaler + linear SVM accuracy
  (reference tabel_test.py:166-185).

Output CSV schema: first column 'label', then embedding dims named
0..d-1 (pandas default int headers) — the shipped artifacts' layout
(reference train_embeddings.csv / test_embeddings.csv).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from sklearn.model_selection import train_test_split

from ..data.tabular import load_adni_data_binary
from .embedding import OoFEmbedding


def _default_embedder(**kw):
    # the shipped embedding path is the diversity ensemble — measured
    # +4.3 ACC points over a single auto-preprocess fit on the reference's
    # clinical table (benchmarks/ADNI_TABULAR.md); pass embedder= to the
    # encoders for a single-model or custom path
    from .embedding import EnsembleICLEmbedder
    return EnsembleICLEmbedder(**kw)


def tabel_encoder(csv_path: str, start_col: int = 14, class0: str = "AD",
                  class1: str = "CN", n_fold: int = 5, test_size: float = 0.3,
                  random_state: int = 42,
                  train_out: str = "train_embeddings.csv",
                  test_out: str = "test_embeddings.csv", embedder=None):
    X, y = load_adni_data_binary(csv_path, start_col=start_col,
                                 class0=class0, class1=class1)
    X_tr, X_te, y_tr, y_te = train_test_split(
        X, y, test_size=test_size, random_state=random_state)

    embed = OoFEmbedding(embedder or _default_embedder(), n_fold=n_fold)
    train_emb = embed.get_embeddings(X_tr, y_tr, X_te, data_source="train")[0]
    test_emb = embed.get_embeddings(X_tr, y_tr, X_te, data_source="test")[0]

    train_df = pd.DataFrame(train_emb)
    train_df.insert(0, "label", y_tr)
    train_df.to_csv(train_out, index=False)
    test_df = pd.DataFrame(test_emb)
    test_df.insert(0, "label", y_te)
    test_df.to_csv(test_out, index=False)
    return train_out, test_out


def tabel_encoder_multi(csv_path: str, start_col: int = 14,
                        label_col: str = "GROUP",
                        classes: list | None = None, n_fold: int = 5,
                        test_size: float = 0.3, random_state: int = 42,
                        train_out: str = "train_embeddings.csv",
                        test_out: str = "test_embeddings.csv", embedder=None):
    classes = classes or ["CN", "AD"]
    df = pd.read_csv(csv_path, dtype={label_col: str})
    df = df[df[label_col].isin(classes)]
    if df.empty:
        raise ValueError(f"no rows with {label_col} in {classes} in {csv_path}")

    X_df = df.iloc[:, start_col:]
    X_df = X_df.drop(columns=[label_col], errors="ignore")
    # integer-encode object columns (the reference passes raw .values and
    # relies on TabPFN's preprocessing; our encoder needs numerics)
    X_df = X_df.copy()
    for col in X_df.columns:
        if X_df[col].dtype == object or str(X_df[col].dtype) in ("str", "category"):
            X_df[col] = pd.Categorical(X_df[col]).codes
    X = X_df.to_numpy(np.float32)
    # plain numpy object array: arrow-backed string arrays don't support
    # the fancy indexing train_test_split uses
    y_str = df[label_col].to_numpy(dtype=object)
    label_to_index = {label: idx for idx, label in enumerate(classes)}
    y_num = pd.Series(y_str).map(label_to_index).values

    X_tr, X_te, y_tr_num, y_te_num, y_tr_str, y_te_str = train_test_split(
        X, y_num, y_str, test_size=test_size, random_state=random_state,
        stratify=y_num)

    embed = OoFEmbedding(embedder or _default_embedder(), n_fold=n_fold)
    train_emb = embed.get_embeddings(X_tr, y_tr_num, X_te, data_source="train")[0]
    test_emb = embed.get_embeddings(X_tr, y_tr_num, X_te, data_source="test")[0]

    train_df = pd.DataFrame(train_emb)
    train_df.insert(0, "label", y_tr_str)
    train_df.to_csv(train_out, index=False)
    test_df = pd.DataFrame(test_emb)
    test_df.insert(0, "label", y_te_str)
    test_df.to_csv(test_out, index=False)
    return train_out, test_out


def quick_eval_from_saved(train_csv: str = "train_embeddings.csv",
                          test_csv: str = "test_embeddings.csv") -> float:
    from sklearn.metrics import accuracy_score
    from sklearn.pipeline import make_pipeline
    from sklearn.preprocessing import StandardScaler
    from sklearn.svm import SVC

    tr = pd.read_csv(train_csv)
    te = pd.read_csv(test_csv)
    y_tr, X_tr = tr["label"].values, tr.drop(columns="label").values
    y_te, X_te = te["label"].values, te.drop(columns="label").values
    clf = make_pipeline(StandardScaler(), SVC(kernel="linear"))
    clf.fit(X_tr, y_tr)
    acc = accuracy_score(y_te, clf.predict(X_te))
    print(f"[quick eval - SVM-linear] Accuracy on {test_csv}: {acc:.4f}")
    return float(acc)


def embedding_downstream_eval(train_csv: str, test_csv: str) -> dict:
    """LogisticRegression over saved embeddings with ACC + ROC-AUC
    (reference tabel_vetory_class.py:1-28, minus its separate label files —
    labels ride in the embedding CSVs)."""
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import accuracy_score, roc_auc_score

    tr = pd.read_csv(train_csv)
    te = pd.read_csv(test_csv)
    y_tr, X_tr = tr["label"].values, tr.drop(columns="label").values
    y_te, X_te = te["label"].values, te.drop(columns="label").values
    clf = LogisticRegression(max_iter=1000)
    clf.fit(X_tr, y_tr)
    proba = clf.predict_proba(X_te)
    acc = accuracy_score(y_te, clf.predict(X_te))
    try:
        if proba.shape[1] == 2:
            auc = roc_auc_score(y_te, proba[:, 1])
        else:
            auc = roc_auc_score(y_te, proba, multi_class="ovr")
    except ValueError:
        auc = float("nan")
    return {"ACC": float(acc), "AUC": float(auc)}
