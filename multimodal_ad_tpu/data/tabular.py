"""Clinical tabular loaders (ADNI_Tabel.csv).

Parity with reference datasets/tabel_loader.py:6-175: select feature columns
from `start_col` to the end (excluding the label column), filter rows to the
requested classes, map class names to 0..k-1, integer-encode object/category
columns, drop label-NaN rows, return (X float32, y int64).

Note the label conventions differ per path by design: here the default is
CN=0, AD=1 (reference tabel_loader.py:8-10) while the image manifest's ADCN
task yields AD=0, CN=1 — both preserved exactly (SURVEY.md §8).
"""

from __future__ import annotations


import pandas as pd


def _load(csv_path: str, start_col: int, label_col: str, classes: list[str]):
    df = pd.read_csv(csv_path)
    all_cols = list(df.columns)
    if len(all_cols) <= start_col:
        raise ValueError(
            f"CSV has fewer than {start_col + 1} columns; cannot take features from index {start_col}"
        )
    feature_cols = [c for c in all_cols[start_col:] if c != label_col]
    if label_col not in df.columns:
        raise ValueError(f"Missing column: {label_col}")

    df2 = df[df[label_col].isin(classes)].copy()
    if df2.empty:
        raise ValueError(f"No samples for classes {classes} in column '{label_col}'")

    mapping = {c: i for i, c in enumerate(classes)}
    df2[label_col] = df2[label_col].map(mapping).astype("int64")

    for col in feature_cols:
        dt = df2[col].dtype
        if dt == object or str(dt).startswith("category") or str(dt) == "str":
            df2[col] = pd.Categorical(df2[col]).codes.astype("int16")

    df2 = df2.dropna(subset=[label_col])
    X = df2[feature_cols].astype("float32").values
    y = df2[label_col].values.astype("int64")
    return X, y, feature_cols


def load_adni_data_binary(csv_path: str, start_col: int, label_col: str = "Group",
                          class0: str = "CN", class1: str = "AD"):
    X, y, _ = _load(csv_path, start_col, label_col, [class0, class1])
    return X, y


def load_adni_data_triclass(csv_path: str, start_col: int, label_col: str = "Group",
                            class0: str = "CN", class1: str = "MCI", class2: str = "AD"):
    X, y, _ = _load(csv_path, start_col, label_col, [class0, class1, class2])
    return X, y


def load_adni_data_quadclass(csv_path: str, start_col: int, label_col: str = "Group",
                             class0: str = "CN", class1: str = "SMCI",
                             class2: str = "PMCI", class3: str = "AD"):
    X, y, _ = _load(csv_path, start_col, label_col, [class0, class1, class2, class3])
    return X, y


def load_adni_table(csv_path: str, label_col: str = "Group",
                    classes: list[str] | None = None, start_col: int = 14):
    """Generalized loader used by the embedding pipeline
    (reference tabel_test.py:122-132 reads features from column 14)."""
    classes = classes or ["CN", "AD"]
    return _load(csv_path, start_col, label_col, classes)
