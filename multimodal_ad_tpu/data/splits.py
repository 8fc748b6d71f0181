"""Deterministic dataset splitting (seed-42 parity).

The reference reconstructs the same stratified 80/20 test split in multiple
scripts by re-running sklearn's train_test_split with random_state=42
(reference train_ResNet3D.py:118-119, test.py:96-105, image_features.py:29-31)
and K-fold CV with StratifiedKFold(shuffle=True, random_state=42)
(train_ResNet3D.py:136-137). We use the same sklearn primitives so split
membership is identical for identical manifests.
"""

from __future__ import annotations

from sklearn.model_selection import StratifiedKFold, train_test_split


def stratified_test_split(records: list, test_size: float = 0.2, seed: int = 42):
    labels = [r["label"] for r in records]
    return train_test_split(records, test_size=test_size, random_state=seed,
                            stratify=labels)


def stratified_kfold(records: list, n_splits: int = 5, seed: int = 42):
    """Yield (fold_index starting at 1, train_records, val_records)."""
    labels = [r["label"] for r in records]
    kf = StratifiedKFold(n_splits=n_splits, shuffle=True, random_state=seed)
    for fold, (tr_idx, vl_idx) in enumerate(kf.split(records, labels), 1):
        yield fold, [records[i] for i in tr_idx], [records[i] for i in vl_idx]
