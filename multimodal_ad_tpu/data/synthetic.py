"""Seeded synthetic ADNI-like data generators for tests and benchmarks.

Mirrors the test-fixture pattern of the reference's vendored tabpfn
extension suite (reference models/tabpfn-extensions/tests/utils.py:74+
`DatasetGenerator`): deterministic RandomState-driven generators for
volumes, label CSVs, atlas label maps, and clinical tables.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..utils import nifti

GROUPS = ["AD", "CN", "SMCI", "PMCI", "EMCI", "LMCI"]


def make_volume(rng: np.random.Generator, shape=(91, 109, 91), label: int = 0,
                extent_jitter: float = 0.0, center_jitter: float = 0.0,
                noise: float = 0.05):
    """Structured random volume: a smooth blob whose intensity/extent
    depends weakly on the class label, so tiny models can actually learn.

    With the default jitters of 0 every volume of a class is identical up to
    voxel noise (good for fast plumbing tests but trivially separable).
    `extent_jitter`/`center_jitter` add per-sample variation so the class
    boundary is *statistical* — a model must genuinely learn the extent
    feature rather than memorize one prototype (used by the learning-proof
    test, tests/test_learning.py)."""
    coords = np.meshgrid(*[np.linspace(-1, 1, s, dtype=np.float32) for s in shape],
                         indexing="ij")
    if center_jitter:
        shifts = rng.normal(0, center_jitter, size=3)
        coords = [c - s for c, s in zip(coords, shifts)]
    r2 = sum(c ** 2 for c in coords)
    extent = 3.0 + 0.8 * label
    if extent_jitter:
        extent += rng.normal(0, extent_jitter)
    base = np.exp(-r2 * extent).astype(np.float32)
    vnoise = rng.normal(0, noise, shape).astype(np.float32)
    return (base * (200.0 + 40.0 * label) + vnoise * 20.0).astype(np.float32)


def make_adni_dir(root: str, n_per_class=4, classes=("AD", "CN"),
                  shape=(24, 28, 24), seed: int = 0, gz: bool = False,
                  pet: bool = False, **volume_kw):
    """Write a miniature ADNI dataset: label CSV + per-subject NIfTI files.
    Returns (label_csv_path, mri_dir) or (csv, mri_dir, pet_dir) with
    pet=True. Extra kwargs (extent_jitter/center_jitter/noise) pass through
    to make_volume to control class separability."""
    rng = np.random.default_rng(seed)
    mri_dir = os.path.join(root, "MRI")
    os.makedirs(mri_dir, exist_ok=True)
    pet_dir = os.path.join(root, "PET")
    if pet:
        os.makedirs(pet_dir, exist_ok=True)
    rows = []
    for ci, group in enumerate(classes):
        for k in range(n_per_class):
            subject = f"{group}_{k:03d}"
            vol = make_volume(rng, shape, label=ci, **volume_kw)
            ext = ".nii.gz" if gz else ".nii"
            nifti.save(os.path.join(mri_dir, subject + ext), vol)
            if pet:
                pvol = make_volume(rng, shape, label=ci, **volume_kw) * 0.5
                nifti.save(os.path.join(pet_dir, subject + ext), pvol)
            rows.append({"Subject_ID": subject, "Group": group})
    csv_path = os.path.join(root, "labels.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    if pet:
        return csv_path, mri_dir, pet_dir
    return csv_path, mri_dir


def make_atlas(shape=(24, 28, 24), n_rois: int = 6, seed: int = 0):
    """Random contiguous-ish ROI label volume with ids 1..n_rois (0 = bg)."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(0.15, 0.85, size=(n_rois, 3))
    grids = np.meshgrid(*[np.linspace(0, 1, s, dtype=np.float32) for s in shape],
                        indexing="ij")
    pts = np.stack(grids, -1)  # (X,Y,Z,3)
    d = np.linalg.norm(pts[..., None, :] - centers[None, None, None], axis=-1)
    labels = np.argmin(d, axis=-1).astype(np.int32) + 1
    bg = np.linalg.norm(pts - 0.5, axis=-1) > 0.55
    labels[bg] = 0
    return labels


def make_table(n: int = 120, n_features: int = 20,
               classes=("CN", "AD"), seed: int = 0,
               n_categorical: int = 3, start_pad_cols: int = 14):
    """Clinical-style DataFrame: `start_pad_cols` id/demographic filler
    columns, a 'Group' label column, then numeric+categorical features —
    the layout tabel_test.py expects (features from column 14,
    reference tabel_test.py:128)."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, len(classes), n)
    data = {}
    data["Subject_ID"] = [f"S{i:04d}" for i in range(n)]
    data["Group"] = [classes[c] for c in y]
    for j in range(start_pad_cols - 2):
        data[f"meta{j}"] = rng.normal(size=n).round(3)
    for j in range(n_features - n_categorical):
        data[f"feat{j}"] = (rng.normal(size=n) + 0.8 * y).astype(np.float32)
    for j in range(n_categorical):
        cats = rng.choice(["a", "b", "c"], size=n)
        data[f"cat{j}"] = cats
    return pd.DataFrame(data)
