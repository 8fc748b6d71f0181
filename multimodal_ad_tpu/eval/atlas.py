"""AAL atlas loading and ROI query utilities.

Covers the reference's atlas handling:
- atlas NIfTI + JSON LUT ingestion (reference image_features.py:63-77),
- label->name/center/size queries and voxel/world-coordinate lookups
  (reference models/ROI_pol_test.py:24-170),
- ROI mask overlay rendering (reference models/ROL_visual.py:25-66),
  via matplotlib (no nilearn in this stack).

LUT schema (NeuroParc AAL_space-MNI152NLin6): {"rois": {"<id>": {"label":
name, "center": [x,y,z], "size": n}}}; missing ids fall back to "ROI{id}"
(reference image_features.py:73-77).
"""

from __future__ import annotations

import json

import numpy as np

from ..utils import nifti


def load_atlas(nii_path: str, json_path: str | None = None):
    """Returns (labels int32 (X,Y,Z), roi_ids ascending >0, roi_names,
    affine 4x4)."""
    hdr = nifti.read_header(nii_path)
    labels = nifti.load(nii_path).astype(np.int32)
    roi_ids = np.unique(labels)
    roi_ids = roi_ids[roi_ids > 0]
    lut = {}
    if json_path:
        try:
            with open(json_path) as f:
                raw = json.load(f)["rois"]
            lut = {int(k): v.get("label", f"ROI{k}") for k, v in raw.items()
                   if isinstance(v, dict)}
        except Exception:
            lut = {}
    roi_names = [lut.get(int(i), f"ROI{int(i)}") for i in roi_ids]
    return labels, roi_ids, roi_names, hdr.affine


def compact_labels(labels: np.ndarray, roi_ids: np.ndarray) -> np.ndarray:
    """Remap arbitrary ROI ids to contiguous 1..R (0 stays background) so
    the pooling one-hot has no dead rows. AAL ids are sparse (e.g. AAL3
    skips 35/36)."""
    mapping = np.zeros(int(roi_ids.max()) + 1, np.int32)
    for new, old in enumerate(roi_ids, start=1):
        mapping[int(old)] = new
    return mapping[labels]


def roi_centers(labels: np.ndarray, roi_ids: np.ndarray,
                affine: np.ndarray | None = None):
    """Per-ROI centroid in voxel (or world, if affine given) coordinates."""
    centers = {}
    for rid in roi_ids:
        vox = np.argwhere(labels == rid)
        c = vox.mean(axis=0)
        if affine is not None:
            c = (affine @ np.append(c, 1.0))[:3]
        centers[int(rid)] = c
    return centers


def query_voxel(labels: np.ndarray, roi_names_by_id: dict, ijk) -> str | None:
    """Voxel index -> ROI name (reference ROI_pol_test.py query_voxel)."""
    i, j, k = (int(v) for v in ijk)
    if not all(0 <= v < s for v, s in zip((i, j, k), labels.shape)):
        return None
    rid = int(labels[i, j, k])
    if rid == 0:
        return None
    return roi_names_by_id.get(rid, f"ROI{rid}")


def query_world(xyz, centers_world: dict, roi_names_by_id: dict):
    """World mm coordinate -> nearest ROI centroid
    (reference ROI_pol_test.py nearest_roi)."""
    xyz = np.asarray(xyz, float)
    best, best_d = None, np.inf
    for rid, c in centers_world.items():
        d = float(np.linalg.norm(xyz - c))
        if d < best_d:
            best, best_d = rid, d
    return roi_names_by_id.get(best, f"ROI{best}"), best, best_d


def save_roi_overlay(mri: np.ndarray, labels: np.ndarray, roi_ids,
                     out_png: str, axis: int = 2, alpha: float = 0.5):
    """Overlay the union of `roi_ids` masks on the central slice of `mri`
    and save a PNG (reference ROL_visual.py hippocampus overlay; ids 41/42
    in AAL3)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mask = np.isin(labels, list(roi_ids))
    sl = [slice(None)] * 3
    sl[axis] = mri.shape[axis] // 2
    base = np.take(mri, mri.shape[axis] // 2, axis=axis)
    over = np.take(mask, mri.shape[axis] // 2, axis=axis)

    fig, ax = plt.subplots(figsize=(6, 6))
    ax.imshow(base.T, cmap="gray", origin="lower")
    masked = np.ma.masked_where(~over.T, over.T)
    ax.imshow(masked, cmap="autumn", alpha=alpha, origin="lower")
    ax.set_axis_off()
    fig.savefig(out_png, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_png
