"""Feature extraction: voxel CSVs, atlas-ROI CSVs, encoder embeddings.

Covers the reference's three extraction paths:

1. U-Net voxel + ROI features (reference image_features.py:97-143):
   forward the test split through a UNet3D, write
   - features.csv:     Subject_ID, f0..f{X*Y*Z-1} (flattened 1-ch output),
   - roi_features.csv: Subject_ID, {ROIname}_c{ch} (ROI-mean of the 64-ch
     pre-head decoder map).

   Divergence (documented): the reference writes ROI values transposed
   relative to its own header — the header is ROI-major
   (image_features.py:132-135) but rows are flattened channel-major
   (permute(0,2,1), :138). Here rows match the header (ROI-major);
   `reference_bug_compat=True` reproduces the reference byte order.

2. ResNet encoder embeddings (reference models/mymodel.py:13-103):
   image_encoder(global_pool=False) feature vectors + label per sample
   -> adni_features.csv, plus a feature_map_shapes.csv of per-stage
   activation shapes (the reference logs every leaf module via hooks; JAX
   taps are per-stage).

All forwards are jit'd with the batch sharded over the mesh; CSV assembly
stays on host.
"""

from __future__ import annotations

import csv
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import VolumeBatcher, device_prefetch
from ..data.transforms import VolumeTransform
from ..models.resnet3d import ResNet3D
from ..models.unet3d import UNet3D
from ..ops.roi_pool import roi_pool_xla
from ..parallel.mesh import make_mesh, replicate


def extract_unet_features(records, atlas_labels, roi_names, out_dir,
                          model: UNet3D | None = None, variables=None,
                          batch_size: int = 4, mesh=None, loader=None,
                          num_threads: int = 8, seed: int = 0,
                          reference_bug_compat: bool = False,
                          normalizer: str = "scale_intensity"):
    """Run the U-Net over `records`, write features.csv + roi_features.csv.

    `model`/`variables` default to a freshly initialized (untrained) UNet3D,
    matching the reference's use of an untrained network
    (image_features.py:40 — no checkpoint is loaded there).
    Returns (features_csv_path, roi_csv_path).
    """
    mesh = mesh or make_mesh({"data": -1})
    # fp32 by default: the CSV outputs are contractually deterministic /
    # bit-comparable (BASELINE.md), so no bf16 drift on this path
    model = model or UNet3D(in_channels=1, num_classes=1, dtype=jnp.float32)
    if variables is None:
        shape = atlas_labels.shape
        x0 = jnp.zeros((1, *shape, 1), jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(seed)}, x0,
                               train=False)
    variables = replicate(variables, mesh)

    num_rois = len(roi_names)
    labels_dev = replicate(jnp.asarray(atlas_labels), mesh)

    @jax.jit
    def step(variables, image):
        out, inter = model.apply(variables, image, train=False,
                                 mutable=["intermediates"])
        feats = inter["intermediates"]["head_block"]["pre_head"][0]
        feats = feats[:, : image.shape[1], : image.shape[2], : image.shape[3], :]
        roi = roi_pool_xla(feats.astype(jnp.float32), labels_dev, num_rois)
        return out, roi

    tf = VolumeTransform(augment=False, normalizer=normalizer)
    kw = dict(batch_size=batch_size, num_threads=num_threads)
    if loader is not None:
        kw["loader"] = loader
    batcher = VolumeBatcher(records, tf, shuffle=False, **kw)

    os.makedirs(out_dir, exist_ok=True)
    feat_path = os.path.join(out_dir, "features.csv")
    roi_path = os.path.join(out_dir, "roi_features.csv")

    with open(feat_path, "w", newline="") as ff, \
            open(roi_path, "w", newline="") as rf:
        fw, rw = csv.writer(ff), csv.writer(rf)
        wrote_headers = False
        for batch in device_prefetch(iter(batcher), mesh, depth=2):
            subjects = batch.pop("subject")
            out, roi = step(variables, batch["image"])
            out = np.asarray(out)
            roi = np.asarray(roi)  # (B, R, C)
            mask = np.asarray(batch["mask"]) > 0

            flat = out.reshape(out.shape[0], -1)
            n_ch = roi.shape[-1]
            if not wrote_headers:
                fw.writerow(["Subject_ID"] + [f"f{i}" for i in range(flat.shape[1])])
                rw.writerow(["Subject_ID"] +
                            [f"{name}_c{c}" for name in roi_names
                             for c in range(n_ch)])
                wrote_headers = True

            if reference_bug_compat:
                rows = roi.transpose(0, 2, 1).reshape(roi.shape[0], -1)
            else:
                rows = roi.reshape(roi.shape[0], -1)
            for i, sid in enumerate(subjects):
                if not mask[i]:
                    continue
                fw.writerow([sid] + flat[i].tolist())
                rw.writerow([sid] + rows[i].tolist())
    return feat_path, roi_path


def extract_encoder_features(records, out_dir, depth: int = 18,
                             global_pool: bool = False, variables=None,
                             batch_size: int = 4, mesh=None, loader=None,
                             num_threads: int = 8, seed: int = 0,
                             input_shape=(91, 109, 91)):
    """ResNet encoder features -> adni_features.csv (+ shape log).

    Parity with reference models/mymodel.py:13-103: eval-mode
    image_encoder{depth}(in_channels=1, global_pool=False), per-sample
    flattened feature vector + label.
    """
    mesh = mesh or make_mesh({"data": -1})
    model = ResNet3D(depth=depth, head="pool" if global_pool else "none",
                     dtype=jnp.float32)
    if variables is None:
        x0 = jnp.zeros((1, *input_shape, 1), jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(seed)}, x0,
                               train=False)
    variables = replicate(variables, mesh)

    @jax.jit
    def step(variables, image):
        out, inter = model.apply(variables, image, train=False,
                                 mutable=["intermediates"])
        return out, [t[0] if isinstance(t, tuple) else t
                     for t in jax.tree_util.tree_leaves(
                         inter["intermediates"], is_leaf=lambda x: hasattr(x, "shape"))]

    tf = VolumeTransform(augment=False)
    kw = dict(batch_size=batch_size, num_threads=num_threads)
    if loader is not None:
        kw["loader"] = loader
    batcher = VolumeBatcher(records, tf, shuffle=False, **kw)

    os.makedirs(out_dir, exist_ok=True)
    feat_path = os.path.join(out_dir, "adni_features.csv")
    shape_path = os.path.join(out_dir, "feature_map_shapes.csv")

    shape_rows = []
    with open(feat_path, "w", newline="") as ff:
        fw = csv.writer(ff)
        wrote_header = False
        for batch in device_prefetch(iter(batcher), mesh, depth=2):
            subjects = batch.pop("subject")
            out, taps = step(variables, batch["image"])
            out = np.asarray(out)
            mask = np.asarray(batch["mask"]) > 0
            labels = np.asarray(batch["label"])
            flat = out.reshape(out.shape[0], -1)
            if not wrote_header:
                fw.writerow(["Subject_ID"] +
                            [f"f{i}" for i in range(flat.shape[1])] + ["label"])
                shape_rows = [("stage_out", tuple(np.asarray(t).shape))
                              for t in taps]
                wrote_header = True
            for i, sid in enumerate(subjects):
                if not mask[i]:
                    continue
                fw.writerow([sid] + flat[i].tolist() + [int(labels[i])])

    with open(shape_path, "w", newline="") as sf:
        sw = csv.writer(sf)
        sw.writerow(["module", "output_shape"])
        for name, shape in shape_rows:
            sw.writerow([name, str(shape)])
    return feat_path, shape_path
