"""ROI overlay + atlas query tool.

Mirrors the reference's nilearn-based viewers: models/ROL_visual.py (ROI
mask over a subject MRI, default hippocampus AAL ids 41/42) and
models/ROI_pol_test.py (voxel/world-coordinate ROI queries).

Usage:
    python -m multimodal_ad_tpu.cli.roi_visualize --atlas atlas.nii \
        --mri subject.nii --roi-ids 41 42 --out overlay.png
    python -m multimodal_ad_tpu.cli.roi_visualize --atlas atlas.nii \
        --atlas-json atlas.json --query-voxel 45 54 45
"""

from __future__ import annotations

import argparse



from ..eval.atlas import (load_atlas, query_voxel, query_world, roi_centers,
                          save_roi_overlay)
from ..utils import nifti


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--atlas", required=True)
    p.add_argument("--atlas-json", default=None)
    p.add_argument("--mri", default=None, help="subject MRI for overlay")
    p.add_argument("--roi-ids", type=int, nargs="+", default=[41, 42],
                   help="ROI ids to overlay (default: hippocampus L/R)")
    p.add_argument("--out", default="roi_overlay.png")
    p.add_argument("--axis", type=int, default=2)
    p.add_argument("--query-voxel", type=int, nargs=3, default=None)
    p.add_argument("--query-world", type=float, nargs=3, default=None)
    args = p.parse_args(argv)

    labels, roi_ids, roi_names, affine = load_atlas(args.atlas, args.atlas_json)
    names = dict(zip((int(i) for i in roi_ids), roi_names))

    if args.query_voxel:
        name = query_voxel(labels, names, args.query_voxel)
        print(f"voxel {tuple(args.query_voxel)} -> {name or 'background'}")
    if args.query_world:
        centers = roi_centers(labels, roi_ids, affine)
        name, rid, dist = query_world(args.query_world, centers, names)
        print(f"world {tuple(args.query_world)} -> {name} (id {rid}, "
              f"{dist:.1f} mm from centroid)")
    if args.mri:
        mri = nifti.load(args.mri)
        out = save_roi_overlay(mri, labels, args.roi_ids, args.out,
                               axis=args.axis)
        print(f"overlay saved: {out}")
    return 0


if __name__ == "__main__":
    main()
