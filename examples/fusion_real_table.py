"""Fusion demo on the reference's REAL clinical table.

The reference sketched image+table fusion but never wired it (the
cross-transformer toolkit models/network.py:233-281 + the TabPFN tabular
branch tabel_test.py were separate experiments). This example runs the
productized fusion path end-to-end on the reference's own clinical data:

- clinical branch: the REAL `ADNI_Tabel.csv` (reference repo), ALL 423
  CN/AD subjects (219 AD / 204 CN -> an ~85-sample held-out test set),
  features from column 14, embedded per CV fold by the in-context
  tabular learner (tabular/icl.py) exactly as
  `cli/train_fusion --use-table --table ADNI_Tabel.csv` wires it,
- imaging branch: synthetic volumes for those same subjects with a
  deliberately WEAK image signal (heavy extent jitter), so the image-only
  model cannot saturate and the table branch has headroom to prove itself,
- the proof: the fused model's held-out test AUC must beat the image-only
  twin trained with the same budget — the clinical branch contributes
  real, measurable signal.

Falls back to a synthetic clinical table (data/synthetic.py::make_table)
when the reference checkout is absent, so the example runs everywhere.

Run: python examples/fusion_real_table.py   (faked CPU mesh, ~5 min)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_TABLE = os.path.join(
    os.environ.get("MAD_REFERENCE_DIR", "/root/reference"), "ADNI_Tabel.csv")
#: cap per class for the SYNTHETIC fallback only; the reference table is
#: used whole (423 CN/AD rows -> an ~85-sample held-out test set, large
#: enough that one flipped sample moves ACC by ~1 point, not 6 — the
#: round-4 80-subject subsample's 16-sample test set flaked on reruns)
N_PER_CLASS = 40
SHAPE = (16, 20, 16)
SEED = 0


def load_clinical():
    """(X, y, subjects, source): ALL reference CN/AD rows (CN=0/AD=1,
    reference tabel_loader.py:8-10), or the synthetic fallback table."""
    import pandas as pd

    from multimodal_ad_tpu.data.tabular import load_adni_table

    if os.path.exists(REF_TABLE):
        X, y, _ = load_adni_table(REF_TABLE, label_col="GROUP",
                                  classes=["CN", "AD"], start_col=14)
        df = pd.read_csv(REF_TABLE, encoding="ISO-8859-1")
        subjects = df[df["GROUP"].isin(["CN", "AD"])]["PTID"].tolist()
        return X, y, subjects, "reference ADNI_Tabel.csv"

    from multimodal_ad_tpu.data.synthetic import make_table

    df = make_table(n=2 * N_PER_CLASS, n_features=24, seed=SEED)
    X, y, _ = load_adni_table_df(df)
    return X, y, df["Subject_ID"].tolist(), "synthetic fallback table"


def load_adni_table_df(df):
    """make_table fallback -> (X, y, cols) with the same conventions."""
    import tempfile

    from multimodal_ad_tpu.data.tabular import load_adni_table

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "table.csv")
        df.to_csv(p, index=False)
        return load_adni_table(p, label_col="Group", classes=["CN", "AD"],
                               start_col=14)


def write_volumes(root, subjects, y):
    """Per-subject weak-signal volumes + the manifest CSV. extent_jitter
    0.8 vs the class gap of 0.8 makes the imaging boundary genuinely
    noisy (the learning proof uses 0.3 and reaches AUC ~0.95+; here the
    image-only model should plateau well below the fused one)."""
    import pandas as pd

    from multimodal_ad_tpu.data.synthetic import make_volume
    from multimodal_ad_tpu.utils import nifti

    rng = np.random.default_rng(SEED + 1)
    mri_dir = os.path.join(root, "MRI")
    os.makedirs(mri_dir, exist_ok=True)
    rows = []
    for s, label in zip(subjects, y):
        vol = make_volume(rng, SHAPE, label=int(label), extent_jitter=0.8,
                          center_jitter=0.06, noise=0.4)
        nifti.save(os.path.join(mri_dir, f"{s}.nii"), vol)
        rows.append({"Subject_ID": s, "Group": "AD" if label else "CN"})
    csv_path = os.path.join(root, "labels.csv")
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    return csv_path, mri_dir


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8 "
                          "--xla_cpu_collective_timeout_seconds=1200")

    from multimodal_ad_tpu.core.config import Config
    from multimodal_ad_tpu.data.adni import ADNIManifest
    from multimodal_ad_tpu.data.splits import stratified_test_split
    from multimodal_ad_tpu.parallel.mesh import make_mesh
    from multimodal_ad_tpu.train.fusion import (test_fusion_models,
                                                train_fusion_cv)

    X, y, subjects, source = load_clinical()
    print(f"clinical branch: {source} ({len(y)} subjects, "
          f"{X.shape[1]} features)")

    work = tempfile.mkdtemp(prefix="fusion_real_table_")
    csv_path, mri_dir = write_volumes(work, subjects, y)
    records = ADNIManifest(csv_path, mri_dir, "ADCN",
                           verbose=False).data_dict
    table_data = (X, y, subjects)

    n_dev = min(4, len(jax.devices()))
    mesh = make_mesh({"data": n_dev}, devices=jax.devices()[:n_dev])
    model_kw = dict(dim=16, depth=1, heads=2, dim_head=8, mlp_dim=32)
    results = {}
    # batch 16 (divisible by the 4-way mesh) keeps steps/epoch near the
    # old 80-subject/batch-4 demo's despite the 5x cohort
    batch = 16 if len(y) > 100 else 4
    for tag, use_table in (("image-only", False), ("fused", True)):
        cfg = Config(
            label_file=csv_path, mri_dir=mri_dir, task="ADCN",
            num_epochs=10, batch_size=batch, lr=1e-3, n_splits=2,
            checkpoint_dir=os.path.join(work, f"ckpt_{tag}"),
            compute_dtype="float32", loader_threads=2)
        train_fusion_cv(cfg, use_table=use_table,
                        table_data=table_data if use_table else None,
                        model_kw=model_kw, records=records, mesh=mesh,
                        verbose=False)
        tr_val, test_data = stratified_test_split(records, cfg.split_ratio,
                                                  cfg.seed)
        r = test_fusion_models(
            cfg, test_data, use_table=use_table,
            table_data=table_data if use_table else None,
            model_kw=model_kw, mesh=mesh,
            train_subjects=[rec["Subject"] for rec in tr_val],
            verbose=False)
        results[tag] = r["avg"]
        folds = [round(float(m["AUC"]), 4) for m in r["per_fold"]]
        results[tag]["fold_AUCs"] = folds
        results[tag]["fold_AUC_std"] = round(float(np.std(folds)), 4)
        print(f"{tag}: test AUC {r['avg']['AUC']:.3f} "
              f"ACC {r['avg']['ACC']:.3f} "
              f"(per-fold AUC {folds}, std {results[tag]['fold_AUC_std']})")

    gain = results["fused"]["AUC"] - results["image-only"]["AUC"]
    print(f"table branch AUC gain: {gain:+.3f}")
    assert results["fused"]["AUC"] > results["image-only"]["AUC"], (
        "clinical branch added no held-out AUC", results)

    out = {"source": source, "n_subjects": int(len(y)),
           "image_only": results["image-only"],
           "fused": results["fused"], "auc_gain": round(float(gain), 4)}
    art_dir = os.path.join(REPO, "artifacts", "fusion_real_table")
    os.makedirs(art_dir, exist_ok=True)
    with open(os.path.join(art_dir, "summary.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("artifact written to", art_dir)
    return out


if __name__ == "__main__":
    main()
