"""Head-to-head on the reference's REAL clinical table.

The reference repo ships two things no synthetic benchmark can substitute:

1. `ADNI_Tabel.csv` — the actual 902x170 ADNI clinical table its tabular
   branch runs on (reference tabel_test.py:188-193),
2. `train_embeddings.csv` / `test_embeddings.csv` — artifacts of a REAL
   TabPFN-v2 out-of-fold embedding run on that table (464/117 rows,
   the 3-class PMCI/AD/CN task after the "SCMI" typo filters SMCI out —
   reference tabel_test.py:191, SURVEY.md section 3.4).

This benchmark reruns the reference's own workflow with OUR from-scratch
ICL backend on the SAME rows / split (seed 42, stratified, test 0.2) and
evaluates both embedding sets with the reference's own downstream evals
(quick_eval_from_saved = StandardScaler + linear SVM; tabel_vetory_class
= LogisticRegression), plus direct classifiers on the raw features.

The reference table is read from /root/reference (read-only input data,
NOT code); the benchmark degrades to a no-op with a notice when the file
is absent so the repo stays self-contained.

Run: python benchmarks/adni_real_table.py  (CPU, ~10 min; writes
benchmarks/ADNI_TABULAR.md)
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DIR = os.environ.get("MAD_REFERENCE_DIR", "/root/reference")
TABLE = os.path.join(REF_DIR, "ADNI_Tabel.csv")
REF_TRAIN_EMB = os.path.join(REF_DIR, "train_embeddings.csv")
REF_TEST_EMB = os.path.join(REF_DIR, "test_embeddings.csv")
OUT = os.path.join(os.path.dirname(__file__), "ADNI_TABULAR.md")

# the reference __main__'s exact arguments (tabel_test.py:188-193) — the
# "SCMI" typo is preserved because it defines which rows the shipped
# artifacts contain (SMCI drops out -> 3 classes, 581 rows)
MULTI_CLASSES = ["SCMI", "PMCI", "AD", "CN"]
START_COL = 14
TEST_SIZE = 0.2
SEED = 42
N_FOLD = 5


def _split_multi():
    """The reference's row filter + split (tabel_test.py:122-140)."""
    from sklearn.model_selection import train_test_split

    df = pd.read_csv(TABLE, dtype={"GROUP": str})
    df = df[df["GROUP"].isin(MULTI_CLASSES)]
    X_df = df.iloc[:, START_COL:].copy()
    for col in X_df.columns:  # same encoding as tabel_encoder_multi
        if not pd.api.types.is_numeric_dtype(X_df[col]):
            X_df[col] = pd.Categorical(X_df[col]).codes
    X = X_df.to_numpy(np.float32)
    y_str = df["GROUP"].to_numpy(dtype=object)
    label_to_index = {c: i for i, c in enumerate(MULTI_CLASSES)}
    y = pd.Series(y_str).map(label_to_index).to_numpy()
    return train_test_split(X, y, test_size=TEST_SIZE, random_state=SEED,
                            stratify=y)


def _split_binary(class0="CN", class1="AD"):
    """Defaults match the tabular loader's convention (CN=0 / AD=1,
    reference tabel_loader.py:8-10; MIGRATION.md) so AUC is reported
    against the documented positive class on non-saturated tasks."""
    from sklearn.model_selection import train_test_split

    from multimodal_ad_tpu.data.tabular import load_adni_data_binary

    X, y = load_adni_data_binary(TABLE, start_col=START_COL,
                                 label_col="GROUP",
                                 class0=class0, class1=class1)
    return train_test_split(X, y, test_size=TEST_SIZE, random_state=SEED,
                            stratify=y)


def make_baselines():
    """Same estimators as benchmarks/icl_quality.py, behind a median
    imputer — the real table is 7.3% NaN and sklearn rejects NaN."""
    from sklearn.ensemble import GradientBoostingClassifier
    from sklearn.impute import SimpleImputer
    from sklearn.linear_model import LogisticRegression
    from sklearn.pipeline import make_pipeline
    from sklearn.preprocessing import StandardScaler
    from sklearn.svm import SVC

    imp = lambda: SimpleImputer(strategy="median")  # noqa: E731
    return {
        "LogReg": make_pipeline(imp(), StandardScaler(),
                                LogisticRegression(max_iter=1000)),
        "SVM-RBF": make_pipeline(imp(), StandardScaler(),
                                 SVC(probability=True, random_state=0)),
        "GradBoost": make_pipeline(imp(),
                                   GradientBoostingClassifier(random_state=0)),
    }


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
    return float(acc), float(auc)


def main():
    if not os.path.exists(TABLE):
        print(f"reference table {TABLE} not found - nothing to benchmark; "
              f"set MAD_REFERENCE_DIR to a checkout of the reference repo")
        return 0

    from multimodal_ad_tpu.tabular.icl import ICLClassifier
    from multimodal_ad_tpu.tabular.pipeline import (
        embedding_downstream_eval, quick_eval_from_saved, tabel_encoder_multi)

    lines = [
        "# Real-data head-to-head: the reference's own clinical table",
        "",
        "Task and split are the reference `tabel_test.py` run that produced",
        "its shipped embedding artifacts: `ADNI_Tabel.csv`, 3-class",
        "PMCI/AD/CN (581 rows after the \"SCMI\" typo filter), features from",
        "column 14 (156 numeric columns, 7.3% NaN), stratified 80/20 split at",
        "seed 42, 5-fold out-of-fold embeddings. Regenerate with",
        "`python benchmarks/adni_real_table.py` (needs the reference checkout",
        "for the table + artifacts; see MAD_REFERENCE_DIR).",
        "",
        "This table motivated two round-3 estimator changes (train-median",
        "NaN imputation and the supervised width screen for tables beyond",
        "the meta-trained 96-feature range): before them, direct ICL scored",
        "0.778 ACC / 0.922 AUC and ICL embeddings+SVM 0.778 on the 3-class",
        "task. Round 4 attacked the embedding row (0.829 = the raw-feature",
        "baseline, i.e. zero added information): contrastive meta-training +",
        "the preprocess-diverse 'rich' OoF ensemble lifted it to 0.889 — but",
        "cost direct classification (AutoICL 0.915 -> 0.897, below",
        "GradBoost). Round 5 split the trade-off into TWO assets",
        "(assets/README.md): a classification-annealed classifier asset",
        "(AutoICL back to GradBoost parity) and a dedicated contrastive",
        "embedder asset at 3.3x the aux weight behind EnsembleICLEmbedder",
        "(embeddings+SVM 0.889 -> 0.897 on this benchmark's TPU run;",
        "the CPU twin of the same pipeline measures 0.906 — one test",
        "sample of matmul-precision delta; reference's shipped TabPFN-v2",
        "artifact: 0.932). Both claims are now asserted at the bottom of",
        "this script so an asset swap cannot silently regress them.",
        "",
        "Seed-marginalized context for the embedding row: 13 same-recipe",
        "contrastive continuations span 0.863-0.906 on this pipeline's CPU",
        "twin (mean ~0.888; seed table in assets/README.md), and the",
        "464-row train-CV selection signal cannot rank them — so the",
        "shipped-asset number is one draw near the top of that spread,",
        "not a tuned pick (swapping seeds on train evidence was measured",
        "to be test-set fishing and rejected).",
        "",
        "TunedICL's 0.872 is budget-invariant (probed at 8/16/24 trials,",
        "identical ACC): single-config tuning under the selection guard is",
        "structurally below the Caruana ensemble (AutoICL) on this table,",
        "as the reference's TunedTabPFN is to its own ensembles.",
        "",
    ]

    # --- Part A: embedding pipelines, reference's own downstream evals ----
    rows = []
    if os.path.exists(REF_TRAIN_EMB) and os.path.exists(REF_TEST_EMB):
        print("[A] reference TabPFN-v2 artifacts ...", flush=True)
        svm_ref = quick_eval_from_saved(REF_TRAIN_EMB, REF_TEST_EMB)
        lr_ref = embedding_downstream_eval(REF_TRAIN_EMB, REF_TEST_EMB)
        rows.append(("TabPFN-v2 OoF embeddings (reference artifact)",
                     svm_ref, lr_ref["ACC"]))

    print("[A] our ICL OoF embeddings ...", flush=True)
    with tempfile.TemporaryDirectory() as td:
        tr_csv = os.path.join(td, "train_embeddings.csv")
        te_csv = os.path.join(td, "test_embeddings.csv")
        tabel_encoder_multi(TABLE, start_col=START_COL,
                            classes=MULTI_CLASSES, n_fold=N_FOLD,
                            test_size=TEST_SIZE, random_state=SEED,
                            train_out=tr_csv, test_out=te_csv)
        svm_ours = quick_eval_from_saved(tr_csv, te_csv)
        lr_ours = embedding_downstream_eval(tr_csv, te_csv)
    rows.append(("ICL OoF embeddings (this framework)", svm_ours,
                 lr_ours["ACC"]))

    # raw-features floor: does either embedding add value over the table?
    from sklearn.impute import SimpleImputer
    from sklearn.metrics import accuracy_score
    from sklearn.pipeline import make_pipeline
    from sklearn.preprocessing import StandardScaler
    from sklearn.svm import SVC

    Xtr, Xte, ytr, yte = _split_multi()
    raw_svm = make_pipeline(SimpleImputer(strategy="median"),
                            StandardScaler(), SVC(kernel="linear"))
    raw_svm.fit(Xtr, ytr)
    raw_acc = float(accuracy_score(yte, raw_svm.predict(Xte)))
    rows.append(("raw features (median-imputed)", raw_acc, float("nan")))

    lines += [
        "## Embedding pipelines, 3-class task (reference downstream evals)",
        "",
        "| embeddings | SVM-linear ACC (quick_eval_from_saved) | "
        "LogReg ACC (tabel_vetory_class) |",
        "|---|---|---|",
    ]
    for name, svm_a, lr_a in rows:
        lr_s = "—" if np.isnan(lr_a) else f"{lr_a:.3f}"
        lines.append(f"| {name} | {svm_a:.3f} | {lr_s} |")
    lines.append("")

    # --- Part B: direct classifiers on the raw table -----------------------
    multi_acc = {}
    for task, splitter in (("3-class PMCI/AD/CN", _split_multi),
                           ("binary AD-vs-CN", lambda: _split_binary())):
        print(f"[B] direct classifiers, {task} ...", flush=True)
        Xtr, Xte, ytr, yte = splitter()
        models = {"ICL": ICLClassifier(), **make_baselines()}
        if task.startswith("3-class"):
            # HPO/ensemble wrappers on the non-trivial task only (the
            # binary task saturates at 1.0 for every model)
            from multimodal_ad_tpu.tabular.ensembles import AutoICLClassifier
            from multimodal_ad_tpu.tabular.hpo import TunedICLClassifier
            models["AutoICL"] = AutoICLClassifier(n_configs=6, random_state=0)
            models["TunedICL"] = TunedICLClassifier(n_trials=8,
                                                    random_state=0)
        lines += [f"## Direct classification, {task} (raw features)", "",
                  "| model | ACC | AUC |", "|---|---|---|"]
        for name, model in models.items():
            acc, auc = score(model, Xtr, ytr, Xte, yte)
            print(f"    {name}: ACC {acc:.3f} AUC {auc:.3f}", flush=True)
            lines.append(f"| {name} | {acc:.3f} | {auc:.3f} |")
            if task.startswith("3-class"):
                multi_acc[name] = acc
        lines.append("")

    # Regression guards (round-5): an asset swap must not silently undo
    # the two capability claims this benchmark backs. Both are asserted
    # against SAME-RUN baselines so a split/library change moves both
    # sides together.
    assert svm_ours >= raw_acc + 0.04, (
        "ICL OoF embeddings no longer add information over raw features",
        svm_ours, raw_acc)
    assert svm_ours >= 0.88, (
        "embeddings+SVM regressed below the round-5 floor (committed "
        "0.906, floor leaves ~3/117 test samples of slack)", svm_ours)
    assert multi_acc["AutoICL"] >= multi_acc["GradBoost"], (
        "AutoICL lost to GradBoost on the 3-class task (the round-4 "
        "regression this guard exists to catch)", multi_acc)

    with open(OUT, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
