"""ADNI manifest: label CSV -> list of sample records.

Behavioral parity with the reference dataset class
(reference datasets/ADNI.py:21-119):

- label CSV read with ISO-8859-1 encoding (datasets/ADNI.py:36),
- task -> group list mapping with enumerate-order label ids
  (datasets/ADNI.py:63-87) — note ADCN gives AD=0, CN=1, a convention the
  tabular path intentionally flips (SURVEY.md §8 data contracts),
- records of {'MRI': mri_dir/<Subject_ID>.nii, 'label': int, 'Subject': id}
  (datasets/ADNI.py:89-98),
- printed class counts (datasets/ADNI.py:100-107).

Volume decode lives in the input pipeline, not here: the manifest is pure
host metadata, so stratified splitting / K-fold never touches image bytes.
"""

from __future__ import annotations

import os
from collections import Counter

import pandas as pd

TASK_GROUPS = {
    "ADCN": ["AD", "CN"],
    "CNEMCI": ["CN", "EMCI"],
    "LMCIAD": ["LMCI", "AD"],
    "EMCILMCI": ["EMCI", "LMCI"],
    "SMCIPMCI": ["SMCI", "PMCI"],
    "ADCNSMCIPMCI": ["CN", "SMCI", "PMCI", "AD"],
}


class ADNIManifest:
    """Task-filtered list of ADNI samples (paths + integer labels)."""

    def __init__(self, label_file: str, mri_dir: str, task: str = "ADCN",
                 augment: bool = False, pet_dir: str | None = None,
                 verbose: bool = True):
        self.label_file = label_file
        self.mri_dir = mri_dir
        self.pet_dir = pet_dir
        self.task = task
        self.augment = augment

        table = pd.read_csv(label_file, encoding="ISO-8859-1")
        t = task.upper()
        if t not in TASK_GROUPS:
            raise ValueError(f"Unsupported task: {task}")
        groups = TASK_GROUPS[t]
        self.label_dict = {g: i for i, g in enumerate(groups)}

        rows = table[table["Group"].isin(groups)]
        self.data_dict = []
        for subject, group in zip(rows["Subject_ID"], rows["Group"]):
            rec = {
                "MRI": os.path.join(mri_dir, f"{subject}.nii"),
                "label": self.label_dict[group],
                "Subject": subject,
            }
            if pet_dir is not None:
                rec["PET"] = os.path.join(pet_dir, f"{subject}.nii")
            self.data_dict.append(rec)

        if verbose:
            self._print_class_counts()

    @property
    def labels(self):
        return [d["label"] for d in self.data_dict]

    def _print_class_counts(self):
        inv = {v: k for k, v in self.label_dict.items()}
        cnt = Counter(self.labels)
        print(f"\n[ADNI Dataset: {self.task}] class counts:")
        for lbl, num in cnt.items():
            print(f"  {inv[lbl]} ({lbl}): {num}")
        print()

    def __len__(self):
        return len(self.data_dict)

    def __getitem__(self, idx):
        return self.data_dict[idx]
