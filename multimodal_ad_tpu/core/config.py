"""Experiment configuration.

One dataclass-backed config replaces the reference's per-script JSON-dict
``Config`` classes (reference train_ResNet3D.py:24-41, train_unet3d.py:21-32).
It ingests the same JSON key schema (reference config/config.json:1-28) and
adds CLI overrides, defaulted fields, and validation — plus the TPU-specific
knobs (mesh shape, precision policy, prefetch depth) the reference has no
concept of.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field



@dataclass
class Config:
    # ---- data (reference config/config.json keys) ----
    dataroot: str = ""
    label_file: str = ""
    mri_dir: str = ""
    pet_dir: str = ""
    task: str = "ADCN"
    augment: bool = False
    split_ratio: float = 0.2
    seed: int = 42

    # ---- training ----
    num_epochs: int = 100
    batch_size: int = 8
    lr: float = 1e-6
    weight_decay: float = 1e-4  # default mirrors train_ResNet3D.py:32
    dropout_rate: float = 0.5   # default mirrors train_ResNet3D.py:33
    n_splits: int = 5           # default mirrors train_ResNet3D.py:34
    grad_clip_norm: float = 1.0  # train_ResNet3D.py:217
    warmup_frac: float = 0.1    # warmup = clamp(int(epochs*0.1), 1, 10) (train_ResNet3D.py:172)
    min_lr_factor: float = 1e-4  # eta_min = lr * 1e-4 (train_ResNet3D.py:175)
    best_metric_weights: tuple = (0.3, 0.7)  # 0.3*AUC + 0.7*ACC (train_ResNet3D.py:289)

    # ---- model ----
    # intensity normalizer: 'scale_intensity' (MONAI ScaleIntensityd
    # default, reference datasets/ADNI.py:147) or 'adaptive_normal'
    # (percentile [-1,1], reference datasets/AdaptiveNormal.py:20-51 —
    # defined there but never wired; selectable here)
    normalizer: str = "scale_intensity"

    model_type: str = "resnet"
    model_depth: int = 18
    input_W: int = 91
    input_H: int = 109
    input_D: int = 91
    resnet_shortcut: str = "B"
    pretrain_path: str = ""
    nb_class: int = 2
    in_channels: int = 1
    seg_task: bool = False

    # ---- io ----
    checkpoint_dir: str = "checkpoints"
    log_file: str = "training_log1.csv"

    # ---- TPU-native knobs (no reference equivalent) ----
    mesh_shape: dict = field(default_factory=lambda: {"data": -1})  # -1 = all devices
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    prefetch_depth: int = 2
    loader_threads: int = 8
    resume: bool = False  # mid-training resume (reference has none, SURVEY §5)
    # Precise-BN: after each train epoch, re-estimate BatchNorm running
    # stats with current params (one extra forward pass over the train
    # loader). Fixes eval-mode miscalibration in short runs where the EMA
    # (init mean=0/var=1, momentum 0.9) hasn't burned in; torch suffers the
    # same lag, so this is off by default for reference parity.
    precise_bn: bool = False
    hbm_cache: bool = False  # cache the decoded corpus in HBM (device_cache)
    profile_dir: str = ""  # jax.profiler trace output (empty = off)

    extra: dict = field(default_factory=dict)

    @classmethod
    def from_json(cls, path: str, **overrides) -> "Config":
        with open(path) as f:
            d = json.load(f)
        d.update(overrides)
        return cls.from_dict(d)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        names = {f.name for f in dataclasses.fields(cls)}
        known = {k: v for k, v in d.items() if k in names}
        extra = {k: v for k, v in d.items() if k not in names}
        cfg = cls(**known)
        cfg.extra.update(extra)
        return cfg

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d.pop("extra")
        d.update(self.extra)
        return d

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def apply_overrides(self, pairs: list[str]) -> "Config":
        """Apply CLI overrides of the form ``key=value`` (JSON-parsed values)."""
        d = self.to_dict()
        for p in pairs:
            k, _, v = p.partition("=")
            try:
                d[k] = json.loads(v)
            except json.JSONDecodeError:
                d[k] = v
        return Config.from_dict(d)

    def describe(self) -> str:
        lines = ["Configuration Parameters:", "=" * 40]
        for k, v in self.to_dict().items():
            lines.append(f"{k}: {v}")
        lines.append("=" * 40)
        return "\n".join(lines)
