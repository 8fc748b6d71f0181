"""Serving: load a trained fold ensemble and predict on volumes.

The reference's only inference surface is the offline test script
(reference test.py:96-222 / train_ResNet3D.py:335-446), which rebuilds the
model per fold and loops folds in Python. For deployment this module
packages the same fold ensemble behind one object:

- every fold's parameters are STACKED into a leading fold axis and the
  forward is `jax.vmap`'d over it — one compiled executable evaluates all
  folds in a single device launch (fold-parallel on the MXU) instead of K
  sequential forwards,
- inputs are padded to a static batch so one compilation serves any
  request size,
- probabilities are averaged over folds on device; only the final
  (B, num_classes) array crosses back to host.

Usage:
    pred = EnsemblePredictor.from_checkpoint_dir("checkpoints/")
    proba = pred.predict_proba(volumes)   # (n, X, Y, Z[, C]) -> (n, C)
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from .core.config import Config
from .data.transforms import VolumeTransform
from .models.resnet3d import generate_model
from .train import checkpoint as ckpt
from .train.loop import create_train_state, make_epoch_schedule


def _stack_trees(trees):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


class EnsemblePredictor:
    """Fold-ensemble classifier over 3D volumes (one vmapped executable).

    Pass `mesh` (jax.sharding.Mesh with a 'data' axis) to shard each
    request batch over the mesh's devices: parameters replicate, the batch
    dimension splits, and GSPMD inserts the (absent — inference has no
    collectives) communication. `batch_size` must then be divisible by the
    data-axis size."""

    def __init__(self, model, fold_variables: list, batch_size: int = 8,
                 normalizer: str = "scale_intensity", mesh=None):
        self.model = model
        self.n_folds = len(fold_variables)
        self.batch_size = int(batch_size)
        self.transform = VolumeTransform(augment=False, normalizer=normalizer)
        self._stacked = _stack_trees(fold_variables)
        self.mesh = mesh
        if mesh is not None:
            from .parallel.mesh import replicate
            if self.batch_size % mesh.shape["data"] != 0:
                raise ValueError(
                    f"batch_size={self.batch_size} not divisible by the "
                    f"mesh data axis ({mesh.shape['data']})")
            self._stacked = replicate(self._stacked, mesh)

        def one_fold(variables, x):
            return jax.nn.softmax(
                model.apply(variables, x, train=False).astype(jnp.float32),
                axis=-1)

        # vmap over the stacked fold axis; mean over folds on device
        self._fwd = jax.jit(
            lambda stacked, x: jnp.mean(
                jax.vmap(one_fold, in_axes=(0, None))(stacked, x), axis=0))

    # ---- construction -------------------------------------------------

    @classmethod
    def from_checkpoint_dir(cls, ckpt_dir: str, cfg: Config | None = None,
                            prefix: str = "best_fold",
                            batch_size: int | None = None, mesh=None):
        """Load every `{prefix}{k}` checkpoint (k = 1..) from a train_cv
        output directory. The training config is recovered from the
        checkpoints' meta.json unless `cfg` is given."""
        folds = []
        k = 1
        while os.path.isdir(os.path.join(ckpt_dir, f"{prefix}{k}")):
            folds.append(os.path.join(ckpt_dir, f"{prefix}{k}"))
            k += 1
        if not folds:
            raise FileNotFoundError(f"no {prefix}* checkpoints in {ckpt_dir}")

        if cfg is None:
            meta_path = os.path.join(folds[0], "meta.json")
            with open(meta_path) as f:
                cfg = Config.from_dict(json.load(f).get("config", {}))

        model = generate_model(
            model_type=cfg.model_type, model_depth=cfg.model_depth,
            resnet_shortcut=cfg.resnet_shortcut, nb_class=cfg.nb_class,
            dropout_rate=cfg.dropout_rate, in_channels=cfg.in_channels,
            compute_dtype=jnp.dtype(cfg.compute_dtype),
            param_dtype=jnp.dtype(cfg.param_dtype))
        shape = (cfg.input_W, cfg.input_H, cfg.input_D)
        schedule = make_epoch_schedule(cfg.lr, cfg.num_epochs)
        template = create_train_state(
            model, jax.random.PRNGKey(0),
            {"image": jnp.zeros((1, *shape, cfg.in_channels), jnp.float32)},
            schedule, cfg.weight_decay, cfg.grad_clip_norm, "adam")

        variables = []
        for path in folds:
            state, _ = ckpt.restore_state(path, template)
            variables.append({"params": state.params,
                              "batch_stats": state.batch_stats})
        return cls(model, variables, batch_size=batch_size or cfg.batch_size,
                   normalizer=cfg.normalizer, mesh=mesh)

    # ---- int8 serving ---------------------------------------------------

    def quantize_int8(self, calibration_volumes, preprocess: bool = True):
        """Convert the ensemble to int8 serving (models/resnet3d_int8.py:
        BN-folded, per-channel int8 weights, static activation scales —
        measured 1.65x over the bf16 graph at the production operating
        point, benchmarks/ROOFLINE.md). `calibration_volumes` should be a
        small set of REPRESENTATIVE volumes (same distribution as the
        serving traffic); they pass through the same preprocessing as
        predict. Returns self; subsequent predict/predict_proba use the
        quantized folds. Supports every ResNet3D depth (BasicBlock and
        Bottleneck families).

        Like the bf16 path, all folds run through ONE compiled executable:
        fold parameters are stacked and passed as traced arguments (not
        baked per-fold HLO constants), vmapped, and fold-averaged on
        device — one compile and one dispatch per chunk regardless of K.
        Calibration likewise observes all folds in a single vmapped
        folded-fp forward."""
        from .models import resnet3d_int8 as q8

        cal = jnp.asarray(self._prep(
            np.asarray(calibration_volumes, np.float32), preprocess))
        qps = []
        for k in range(self.n_folds):
            variables = jax.tree_util.tree_map(
                lambda s, k=k: np.asarray(s[k]), self._stacked)
            qps.append(q8.export_int8(variables, depth=self.model.depth,
                                      shortcut_type=self.model.shortcut_type))

        # calibration: one vmapped observe pass over all folds
        cal_skel, _ = q8.split_arrays(qps[0])
        cal_stack = [jnp.asarray(np.stack(a)) for a in zip(
            *(q8.split_arrays(qp)[1] for qp in qps))]

        def observe_one(arrs, x):
            return q8.observe_maxes(q8.rehydrate(cal_skel, arrs), x)

        maxes = np.asarray(jax.jit(jax.vmap(observe_one, in_axes=(0, None))
                                   )(cal_stack, cal))  # (K, P)
        keys = q8._block_scale_keys(qps[0])
        fold_scales = maxes / 127.0 + 1e-12

        # serving: fp shadow kernels stripped, int8 arrays stacked
        skel, _ = q8.split_arrays(q8.strip_fp(qps[0]))
        stacked = [jnp.asarray(np.stack(a)) for a in zip(
            *(q8.split_arrays(q8.strip_fp(qp))[1] for qp in qps))]
        svecs = jnp.asarray(fold_scales, jnp.float32)  # (K, P)

        def fold_proba(arrs, svec, x):
            qp = q8.rehydrate(skel, arrs)
            scales = {key: svec[j] for j, key in enumerate(keys)}
            return jax.nn.softmax(
                q8.resnet3d_int8_apply(qp, scales, x), axis=-1)

        self._int8_args = (stacked, svecs)
        self._int8_fwd = jax.jit(
            lambda arrs, sv, x: jnp.mean(
                jax.vmap(fold_proba, in_axes=(0, 0, None))(arrs, sv, x),
                axis=0))
        return self

    # ---- inference -----------------------------------------------------

    def _prep(self, vols: np.ndarray, preprocess: bool) -> np.ndarray:
        if preprocess:
            # multi-channel volumes normalize per channel (each channel is
            # an independent intensity distribution, e.g. MRI + PET)
            def prep(v):
                if v.ndim == 3:
                    return self.transform(v)
                return np.concatenate(
                    [self.transform(v[..., c]) for c in range(v.shape[-1])],
                    axis=-1)

            return np.stack([prep(v) for v in vols])
        if vols.ndim == 4:
            return vols[..., None]
        return vols

    def predict_proba(self, volumes, preprocess: bool = True) -> np.ndarray:
        """(n, X, Y, Z) or (n, X, Y, Z, C) host volumes -> (n, C) fold-mean
        probabilities. Requests are chunked/padded to the static batch so
        any n reuses one compilation."""
        vols = self._prep(np.asarray(volumes, np.float32), preprocess)
        n = vols.shape[0]
        bs = self.batch_size
        out = []
        for i in range(0, n, bs):
            chunk = vols[i:i + bs]
            real = chunk.shape[0]
            if real < bs:  # static-shape pad; padded rows discarded below
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], bs - real, axis=0)])
            if self.mesh is not None:
                from .parallel.mesh import data_sharding
                xd = jax.device_put(chunk, data_sharding(self.mesh))
            else:
                xd = jnp.asarray(chunk)
            if getattr(self, "_int8_fwd", None):
                probs = np.asarray(self._int8_fwd(*self._int8_args, xd))
            else:
                probs = np.asarray(self._fwd(self._stacked, xd))
            out.append(probs[:real])
        return np.concatenate(out, axis=0)

    def predict(self, volumes, preprocess: bool = True) -> np.ndarray:
        """Argmax labels; binary uses the reference's prob>0.5 rule
        (train_ResNet3D.py:388)."""
        proba = self.predict_proba(volumes, preprocess=preprocess)
        if proba.shape[1] == 2:
            return (proba[:, 1] > 0.5).astype(np.int32)
        return np.argmax(proba, axis=1).astype(np.int32)


def evaluate_records(predictor: EnsemblePredictor, records) -> dict:
    """Held-out AUC/ACC of a fold-ensemble predictor on manifest records
    ({'MRI': path, 'label': int} — data/adni.py) — the serving-side twin of
    train/cv.py::test_models' metrics (reference test.py:107-209 evaluation
    with the prob>0.5 binary decision rule, train_ResNet3D.py:388). Used to
    prove end-to-end that int8 quantization preserves a TRAINED ensemble's
    test AUC, not just per-logit tolerances on random weights."""
    from sklearn.metrics import accuracy_score, roc_auc_score

    from .utils import nifti

    vols = np.stack([
        nifti.load(nifti.exists_with_ext(r["MRI"]) or r["MRI"])
        for r in records])
    y = np.asarray([r["label"] for r in records])
    proba = predictor.predict_proba(vols)
    if proba.shape[1] == 2:
        auc = roc_auc_score(y, proba[:, 1])
        pred = (proba[:, 1] > 0.5).astype(int)
    else:
        auc = roc_auc_score(y, proba, multi_class="ovr")
        pred = proba.argmax(-1)
    return {"AUC": float(auc), "ACC": float(accuracy_score(y, pred))}
