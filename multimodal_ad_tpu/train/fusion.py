"""Multimodal fusion training: MRI (+PET) (+clinical table) -> diagnosis.

This productizes the reference's *intended-but-unwired* fusion path: the
cross-modal transformer sits unused in models/network.py (SURVEY.md §2.2)
and the multimodal dataset only exists in a notebook
(reference datasets/ADNI.ipynb, SURVEY.md §2.1). BASELINE.json config 5
names the end-to-end capability: MRI embeddings + ADNI_Tabel clinical
features fused on device.

Pipeline per fold (same seed-42 CV skeleton as train/cv.py):
- volumes stream through the threaded loader (MRI + optional PET decoded
  per record),
- the clinical table is embedded per subject with the in-context learner,
  fitted ONLY on that fold's training subjects (no leakage),
- MultimodalClassifier trains with the standard class-weighted CE +
  warmup-cosine recipe.
"""

from __future__ import annotations

import os
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import Config
from ..data.adni import ADNIManifest
from ..data.pipeline import VolumeBatcher, device_prefetch
from ..data.splits import stratified_kfold, stratified_test_split
from ..data.transforms import make_transforms
from ..models.transformer import MultimodalClassifier
from ..parallel.mesh import make_mesh, replicate
from ..utils.logging import CVLogger
from . import checkpoint as ckpt
from .cv import class_weight_vector
from .loop import (TrainState, make_epoch_schedule, make_optimizer,
                   next_epoch, weighted_ce)
from .metrics import calculate_metrics, model_selection_score


def make_fusion_steps(model, arch: str = "cross_transformer"):
    if arch == "daft":
        # DAFTResNet signature: apply(vars, image, table)
        def forward_kwargs(batch):
            return {"table": batch["table"]}
    else:
        def forward_kwargs(batch):
            kw = {}
            if model.use_pet:
                kw["pet"] = batch["pet"]
            if model.use_table:
                kw["table"] = batch["table"]
            return kw

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, class_weights, dropout_rng):
        # per-step fresh dropout mask (global step counter, see train/loop.py)
        rng = jax.random.fold_in(dropout_rng, state.step)

        def loss_fn(params):
            logits, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"], train=True, mutable=["batch_stats"],
                rngs={"dropout": rng}, **forward_kwargs(batch))
            loss = weighted_ce(logits, batch["label"], class_weights,
                               batch["mask"])
            return loss, (logits, updates["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return state.replace(params=new_params, batch_stats=new_stats,
                             opt_state=new_opt, step=state.step + 1), loss, probs

    @jax.jit
    def eval_step(state: TrainState, batch):
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], train=False, **forward_kwargs(batch))
        logits = logits.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(logp, batch["label"][:, None], axis=1)[:, 0]
        loss = jnp.sum(nll * batch["mask"]) / jnp.maximum(
            jnp.sum(batch["mask"]), 1e-8)
        return loss, jax.nn.softmax(logits, axis=-1)

    return train_step, eval_step


def embed_table_per_fold(table_X, table_y, subjects, train_subjects,
                         embedder=None):
    """Fit the tabular embedder on the fold's TRAIN subjects only; embed
    every subject. Returns {subject: vector}."""
    if embedder is None:
        from ..tabular.icl import ICLClassifier
        embedder = ICLClassifier()
    sub_idx = {s: i for i, s in enumerate(subjects)}
    tr = [sub_idx[s] for s in train_subjects if s in sub_idx]
    embedder.fit(table_X[tr], table_y[tr])
    emb = embedder.get_embeddings(table_X)[0]  # (n, d)
    return {s: emb[sub_idx[s]] for s in subjects}


def _fusion_epoch(step_fn, state, loader, mesh, *, train, class_weights=None,
                  dropout_rng=None, prefetch_depth=2):
    losses, labels_l, masks_l, probs_l = [], [], [], []
    for batch in device_prefetch(iter(loader), mesh, depth=prefetch_depth):
        batch = dict(batch)
        batch.pop("subject", None)
        if train:
            state, loss, probs = step_fn(state, batch, class_weights,
                                         dropout_rng)
        else:
            loss, probs = step_fn(state, batch)
        losses.append(loss)
        probs_l.append(probs)
        masks_l.append(batch["mask"])
        labels_l.append(batch["label"])
    # single end-of-epoch host fetch — no per-step D2H sync (see train/cv.py)
    probs = np.concatenate([np.asarray(p) for p in probs_l], axis=0)
    mask = np.concatenate([np.asarray(m) for m in masks_l], axis=0) > 0
    labels = np.concatenate([np.asarray(lb) for lb in labels_l], axis=0)
    mean_loss = float(np.mean([float(lo) for lo in losses]))
    y_true = labels[mask]
    y_pred = np.argmax(probs, -1)[mask]
    y_score = probs[mask, 1]
    return state, mean_loss, calculate_metrics(y_true, y_pred, y_score)


def train_fusion_cv(cfg: Config, use_pet: bool = False, use_table: bool = False,
                    table_data=None, model_kw=None, records=None, mesh=None,
                    loader=None, embedder=None, verbose=True,
                    arch: str = "cross_transformer"):
    """CV training of a fusion model.

    arch: 'cross_transformer' (token fusion, models/transformer.py) or
    'daft' (affine feature-map modulation, models/daft.py — requires
    use_table=True, no PET branch).
    table_data: optional (X, y, subjects) for the clinical branch —
    subjects must match the imaging manifest's Subject ids.
    """
    if arch == "daft" and (not use_table or use_pet):
        raise ValueError("arch='daft' fuses image+table (use_table=True, "
                         "use_pet=False)")
    np.random.seed(cfg.seed)
    mesh = mesh or make_mesh(cfg.mesh_shape)
    if records is None:
        records = ADNIManifest(cfg.label_file, cfg.mri_dir, cfg.task,
                               cfg.augment,
                               pet_dir=cfg.pet_dir if use_pet else None,
                               verbose=verbose).data_dict
    tr_val, test_data = stratified_test_split(records, cfg.split_ratio, cfg.seed)

    if arch == "daft":
        from ..models.daft import DAFTResNet

        model = DAFTResNet(num_classes=cfg.nb_class,
                           dropout_rate=cfg.dropout_rate,
                           dtype=jnp.dtype(cfg.compute_dtype),
                           param_dtype=jnp.dtype(cfg.param_dtype),
                           **(model_kw or {}))
    else:
        model = MultimodalClassifier(
            num_classes=cfg.nb_class, use_pet=use_pet, use_table=use_table,
            dropout=cfg.dropout_rate,
            dtype=jnp.dtype(cfg.compute_dtype),
            param_dtype=jnp.dtype(cfg.param_dtype), **(model_kw or {}))
    train_step, eval_step = make_fusion_steps(model, arch)

    logger = CVLogger(cfg.checkpoint_dir, csv_name="fusion_results.csv")
    tf_train, tf_eval = make_transforms(cfg.augment, seed=cfg.seed,
                                        normalizer=cfg.normalizer)
    schedule = make_epoch_schedule(cfg.lr, cfg.num_epochs, cfg.warmup_frac,
                                   cfg.min_lr_factor)
    image_keys = ("MRI", "PET") if use_pet else ("MRI",)
    batcher_kw = dict(batch_size=cfg.batch_size,
                      num_threads=cfg.loader_threads, image_keys=image_keys)
    if loader is not None:
        batcher_kw["loader"] = loader

    best_scores = []
    for fold, train_data, val_data in stratified_kfold(tr_val, cfg.n_splits,
                                                       cfg.seed):
        if verbose:
            print(f"\n=== Fusion fold {fold}/{cfg.n_splits} ===")
        table_lookup = None
        if use_table:
            if table_data is None:
                raise ValueError("use_table=True requires table_data")
            tX, ty, tsubj = table_data
            table_lookup = embed_table_per_fold(
                tX, ty, tsubj, [r["Subject"] for r in train_data], embedder)

        loader_tr = VolumeBatcher(train_data, tf_train, shuffle=True,
                                  seed=cfg.seed + fold,
                                  table_lookup=table_lookup, **batcher_kw)
        loader_vl = VolumeBatcher(val_data, tf_eval, shuffle=False,
                                  table_lookup=table_lookup, **batcher_kw)

        sample = next(iter(loader_vl))
        rng = jax.random.PRNGKey(cfg.seed + fold)
        if arch == "daft":
            variables = model.init({"params": rng, "dropout": rng},
                                   jnp.asarray(sample["image"][:1]),
                                   jnp.asarray(sample["table"][:1]),
                                   train=False)
        else:
            init_kw = {}
            if use_pet:
                init_kw["pet"] = jnp.asarray(sample["pet"][:1])
            if use_table:
                init_kw["table"] = jnp.asarray(sample["table"][:1])
            variables = model.init({"params": rng, "dropout": rng},
                                   jnp.asarray(sample["image"][:1]),
                                   train=False, **init_kw)
        tx = make_optimizer(schedule, cfg.weight_decay, cfg.grad_clip_norm,
                            "adam")
        state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
            epoch=jnp.zeros((), jnp.int32), tx=tx, apply_fn=model.apply)
        state = replicate(state, mesh)
        cw = replicate(jnp.asarray(class_weight_vector(
            [d["label"] for d in train_data], cfg.nb_class)), mesh)
        dropout_rng = jax.random.PRNGKey(cfg.seed * 131 + fold)

        best = -np.inf
        for epoch in range(1, cfg.num_epochs + 1):
            t0 = time.time()
            state, tr_loss, tr_m = _fusion_epoch(
                train_step, state, loader_tr, mesh, train=True,
                class_weights=cw, dropout_rng=dropout_rng,
                prefetch_depth=cfg.prefetch_depth)
            _, vl_loss, vl_m = _fusion_epoch(
                eval_step, state, loader_vl, mesh, train=False,
                prefetch_depth=cfg.prefetch_depth)
            lr_now = float(schedule(state.epoch))
            state = next_epoch(state)
            logger.log_epoch(fold, epoch, tr_m, tr_loss, vl_m, vl_loss, lr_now)
            if verbose:
                print(f"Fold{fold} Ep{epoch:03d} | TR ACC={tr_m['ACC']:.4f} "
                      f"AUC={tr_m['AUC']:.4f} | VL ACC={vl_m['ACC']:.4f} "
                      f"AUC={vl_m['AUC']:.4f} | {time.time() - t0:.1f}s")
            score = model_selection_score(vl_m, cfg.best_metric_weights)
            if score > best:
                best = score
                ckpt.save_checkpoint(
                    os.path.join(cfg.checkpoint_dir, f"fusion_best_fold{fold}"),
                    state, metrics={"val_auc": vl_m["AUC"], "epoch": epoch,
                                    "score": score},
                    config=cfg.to_dict())
        best_scores.append(best)
    logger.close()
    return best_scores, cfg.checkpoint_dir


def test_fusion_models(cfg: Config, test_data, use_pet: bool = False,
                       use_table: bool = False, table_data=None,
                       model_kw=None, mesh=None, loader=None, embedder=None,
                       train_subjects=None, verbose=True,
                       arch: str = "cross_transformer"):
    """Fold-ensemble evaluation of the fusion checkpoints over the held-out
    test split — the cv.test_models twin for the multimodal path
    (reference train_ResNet3D.py:335-446 applied to the productized
    network.py fusion model).

    `train_subjects` restricts the table-embedder fit to training rows so
    no test information leaks into the clinical branch; defaults to every
    subject not in `test_data`."""
    mesh = mesh or make_mesh(cfg.mesh_shape)
    if arch == "daft":
        from ..models.daft import DAFTResNet

        model = DAFTResNet(num_classes=cfg.nb_class,
                           dropout_rate=cfg.dropout_rate,
                           dtype=jnp.dtype(cfg.compute_dtype),
                           param_dtype=jnp.dtype(cfg.param_dtype),
                           **(model_kw or {}))
    else:
        model = MultimodalClassifier(
            num_classes=cfg.nb_class, use_pet=use_pet, use_table=use_table,
            dropout=cfg.dropout_rate, dtype=jnp.dtype(cfg.compute_dtype),
            param_dtype=jnp.dtype(cfg.param_dtype), **(model_kw or {}))
    _, eval_step = make_fusion_steps(model, arch)

    table_lookup = None
    if use_table:
        if table_data is None:
            raise ValueError("use_table=True requires table_data")
        tX, ty, tsubj = table_data
        if train_subjects is None:
            test_ids = {r["Subject"] for r in test_data}
            train_subjects = [s for s in tsubj if s not in test_ids]
        table_lookup = embed_table_per_fold(tX, ty, tsubj, train_subjects,
                                            embedder)

    _, tf_eval = make_transforms(False, normalizer=cfg.normalizer)
    image_keys = ("MRI", "PET") if use_pet else ("MRI",)
    batcher_kw = dict(batch_size=cfg.batch_size,
                      num_threads=cfg.loader_threads, image_keys=image_keys)
    if loader is not None:
        batcher_kw["loader"] = loader
    loader_te = VolumeBatcher(test_data, tf_eval, shuffle=False,
                              table_lookup=table_lookup, **batcher_kw)
    schedule = make_epoch_schedule(cfg.lr, cfg.num_epochs, cfg.warmup_frac,
                                   cfg.min_lr_factor)

    sample = next(iter(loader_te))
    rng = jax.random.PRNGKey(0)
    if arch == "daft":
        variables = model.init({"params": rng, "dropout": rng},
                               jnp.asarray(sample["image"][:1]),
                               jnp.asarray(sample["table"][:1]), train=False)
    else:
        init_kw = {}
        if use_pet:
            init_kw["pet"] = jnp.asarray(sample["pet"][:1])
        if use_table:
            init_kw["table"] = jnp.asarray(sample["table"][:1])
        variables = model.init({"params": rng, "dropout": rng},
                               jnp.asarray(sample["image"][:1]),
                               train=False, **init_kw)
    tx = make_optimizer(schedule, cfg.weight_decay, cfg.grad_clip_norm,
                        "adam")
    template = TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        epoch=jnp.zeros((), jnp.int32), tx=tx, apply_fn=model.apply)

    all_metrics = []
    for fold in range(1, cfg.n_splits + 1):
        state, _ = ckpt.restore_state(
            os.path.join(cfg.checkpoint_dir, f"fusion_best_fold{fold}"),
            template)
        state = replicate(state, mesh)
        _, _, m = _fusion_epoch(eval_step, state, loader_te, mesh,
                                train=False,
                                prefetch_depth=cfg.prefetch_depth)
        all_metrics.append(m)
        if verbose:
            print(f"fusion fold {fold} test: ACC={m['ACC']:.4f} "
                  f"AUC={m['AUC']:.4f}")
    keys = ("ACC", "PRE", "SEN", "SPE", "F1", "AUC", "MCC")
    avg = {k: float(np.mean([m[k] for m in all_metrics])) for k in keys}
    return {"avg": avg, "per_fold": all_metrics}
