"""Stratified K-fold cross-validation runner + fold-ensemble test.

The canonical training path (reference train_ResNet3D.py:111-333):
seed 42 -> manifest -> 80/20 stratified test split -> StratifiedKFold CV;
per fold: loaders, model, class-weighted CE (1/bincount), Adam + warmup->
cosine, grad clip 1.0, per-epoch train+val 7-metric eval, TB+CSV logging,
best checkpoint by 0.3*AUC + 0.7*ACC, final checkpoint; then a per-fold
test over the held-out 20% with pooled ROC (test_models, 335-446).

The reference copy-pastes this harness per experiment
(train_resnet3d2.py, test.py — SURVEY.md §1); here it is one library
function parameterized by config.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..data.adni import ADNIManifest
from ..data.pipeline import VolumeBatcher, device_prefetch
from ..data.splits import stratified_kfold, stratified_test_split
from ..data.transforms import make_transforms
from ..models.resnet3d import generate_model
from ..parallel.mesh import make_mesh, replicate
from ..utils.logging import CVLogger
from ..utils.profiling import StepTimer, trace
from . import checkpoint as ckpt
from .loop import (create_train_state, make_epoch_schedule, make_eval_step,
                   make_train_step, next_epoch)
from .metrics import (calculate_metrics, calculate_metrics_multiclass,
                      model_selection_score)


def class_weight_vector(labels, num_classes: int) -> np.ndarray:
    """1 / bincount (reference train_ResNet3D.py:161-163)."""
    counts = np.bincount(labels, minlength=num_classes).astype(np.float32)
    return 1.0 / np.maximum(counts, 1.0)


def _run_epoch(step_fn, state, loader, mesh, *, train, class_weights=None,
               dropout_rng=None, prefetch_depth=2, timer=None):
    """One pass over `loader`; returns (state, mean_loss, metrics).

    Device-resident loaders (HBM cache) bypass the host->HBM prefetch stage;
    streaming loaders get the double-buffered sharded device_put wrapper.
    """
    if getattr(loader, "device_resident", False):
        batches = iter(loader)
    else:
        batches = device_prefetch(iter(loader), mesh, depth=prefetch_depth)

    losses, labels_l, masks_l, probs_l = [], [], [], []
    for batch in batches:
        batch = dict(batch)
        batch.pop("subject", None)
        ctx = timer if timer is not None else contextlib.nullcontext()
        with ctx:
            if train:
                state, loss, probs = step_fn(state, batch, class_weights,
                                             dropout_rng)
            else:
                loss, probs = step_fn(state, batch)
            if timer is not None:
                # profiling mode: a device->host fetch is the only true sync
                # on the hosted tunnel (block_until_ready is a no-op there),
                # so pay one scalar fetch per step for accurate step times
                loss = float(loss)
        losses.append(loss)
        probs_l.append(probs)
        masks_l.append(batch["mask"])
        labels_l.append(batch["label"])

    # Loss/probs stay ON DEVICE until the epoch ends: one host fetch here
    # instead of a blocking fetch per step, so queued steps dispatch
    # back-to-back and the chip never idles on D2H latency.
    probs = np.concatenate([np.asarray(p) for p in probs_l], axis=0)
    mask = np.concatenate([np.asarray(m) for m in masks_l], axis=0) > 0
    labels = np.concatenate([np.asarray(lb) for lb in labels_l], axis=0)
    mean_loss = float(np.mean([float(lo) for lo in losses]))
    y_true = labels[mask]
    y_pred = np.argmax(probs, axis=-1)[mask]
    y_prob = probs[mask]
    if y_prob.shape[-1] == 2:
        metrics = calculate_metrics(y_true, y_pred, y_prob[:, 1])
    else:
        metrics = calculate_metrics_multiclass(y_true, y_pred, y_prob)
    return state, mean_loss, metrics


def train_cv(cfg: Config, model_factory=None, records=None, mesh=None,
             loader=None, verbose=True):
    """Run the full CV pipeline. Returns (test_results, checkpoint_dir)."""
    np.random.seed(cfg.seed)
    mesh = mesh or make_mesh(cfg.mesh_shape)
    model_factory = model_factory or (lambda: generate_model(
        model_type=cfg.model_type, model_depth=cfg.model_depth,
        resnet_shortcut=cfg.resnet_shortcut, nb_class=cfg.nb_class,
        dropout_rate=cfg.dropout_rate, in_channels=cfg.in_channels,
        compute_dtype=jnp.dtype(cfg.compute_dtype),
        param_dtype=jnp.dtype(cfg.param_dtype)))

    if records is None:
        records = ADNIManifest(cfg.label_file, cfg.mri_dir, cfg.task,
                               cfg.augment, verbose=verbose).data_dict
    tr_val, test_data = stratified_test_split(records, cfg.split_ratio, cfg.seed)

    device_ds = None
    subj_to_idx = {}
    if cfg.hbm_cache:
        # one-time decode + upload of the training corpus; per-epoch batches
        # are gathered on device and never touch the host link
        from ..data.device_cache import build_device_dataset

        if cfg.augment and verbose:
            print("[hbm_cache] using device-side augmentation "
                  "(flip + rotate + zoom, ops/augment.py)")
        kw = {"loader": loader} if loader is not None else {}
        device_ds = build_device_dataset(tr_val, mesh=mesh,
                                         store_dtype=np.float32,
                                         num_threads=cfg.loader_threads, **kw)
        subj_to_idx = {r["Subject"]: i for i, r in enumerate(tr_val)}

    logger = CVLogger(cfg.checkpoint_dir)
    tf_train, tf_eval = make_transforms(cfg.augment, seed=cfg.seed,
                                        normalizer=cfg.normalizer)
    schedule = make_epoch_schedule(cfg.lr, cfg.num_epochs, cfg.warmup_frac,
                                   cfg.min_lr_factor)
    train_step = make_train_step(cfg.nb_class)
    eval_step = make_eval_step()
    batcher_kw = dict(batch_size=cfg.batch_size, num_threads=cfg.loader_threads)
    if loader is not None:
        batcher_kw["loader"] = loader

    for fold, train_data, val_data in stratified_kfold(tr_val, cfg.n_splits, cfg.seed):
        if verbose:
            print(f"\n=== Fold {fold}/{cfg.n_splits} ===")
        if device_ds is not None:
            from ..data.device_cache import DeviceEpochIterator

            subjects = [r["Subject"] for r in tr_val]
            loader_tr = DeviceEpochIterator(
                device_ds, [subj_to_idx[r["Subject"]] for r in train_data],
                cfg.batch_size, shuffle=True, seed=cfg.seed + fold,
                subjects=subjects, augment=cfg.augment,
                normalizer=cfg.normalizer)
            loader_vl = DeviceEpochIterator(
                device_ds, [subj_to_idx[r["Subject"]] for r in val_data],
                cfg.batch_size, subjects=subjects, normalizer=cfg.normalizer)
        else:
            loader_tr = VolumeBatcher(train_data, tf_train, shuffle=True,
                                      seed=cfg.seed + fold, **batcher_kw)
            loader_vl = VolumeBatcher(val_data, tf_eval, shuffle=False,
                                      **batcher_kw)

        model = model_factory()
        rng = jax.random.PRNGKey(cfg.seed + fold)
        sample = next(iter(VolumeBatcher(train_data[:1], tf_eval, **batcher_kw)))
        state = create_train_state(model, rng, sample, schedule,
                                   cfg.weight_decay, cfg.grad_clip_norm, "adam")
        if cfg.pretrain_path and os.path.isfile(cfg.pretrain_path):
            # MedicalNet partial transfer by key intersection
            # (reference train_ResNet3D.py:74-81)
            from ..utils.torch_weights import (load_medicalnet_weights,
                                               load_torch_state_dict)
            sd = load_torch_state_dict(cfg.pretrain_path)
            merged, _ = load_medicalnet_weights(
                {"params": state.params, "batch_stats": state.batch_stats},
                sd, cfg.model_depth, cfg.resnet_shortcut, verbose=verbose)
            state = state.replace(params=merged["params"],
                                  batch_stats=merged["batch_stats"])
            if verbose:
                print("Loaded pretrained weights.")
        elif cfg.pretrain_path and verbose:
            print(f"[Warning] no pretrained file at {cfg.pretrain_path}")
        state = replicate(state, mesh)
        cw = replicate(jnp.asarray(
            class_weight_vector([d["label"] for d in train_data], cfg.nb_class)),
            mesh)
        dropout_rng = jax.random.PRNGKey(cfg.seed * 1000 + fold)

        best_metric = -np.inf
        best_path = os.path.join(cfg.checkpoint_dir, f"best_fold{fold}")
        last_path = os.path.join(cfg.checkpoint_dir, f"last_fold{fold}")
        final_path = os.path.join(cfg.checkpoint_dir, f"model_fold{fold}_final")
        start_epoch = 1
        if cfg.resume and os.path.isdir(last_path):
            # mid-training resume — the capability the reference lacks
            # (SURVEY.md §5 checkpoint entry)
            state, meta = ckpt.restore_state(last_path, state)
            state = replicate(state, mesh)
            done = int(meta.get("metrics", {}).get("epoch", 0))
            best_metric = float(meta.get("metrics", {}).get(
                "best_metric", -np.inf))
            if done >= cfg.num_epochs:
                if verbose:
                    print(f"[resume] fold {fold}: {done}/{cfg.num_epochs} "
                          f"epochs already done; skipping")
                continue
            start_epoch = done + 1
            if verbose:
                print(f"[resume] fold {fold} from epoch {start_epoch}")
        # per-step timing costs one sync per step — only pay it when profiling
        step_timer = StepTimer() if cfg.profile_dir else None
        for epoch in range(start_epoch, cfg.num_epochs + 1):
            t0 = time.time()
            # profile the steady-state epoch (2nd — past compilation)
            prof = trace(cfg.profile_dir) if (
                cfg.profile_dir and fold == 1 and epoch == 2
            ) else contextlib.nullcontext()
            with prof:
                state, tr_loss, tr_m = _run_epoch(
                    train_step, state, loader_tr, mesh, train=True,
                    class_weights=cw, dropout_rng=dropout_rng,
                    prefetch_depth=cfg.prefetch_depth, timer=step_timer)
            if cfg.precise_bn:
                from .loop import recompute_batch_stats

                if getattr(loader_tr, "device_resident", False):
                    stat_batches = iter(loader_tr)
                else:
                    stat_batches = device_prefetch(
                        iter(loader_tr), mesh, depth=cfg.prefetch_depth)
                state = recompute_batch_stats(state, stat_batches)
            _, vl_loss, vl_m = _run_epoch(
                eval_step, state, loader_vl, mesh, train=False,
                prefetch_depth=cfg.prefetch_depth)

            lr_now = float(schedule(state.epoch))
            state = next_epoch(state)
            logger.log_epoch(fold, epoch, tr_m, tr_loss, vl_m, vl_loss, lr_now)
            if verbose:
                print(f"Fold{fold} Ep{epoch:03d} | "
                      f"TR ACC={tr_m['ACC']:.4f} AUC={tr_m['AUC']:.4f} "
                      f"loss={tr_loss:.4f} | "
                      f"VL ACC={vl_m['ACC']:.4f} AUC={vl_m['AUC']:.4f} "
                      f"loss={vl_loss:.4f} | lr={lr_now:.2e} "
                      f"time={time.time() - t0:.1f}s")

            score = model_selection_score(vl_m, cfg.best_metric_weights)
            if score > best_metric:
                best_metric = score
                ckpt.save_checkpoint(
                    best_path, state,
                    metrics={"train_auc": tr_m["AUC"], "val_auc": vl_m["AUC"],
                             "val_loss": vl_loss, "current_metric": score,
                             "epoch": epoch},
                    config=cfg.to_dict())
            if cfg.resume:  # rolling resume point
                ckpt.save_checkpoint(
                    last_path, state,
                    metrics={"epoch": epoch, "best_metric": best_metric},
                    config=cfg.to_dict())

        if verbose and step_timer is not None and step_timer.times:
            st = step_timer.summary()
            print(f"Fold{fold} train-step timing: mean={st['mean_s']*1000:.1f}ms "
                  f"p50={st['p50_s']*1000:.1f}ms p95={st['p95_s']*1000:.1f}ms "
                  f"({st['steps']} steps)")
        ckpt.save_checkpoint(
            final_path, state,
            metrics={"train_auc": tr_m["AUC"], "val_auc": vl_m["AUC"],
                     "val_loss": vl_loss},
            config=cfg.to_dict())

    logger.close()
    results = test_models(cfg, test_data, model_factory=model_factory,
                          mesh=mesh, loader=loader, verbose=verbose)
    return results, cfg.checkpoint_dir


def test_models(cfg: Config, test_data, model_factory=None, mesh=None,
                loader=None, verbose=True, plot=True):
    """Per-fold test evaluation + pooled ROC
    (reference train_ResNet3D.py:335-446, test.py:107-209).

    Fixes the reference's lowercase-key KeyError in its final print
    (train_ResNet3D.py:443-444, SURVEY.md §8.2).
    """
    mesh = mesh or make_mesh(cfg.mesh_shape)
    model_factory = model_factory or (lambda: generate_model(
        model_type=cfg.model_type, model_depth=cfg.model_depth,
        resnet_shortcut=cfg.resnet_shortcut, nb_class=cfg.nb_class,
        dropout_rate=cfg.dropout_rate, in_channels=cfg.in_channels,
        compute_dtype=jnp.dtype(cfg.compute_dtype),
        param_dtype=jnp.dtype(cfg.param_dtype)))

    _, tf_eval = make_transforms(False, normalizer=cfg.normalizer)
    batcher_kw = dict(batch_size=cfg.batch_size, num_threads=cfg.loader_threads)
    if loader is not None:
        batcher_kw["loader"] = loader
    loader_te = VolumeBatcher(test_data, tf_eval, shuffle=False, **batcher_kw)
    eval_step = make_eval_step()
    schedule = make_epoch_schedule(cfg.lr, cfg.num_epochs)

    all_metrics, all_probs, all_labels, fold_curves = [], [], [], []
    for fold in range(1, cfg.n_splits + 1):
        model = model_factory()
        sample = next(iter(VolumeBatcher(test_data[:1], tf_eval, **batcher_kw)))
        # optimizer chain structure must match training's exactly (same
        # grad_clip_norm / optimizer kind), else Orbax restore fails on a
        # tree-structure mismatch
        template = create_train_state(model, jax.random.PRNGKey(0), sample,
                                      schedule, cfg.weight_decay,
                                      cfg.grad_clip_norm, "adam")
        state, _ = ckpt.restore_state(
            os.path.join(cfg.checkpoint_dir, f"best_fold{fold}"), template)
        state = replicate(state, mesh)

        probs_l, masks_l, labels_l = [], [], []
        for batch in device_prefetch(iter(loader_te), mesh,
                                     depth=cfg.prefetch_depth):
            batch.pop("subject")
            _, p = eval_step(state, batch)
            probs_l.append(p)
            masks_l.append(batch["mask"])
            labels_l.append(batch["label"])
        # one end-of-pass host fetch (no per-step D2H sync)
        mask = np.concatenate([np.asarray(m) for m in masks_l]) > 0
        prob_mat = np.concatenate([np.asarray(p) for p in probs_l])[mask]
        labels = np.concatenate(
            [np.asarray(lb) for lb in labels_l])[mask].tolist()

        if prob_mat.shape[-1] > 2:
            # multiclass tasks (e.g. ADCNSMCIPMCI): argmax decision + macro
            # metrics — the reference's tester is binary-only
            # (train_ResNet3D.py:388); divergence documented in README
            probs = prob_mat.tolist()
            y_pred = prob_mat.argmax(-1)
            m = calculate_metrics_multiclass(labels, y_pred, prob_mat)
        else:
            # test-time decision rule: prob > 0.5 (train_ResNet3D.py:388)
            probs = prob_mat[:, 1].tolist()
            y_pred = (np.array(probs) > 0.5).astype(int)
            m = calculate_metrics(labels, y_pred, probs)
        all_metrics.append(m)
        all_probs.extend(probs)
        all_labels.extend(labels)
        fold_curves.append((labels, probs))
        if verbose:
            print(f"\n=== Fold {fold} Test Metrics ===")
            for k in ("ACC", "PRE", "SEN", "SPE", "F1", "AUC", "MCC"):
                print(f"{k}: {m[k]:.4f}")
            print("Confusion Matrix:\n", m["cm"])

    keys = ("ACC", "PRE", "SEN", "SPE", "F1", "AUC", "MCC")
    avg = {k: float(np.mean([m[k] for m in all_metrics])) for k in keys}
    std = {k: float(np.std([m[k] for m in all_metrics])) for k in keys}
    if verbose:
        print("\n=== Final Test Results ===")
        for k in keys:
            print(f"{k}: {avg[k]:.4f} ± {std[k]:.4f}")

    if plot and fold_curves and np.ndim(fold_curves[0][1][0]) == 0:
        # pooled ROC is a binary-task artifact; multiclass folds carry full
        # probability rows and skip the plot
        try:
            _plot_roc(fold_curves, all_labels, all_probs,
                      os.path.join(cfg.checkpoint_dir, "test_roc_curves.png"))
        except Exception as e:  # matplotlib optional
            if verbose:
                print(f"[warn] ROC plot skipped: {e}")

    return {"avg": avg, "std": std, "per_fold": all_metrics,
            "pooled": {"labels": all_labels, "probs": all_probs}}


def _plot_roc(fold_curves, all_labels, all_probs, out_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.metrics import auc as sk_auc
    from sklearn.metrics import roc_curve

    plt.figure(figsize=(10, 8))
    for i, (labels, probs) in enumerate(fold_curves, 1):
        fpr, tpr, _ = roc_curve(labels, probs)
        plt.plot(fpr, tpr, lw=1, alpha=0.3,
                 label=f"Fold {i} (AUC={sk_auc(fpr, tpr):.2f})")
    fpr, tpr, _ = roc_curve(all_labels, all_probs)
    mean_fpr = np.linspace(0, 1, 100)
    plt.plot(mean_fpr, np.interp(mean_fpr, fpr, tpr), "b-", lw=2,
             label=f"Mean ROC (AUC={sk_auc(fpr, tpr):.2f})")
    plt.plot([0, 1], [0, 1], "k--", lw=2)
    plt.xlim([0.0, 1.0])
    plt.ylim([0.0, 1.05])
    plt.xlabel("False Positive Rate")
    plt.ylabel("True Positive Rate")
    plt.title("Test ROC Curves")
    plt.legend(loc="lower right")
    plt.savefig(out_path, dpi=300, bbox_inches="tight")
    plt.close()
