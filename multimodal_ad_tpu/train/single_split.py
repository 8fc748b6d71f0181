"""Single-split trainer (train_unet3d.py parity).

The reference's U-Net classifier script (reference train_unet3d.py:49-218):
64/16/20 split via two seed-42 stratified train_test_splits, AdamW(wd 1e-4),
plain (unweighted) CE, cosine annealing over epochs, fp16 AMP, best
checkpoint by val AUC (state only). Here: same splits and optimization
semantics, bf16 compute instead of AMP, Orbax checkpoint.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..core.config import Config
from ..data.adni import ADNIManifest
from ..data.pipeline import VolumeBatcher
from ..data.splits import stratified_test_split
from ..data.transforms import make_transforms
from ..models.unet3d import UNet3DClassifier
from ..parallel.mesh import make_mesh, replicate
from ..utils.logging import CVLogger
from . import checkpoint as ckpt
from .cv import _run_epoch
from .loop import create_train_state, make_eval_step, make_train_step, next_epoch


def train_unet_classifier(cfg: Config, records=None, mesh=None, loader=None,
                          model=None, verbose=True):
    """Returns (best_val_auc, checkpoint_dir)."""
    np.random.seed(cfg.seed)
    mesh = mesh or make_mesh(cfg.mesh_shape)
    model = model or UNet3DClassifier(
        in_channels=cfg.in_channels, num_classes=cfg.nb_class,
        dtype=jnp.dtype(cfg.compute_dtype),
        param_dtype=jnp.dtype(cfg.param_dtype))

    if records is None:
        records = ADNIManifest(cfg.label_file, cfg.mri_dir, cfg.task,
                               cfg.augment, verbose=verbose).data_dict
    train_val, _test = stratified_test_split(records, 0.2, cfg.seed)
    train_data, val_data = stratified_test_split(train_val, 0.2, cfg.seed)

    tf_train, tf_eval = make_transforms(cfg.augment, seed=cfg.seed,
                                        normalizer=cfg.normalizer)
    batcher_kw = dict(batch_size=cfg.batch_size, num_threads=cfg.loader_threads)
    if loader is not None:
        batcher_kw["loader"] = loader
    loader_tr = VolumeBatcher(train_data, tf_train, shuffle=True,
                              seed=cfg.seed, **batcher_kw)
    loader_vl = VolumeBatcher(val_data, tf_eval, shuffle=False, **batcher_kw)

    # plain cosine over epochs, no warmup (train_unet3d.py:161)
    schedule = optax.cosine_decay_schedule(cfg.lr, max(1, cfg.num_epochs))
    sample = next(iter(VolumeBatcher(train_data[:1], tf_eval, **batcher_kw)))
    state = create_train_state(model, jax.random.PRNGKey(cfg.seed), sample,
                               schedule, weight_decay=cfg.weight_decay,
                               grad_clip_norm=0.0, optimizer="adamw")
    state = replicate(state, mesh)
    # unweighted CE == uniform class weights
    cw = replicate(jnp.ones((cfg.nb_class,), jnp.float32), mesh)
    dropout_rng = jax.random.PRNGKey(cfg.seed + 99)

    train_step = make_train_step(cfg.nb_class)
    eval_step = make_eval_step()
    os.makedirs(cfg.checkpoint_dir, exist_ok=True)
    logger = CVLogger(cfg.checkpoint_dir, csv_name="unet_results.csv")

    best_auc = -np.inf
    best_path = os.path.join(cfg.checkpoint_dir, "best_model")
    for epoch in range(1, cfg.num_epochs + 1):
        t0 = time.time()
        state, tr_loss, tr_m = _run_epoch(
            train_step, state, loader_tr, mesh, train=True, class_weights=cw,
            dropout_rng=dropout_rng, prefetch_depth=cfg.prefetch_depth)
        _, vl_loss, vl_m = _run_epoch(
            eval_step, state, loader_vl, mesh, train=False,
            prefetch_depth=cfg.prefetch_depth)
        lr_now = float(schedule(state.epoch))
        state = next_epoch(state)
        logger.log_epoch(1, epoch, tr_m, tr_loss, vl_m, vl_loss, lr_now)
        if verbose:
            print(f"Epoch {epoch:03d} | Train ACC={tr_m['ACC']:.4f} "
                  f"F1={tr_m['F1']:.4f} AUC={tr_m['AUC']:.4f} | "
                  f"Val ACC={vl_m['ACC']:.4f} F1={vl_m['F1']:.4f} "
                  f"AUC={vl_m['AUC']:.4f} | time={time.time() - t0:.1f}s")
        if vl_m["AUC"] > best_auc:  # best-by-AUC (train_unet3d.py:215)
            best_auc = vl_m["AUC"]
            ckpt.save_checkpoint(best_path, state,
                                 metrics={"val_auc": vl_m["AUC"], "epoch": epoch},
                                 config=cfg.to_dict())
    logger.close()
    return best_auc, cfg.checkpoint_dir
