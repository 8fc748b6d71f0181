"""U-Net 3D autoencoder (self-supervised reconstruction) trainer.

The reference extracts ROI features from an UNTRAINED UNet3D
(reference image_features.py:40 — no checkpoint load; SURVEY.md §2.3).
This trainer closes that gap: train UNet3D(1,1) as a denoising
reconstruction autoencoder so the 64-channel pre-head decoder map carries
learned anatomy before atlas pooling, and feed the checkpoint to
eval/features.extract_unet_features.

Objective: masked-noise denoising — random voxel dropout on the input,
MSE to the clean volume. Same CV-free single-split discipline as the
U-Net classifier trainer.
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
from ..data.splits import stratified_test_split
from ..data.transforms import make_transforms
from ..models.unet3d import UNet3D
from ..parallel.mesh import make_mesh, replicate
from . import checkpoint as ckpt
from .loop import TrainState


def make_ae_steps(model: UNet3D, noise_rate: float = 0.2):
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, rng_key):
        # fresh noise mask per step (global step counter, see train/loop.py)
        rng = jax.random.fold_in(rng_key, state.step)

        def loss_fn(params):
            keep = jax.random.bernoulli(rng, 1.0 - noise_rate,
                                        batch["image"].shape)
            noisy = batch["image"] * keep.astype(batch["image"].dtype)
            recon, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                noisy, train=True, mutable=["batch_stats"])
            err = (recon - batch["image"]) ** 2
            per_sample = jnp.mean(err, axis=(1, 2, 3, 4))
            loss = jnp.sum(per_sample * batch["mask"]) / jnp.maximum(
                jnp.sum(batch["mask"]), 1e-8)
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state.replace(params=new_params, batch_stats=new_stats,
                             opt_state=new_opt, step=state.step + 1), loss

    @jax.jit
    def eval_step(state: TrainState, batch):
        recon = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], train=False)
        err = (recon - batch["image"]) ** 2
        per_sample = jnp.mean(err, axis=(1, 2, 3, 4))
        return jnp.sum(per_sample * batch["mask"]) / jnp.maximum(
            jnp.sum(batch["mask"]), 1e-8)

    return train_step, eval_step


def train_unet_autoencoder(cfg: Config, records=None, mesh=None, loader=None,
                           model=None, noise_rate: float = 0.2, verbose=True):
    """Returns (best_val_mse, checkpoint_path)."""
    np.random.seed(cfg.seed)
    mesh = mesh or make_mesh(cfg.mesh_shape)
    model = model or UNet3D(in_channels=cfg.in_channels, num_classes=1,
                            dtype=jnp.dtype(cfg.compute_dtype),
                            param_dtype=jnp.dtype(cfg.param_dtype))

    if records is None:
        records = ADNIManifest(cfg.label_file, cfg.mri_dir, cfg.task,
                               augment=False, verbose=verbose).data_dict
    train_val, _ = stratified_test_split(records, 0.2, cfg.seed)
    train_data, val_data = stratified_test_split(train_val, 0.2, cfg.seed)

    _, tf_eval = make_transforms(False, normalizer=cfg.normalizer)
    kw = dict(batch_size=cfg.batch_size, num_threads=cfg.loader_threads)
    if loader is not None:
        kw["loader"] = loader
    loader_tr = VolumeBatcher(train_data, tf_eval, shuffle=True,
                              seed=cfg.seed, **kw)
    loader_vl = VolumeBatcher(val_data, tf_eval, shuffle=False, **kw)

    schedule = optax.cosine_decay_schedule(cfg.lr, max(1, cfg.num_epochs))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(schedule))
    sample = next(iter(loader_vl))
    variables = model.init({"params": jax.random.PRNGKey(cfg.seed)},
                           jnp.asarray(sample["image"][:1]), train=False)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       epoch=jnp.zeros((), jnp.int32), tx=tx,
                       apply_fn=model.apply)
    state = replicate(state, mesh)

    train_step, eval_step = make_ae_steps(model, noise_rate)
    rng_key = jax.random.PRNGKey(cfg.seed + 7)
    os.makedirs(cfg.checkpoint_dir, exist_ok=True)
    best_path = os.path.join(cfg.checkpoint_dir, "unet_ae_best")

    best = np.inf
    for epoch in range(1, cfg.num_epochs + 1):
        t0 = time.time()
        tr_losses, vl_losses = [], []
        for batch in device_prefetch(iter(loader_tr), mesh,
                                     depth=cfg.prefetch_depth):
            batch.pop("subject", None)
            state, loss = train_step(state, batch, rng_key)
            tr_losses.append(loss)
        for batch in device_prefetch(iter(loader_vl), mesh,
                                     depth=cfg.prefetch_depth):
            batch.pop("subject", None)
            vl_losses.append(eval_step(state, batch))
        state = state.replace(epoch=state.epoch + 1)
        # end-of-epoch host fetch only (no per-step D2H sync)
        tr = float(np.mean([float(x) for x in tr_losses]))
        vl = float(np.mean([float(x) for x in vl_losses]))
        if verbose:
            print(f"AE Ep{epoch:03d} | train MSE={tr:.5f} | "
                  f"val MSE={vl:.5f} | {time.time() - t0:.1f}s")
        if vl < best:
            best = vl
            ckpt.save_checkpoint(best_path, state,
                                 metrics={"val_mse": vl, "epoch": epoch},
                                 config=cfg.to_dict())
    return best, best_path


def load_autoencoder_variables(ckpt_path: str, cfg: Config, sample_shape,
                               model=None):
    """Restore AE weights for feature extraction (extract_unet_features's
    `variables` argument)."""
    model = model or UNet3D(in_channels=cfg.in_channels, num_classes=1,
                            dtype=jnp.dtype(cfg.compute_dtype),
                            param_dtype=jnp.dtype(cfg.param_dtype))
    # optimizer structure must match the trainer's for checkpoint restore
    # (schedule-driven adamw carries an extra schedule state)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(optax.cosine_decay_schedule(1e-3, 1)))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, *sample_shape, 1), jnp.float32),
                           train=False)
    template = TrainState(params=variables["params"],
                          batch_stats=variables.get("batch_stats", {}),
                          opt_state=tx.init(variables["params"]),
                          epoch=jnp.zeros((), jnp.int32), tx=tx,
                          apply_fn=model.apply)
    state, _ = ckpt.restore_state(ckpt_path, template)
    return model, {"params": state.params, "batch_stats": state.batch_stats}
