"""jit'd train/eval steps, optimizer, and LR schedule.

Optimization parity (reference train_ResNet3D.py:161-194, 214-218):
- class-weighted cross entropy with weights 1/bincount (161-163),
- Adam with decoupled-from-loss weight decay added to the gradient before
  the Adam moments (torch Adam `weight_decay` semantics),
- global-norm gradient clipping at 1.0 *before* the optimizer (217),
- LinearLR warmup (factor 0.1 -> 1.0 over clamp(int(0.1*epochs),1,10)
  epochs) then cosine annealing to lr*1e-4 (172-194). The reference steps
  the schedule per *epoch*; we reproduce that by feeding the schedule
  `epoch` rather than `step`.

TPU-first: a single jit'd step (forward+loss+grad+update) with donated
state; the batch rides in sharded along the mesh's 'data' axis and XLA
all-reduces gradients over ICI. Loss/pred reductions respect the validity
mask from the static-shape batch padding.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    epoch: jnp.ndarray  # drives the per-epoch LR schedule
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)
    # global (never-reset) step counter: folded into the dropout rng so
    # every batch draws a fresh mask, matching torch dropout's per-forward
    # randomness (reference train_ResNet3D.py:207-224)
    step: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))

    def lr(self, schedule):
        return schedule(self.epoch)


def make_epoch_schedule(base_lr: float, num_epochs: int, warmup_frac: float = 0.1,
                        min_lr_factor: float = 1e-4, start_factor: float = 0.1):
    """Warmup->cosine over *epochs* (reference train_ResNet3D.py:172-194).

    torch LinearLR yields factors [0.1, 0.1+0.9/W, ...] reaching 1.0 at
    epoch W; CosineAnnealingLR then runs T_max = epochs - W from lr to
    lr*min_lr_factor.
    """
    warmup = max(1, min(10, int(num_epochs * warmup_frac)))
    cosine = max(1, num_epochs - warmup)
    min_lr = base_lr * min_lr_factor

    warm = optax.linear_schedule(
        init_value=base_lr * start_factor, end_value=base_lr,
        transition_steps=warmup)
    cos = optax.cosine_decay_schedule(
        init_value=base_lr, decay_steps=cosine, alpha=min_lr / base_lr)
    return optax.join_schedules([warm, cos], boundaries=[warmup])


def make_optimizer(schedule, weight_decay: float = 1e-4,
                   grad_clip_norm: float = 1.0, kind: str = "adam"):
    """clip -> (+wd*param) -> adam moments -> -lr scaling.

    `kind='adam'` reproduces torch Adam(weight_decay=..) — wd folded into
    the gradient before the moments (train_ResNet3D.py:165-169).
    `kind='adamw'` is decoupled (train_unet3d.py:159).
    """
    chain = []
    if grad_clip_norm:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    if kind == "adam":
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
        chain.append(optax.scale_by_adam())
    elif kind == "adamw":
        chain.append(optax.scale_by_adam())
        if weight_decay:
            chain.append(optax.add_decayed_weights(weight_decay))
    else:
        raise ValueError(kind)
    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain)


def create_train_state(model, rng, sample_batch, schedule, weight_decay=1e-4,
                       grad_clip_norm=1.0, optimizer="adam") -> TrainState:
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
        sample_batch["image"][:1], train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(schedule, weight_decay, grad_clip_norm, optimizer)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        epoch=jnp.zeros((), jnp.int32),
        tx=tx,
        apply_fn=model.apply,
    )


def weighted_ce(logits, labels, class_weights, mask):
    """Class-weighted cross entropy, masked, mean-reduced the way torch
    CrossEntropyLoss(weight=w) reduces: sum(w_i * nll_i) / sum(w_i)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    w = class_weights[labels] * mask
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-8)


def make_train_step(num_classes: int = 2):
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, class_weights, dropout_rng):
        # fold the global step so each batch gets a fresh dropout mask
        # (torch re-randomizes per forward; epoch-only folding froze the
        # mask within an epoch)
        rng = jax.random.fold_in(dropout_rng, state.step)

        def loss_fn(params):
            logits, updates = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"], train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            loss = weighted_ce(logits, batch["label"], class_weights, batch["mask"])
            return loss, (logits, updates["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return state.replace(params=new_params, batch_stats=new_stats,
                             opt_state=new_opt, step=state.step + 1), loss, probs

    return train_step


def make_eval_step():
    @jax.jit
    def eval_step(state: TrainState, batch):
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], train=False)
        logits = logits.astype(jnp.float32)
        # unweighted CE at eval (reference train_ResNet3D.py:239)
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(logp, batch["label"][:, None], axis=1)[:, 0]
        loss = jnp.sum(nll * batch["mask"]) / jnp.maximum(
            jnp.sum(batch["mask"]), 1e-8)
        return loss, jax.nn.softmax(logits, axis=-1)

    return eval_step


def next_epoch(state: TrainState) -> TrainState:
    return state.replace(epoch=state.epoch + 1)


def make_stats_pass(momentum: float = 0.9):
    """Precise-BN: recover a batch's RAW BatchNorm statistics from one
    mutable forward (flax stores the EMA-updated value, so solve
    batch = (new - m*old) / (1-m))."""

    @jax.jit
    def stats_pass(state: TrainState, batch):
        _, upd = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        return jax.tree_util.tree_map(
            lambda new, old: (new - momentum * old) / (1.0 - momentum),
            upd["batch_stats"], state.batch_stats)

    return stats_pass


def recompute_batch_stats(state: TrainState, batches, momentum: float = 0.9,
                          max_batches: int | None = None) -> TrainState:
    """Precise-BN (arXiv:2105.07576 practice): re-estimate BatchNorm running
    statistics with the CURRENT parameters by averaging raw batch stats over
    the loader, replacing the lagging training-time EMA.

    Why: running stats initialize at mean=0/var=1 and converge only as
    momentum^steps; short runs (or tiny true variances) leave eval-mode
    predictions miscalibrated long after the model has learned — torch
    behaves identically. One stats pass after an epoch removes the lag
    entirely. Opt-in via Config.precise_bn.

    `batches` is any iterable of device-ready batch dicts (the training
    loader). Returns the state with refreshed batch_stats.
    """
    stats_pass = make_stats_pass(momentum)
    acc = None
    n = 0
    for batch in batches:
        batch = dict(batch)
        batch.pop("subject", None)
        raw = stats_pass(state, batch)
        acc = raw if acc is None else jax.tree_util.tree_map(
            jnp.add, acc, raw)
        n += 1
        if max_batches is not None and n >= max_batches:
            break
    if n == 0:
        return state
    mean_stats = jax.tree_util.tree_map(lambda a: a / n, acc)
    return state.replace(batch_stats=mean_stats)
