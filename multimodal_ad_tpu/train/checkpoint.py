"""Orbax checkpointing with the reference's logical payload, plus resume.

The reference saves per-fold best/final dicts of {epoch, model_state_dict,
optimizer_state_dict, scheduler_state_dict, metrics, config}
(reference train_ResNet3D.py:293-323) and can only *load* them in test
paths — there is no mid-training resume (SURVEY.md §5). Here the same
logical payload (params, batch_stats, opt_state, epoch, metrics, config)
round-trips through Orbax, and `restore_state` resumes training.
"""

from __future__ import annotations

import json
import os


import jax
import numpy as np
import orbax.checkpoint as ocp

from .loop import TrainState


def _tree_of(state: TrainState) -> dict:
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "epoch": state.epoch,
        "step": state.step,
    }


def save_checkpoint(path: str, state: TrainState, metrics: dict | None = None,
                    config: dict | None = None):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _tree_of(state), force=True)
    ckptr.wait_until_finished()
    meta = {
        "metrics": {k: float(v) for k, v in (metrics or {}).items()
                    if np.isscalar(v) or getattr(v, "ndim", 1) == 0},
        "config": config or {},
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)


def restore_state(path: str, template: TrainState) -> tuple[TrainState, dict]:
    """Restore into the structure of `template` (a freshly created state).

    Checkpoints written before the per-step dropout counter existed have no
    'step' entry; restore them with step=0 instead of failing on the tree
    mismatch (only the dropout stream offset differs)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree_util.tree_map(np.asarray, _tree_of(template))
    # Detect the legacy layout EXPLICITLY from checkpoint metadata rather
    # than retrying every restore failure as legacy — a corrupt or
    # architecture-mismatched checkpoint must surface its original error,
    # not a confusing secondary tree-mismatch.
    legacy_no_step = False
    try:
        saved_tree = ckptr.metadata(path).item_metadata.tree
        legacy_no_step = isinstance(saved_tree, dict) and "step" not in saved_tree
    except Exception:
        pass  # metadata unavailable: assume the modern layout
    if legacy_no_step:
        legacy = {k: v for k, v in target.items() if k != "step"}
        tree = dict(ckptr.restore(path, target=legacy))
        tree["step"] = target["step"]
    else:
        tree = ckptr.restore(path, target=target)
    state = template.replace(
        params=tree["params"],
        batch_stats=tree["batch_stats"],
        opt_state=tree["opt_state"],
        epoch=tree["epoch"],
        step=tree["step"],
    )
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.isfile(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def latest_epoch_checkpoint(ckpt_dir: str, prefix: str) -> str | None:
    """Find the newest `{prefix}` checkpoint dir for resume."""
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [d for d in os.listdir(ckpt_dir) if d.startswith(prefix)]
    if not cands:
        return None
    return os.path.join(ckpt_dir, sorted(cands)[-1])
