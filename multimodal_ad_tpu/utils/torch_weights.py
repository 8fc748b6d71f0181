"""MedicalNet (PyTorch) pretrained-weight ingestion for the 3D ResNets.

The reference loads MedicalNet `.pth` checkpoints by key-intersection
state-dict merge (reference train_ResNet3D.py:74-81,
models/Resnet3D.py:104-109): model keys present in the checkpoint are
replaced, everything else keeps its init. This module reproduces those
semantics across frameworks:

- torch Conv3d weights are OIDHW; flax nn.Conv kernels are DHWIO
  (transpose (2, 3, 4, 1, 0)),
- BatchNorm weight/bias -> scale/bias params; running_mean/var ->
  batch_stats,
- 'module.' DataParallel prefixes are stripped,
- only intersecting keys load (partial transfer), with a report of
  loaded / skipped names.

The torch checkpoint is read with torch CPU (baked in) purely as a byte
decoder — no torch compute.
"""

from __future__ import annotations

import numpy as np

from ..models.resnet3d import DEPTH_BLOCKS


def load_torch_state_dict(path: str) -> dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    out = {}
    for k, v in state.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    return out


def _conv_entries(torch_prefix, flax_path_conv, flax_path_bn):
    """(torch_name, flax_collection, flax_path, transform) rows for one
    conv+bn pair."""
    t = lambda w: np.transpose(w, (2, 3, 4, 1, 0))  # OIDHW -> DHWIO
    rows = [
        (f"{torch_prefix[0]}.weight", "params", flax_path_conv + ("kernel",), t),
    ]
    if torch_prefix[1] is not None:
        bn = torch_prefix[1]
        rows += [
            (f"{bn}.weight", "params", flax_path_bn + ("scale",), None),
            (f"{bn}.bias", "params", flax_path_bn + ("bias",), None),
            (f"{bn}.running_mean", "batch_stats", flax_path_bn + ("mean",), None),
            (f"{bn}.running_var", "batch_stats", flax_path_bn + ("var",), None),
        ]
    return rows


def resnet3d_name_map(depth: int, shortcut_type: str = "B") -> list:
    """Ordered (torch_name, collection, flax_path, transform) mapping for
    the MedicalNet ResNet backbone (reference models/resnet.py:112-202
    naming: conv1/bn1, layer{1..4}.{j}.conv{1..3}/bn{1..3}, downsample.0/1)."""
    kind, layers = DEPTH_BLOCKS[depth]
    block_name = "BasicBlock" if kind == "basic" else "Bottleneck"
    n_convs = 2 if kind == "basic" else 3

    rows = _conv_entries(("conv1", "bn1"), ("Conv_0",), ("BatchNorm_0",))

    stage_spec = [(64, 1), (128, 2), (256, 1), (512, 1)]  # (planes, stride)
    block_idx = 0
    in_features = 64
    expansion = 1 if kind == "basic" else 4
    for si, ((planes, stride), n_blocks) in enumerate(zip(stage_spec, layers)):
        for bj in range(n_blocks):
            tp = f"layer{si + 1}.{bj}"
            fp = f"{block_name}_{block_idx}"
            for ci in range(n_convs):
                rows += _conv_entries(
                    (f"{tp}.conv{ci + 1}", f"{tp}.bn{ci + 1}"),
                    (fp, f"ConvBN_{ci}", "Conv_0"),
                    (fp, f"ConvBN_{ci}", "BatchNorm_0"))
            out_features = planes * expansion
            first_stride = stride if bj == 0 else 1
            if (first_stride != 1 or in_features != out_features) \
                    and shortcut_type != "A":
                rows += _conv_entries(
                    (f"{tp}.downsample.0", f"{tp}.downsample.1"),
                    (fp, f"ConvBN_{n_convs}", "Conv_0"),
                    (fp, f"ConvBN_{n_convs}", "BatchNorm_0"))
            in_features = out_features
            block_idx += 1
    return rows


def _set_path(tree: dict, path: tuple, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def _get_path(tree: dict, path: tuple):
    node = tree
    for p in path:
        node = node[p]
    return node


def load_medicalnet_weights(variables, state_dict: dict, depth: int,
                            shortcut_type: str = "B", verbose: bool = False):
    """Merge intersecting MedicalNet weights into flax `variables`
    ({'params', 'batch_stats'}). Returns (new_variables, report)."""
    import jax

    # deep-copy into plain nested dicts of mutable numpy arrays
    variables = jax.tree_util.tree_map(np.array, _to_plain({
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
    }))

    loaded, skipped, mismatched = [], [], []
    for tname, coll, fpath, tf in resnet3d_name_map(depth, shortcut_type):
        if tname not in state_dict:
            skipped.append(tname)
            continue
        w = state_dict[tname]
        if tf is not None:
            w = tf(w)
        try:
            cur = _get_path(variables[coll], fpath)
        except KeyError:
            skipped.append(tname)
            continue
        if cur.shape != w.shape:
            mismatched.append((tname, cur.shape, w.shape))
            continue
        _set_path(variables[coll], fpath, w.astype(cur.dtype))
        loaded.append(tname)

    report = {"loaded": loaded, "skipped": skipped, "mismatched": mismatched}
    if verbose:
        print(f"[medicalnet] loaded {len(loaded)} tensors, "
              f"skipped {len(skipped)}, mismatched {len(mismatched)}")
    return variables, report


def _to_plain(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _to_plain(v) for k, v in tree.items()}
    return tree
