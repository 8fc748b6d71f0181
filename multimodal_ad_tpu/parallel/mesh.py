"""Device mesh and sharding helpers.

The reference's only parallelism is single-node ``nn.DataParallel``
(reference models/Resnet3D.py:89-99). Here the equivalent is GSPMD: a
`jax.sharding.Mesh` over every local chip with the batch dimension sharded
along the ``data`` axis. Under `jax.jit`, XLA inserts the gradient
all-reduce (`psum`) over ICI automatically; BatchNorm's `jnp.mean` over the
sharded batch dim likewise becomes a *global* batch mean, so sharded
training matches single-device statistics at matched global batch.

The mesh dict API leaves room for future ``model`` / ``pipeline`` axes
without touching call sites (SURVEY.md §2.5).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: dict | None = None, devices=None) -> Mesh:
    """Build a mesh from an axis-name -> size dict. Size -1 absorbs all
    remaining devices (like a reshape wildcard)."""
    if devices is None:
        devices = jax.devices()
    shape = dict(shape or {"data": -1})
    n = len(devices)
    sizes = list(shape.values())
    if sizes.count(-1) > 1:
        raise ValueError("at most one mesh axis may be -1")
    fixed = int(np.prod([s for s in sizes if s != -1])) if sizes else 1
    if -1 in sizes:
        if n % fixed:
            raise ValueError(f"{n} devices not divisible by fixed axes {fixed}")
        sizes[sizes.index(-1)] = n // fixed
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {dict(zip(shape, sizes))} != {n} devices")
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(shape.keys()))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for batched arrays: leading dim split along `axis`."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """device_put a pytree of host arrays with the batch dim sharded."""
    sh = data_sharding(mesh, axis)

    def put(x):
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    """device_put a pytree fully replicated over the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def spatial_sharding(mesh: Mesh, axis: str = "data",
                     spatial_dim: int = 1) -> NamedSharding:
    """Shard a volume batch along a SPATIAL dimension instead of batch.

    The analogue of LLM sequence parallelism for volumetric workloads
    (SURVEY.md §5): when a single volume is too large for one chip's HBM,
    split its first spatial axis across the mesh. Under jit, XLA GSPMD
    inserts the halo exchanges 3-D convolutions need at shard boundaries —
    no manual ring logic. Not required for ADNI-scale volumes (they fit
    easily); provided as the scale-up path for higher-resolution imaging.
    """
    spec = [None] * 5
    spec[spatial_dim] = axis
    return NamedSharding(mesh, P(*spec))


def pad_to_multiple(batch_np: dict, multiple: int):
    """Pad every array in a host batch dict along dim 0 to a multiple of
    `multiple`, returning (padded_batch, mask). TPU-idiomatic handling of
    ragged final batches: shapes stay static, validity rides a mask that
    the loss/metric code consumes.

    The reference instead lets the final DataLoader batch be smaller
    (reference train_ResNet3D.py:146) — a dynamic shape XLA would recompile
    for.
    """
    n = next(iter(batch_np.values())).shape[0]
    rem = (-n) % multiple
    mask = np.ones((n + rem,), dtype=np.float32)
    if rem:
        mask[n:] = 0.0
        batch_np = {
            k: np.concatenate([v, np.repeat(v[-1:], rem, axis=0)], axis=0)
            for k, v in batch_np.items()
        }
    return batch_np, mask
