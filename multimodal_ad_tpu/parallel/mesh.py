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
    remaining devices (like a reshape wildcard).

    A shape smaller than the available device count takes the FIRST
    prod(sizes) devices — the mesh analogue of the reference's ``gpu_id``
    list selecting a subset of GPUs for DataParallel
    (reference models/Resnet3D.py:89-99)."""
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
    want = int(np.prod(sizes))
    if want > n:
        raise ValueError(f"mesh {dict(zip(shape, sizes))} needs {want} "
                         f"devices, only {n} available")
    if want < n:
        # deliberate subset meshes are legitimate (the gpu_id analogue),
        # but a mis-sized shape intending ALL devices would now silently
        # idle the rest — make the subset visible
        import warnings

        warnings.warn(
            f"mesh {dict(zip(shape, sizes))} uses {want} of {n} available "
            f"devices; the remaining {n - want} stay idle", stacklevel=2)
    dev_array = np.asarray(devices[:want]).reshape(sizes)
    return Mesh(dev_array, tuple(shape.keys()))


def make_multislice_mesh(n_slices: int, devices=None) -> Mesh:
    """('replica', 'data') mesh for multi-slice data-parallel training.

    One TPU slice is ICI-connected; separate slices only reach each other
    over DCN (data-center network, ~10-100x lower bandwidth). For pure data
    parallelism across slices, the batch shards over BOTH axes
    (``P(('replica', 'data'))`` — see `data_sharding` with a tuple axis) and
    XLA decomposes the gradient all-reduce hierarchically: the high-traffic
    reduction stays on ICI within each slice and only one partial-sum
    exchange per gradient crosses DCN. The slice axis is OUTERMOST in the
    device array so mesh rows are ICI-contiguous — the layout the XLA
    hierarchical-collective pass expects.

    Devices are grouped into rows by `slice_index` when the platform
    reports it (real multi-slice), falling back to process index then
    device id (faked CPU meshes group into contiguous blocks). For
    multi-host runs call `jax.distributed.initialize` before any device
    query; this helper only arranges devices it is given.
    """
    if devices is None:
        devices = jax.devices()
    if len(devices) % n_slices:
        raise ValueError(f"{len(devices)} devices not divisible into "
                         f"{n_slices} slices")
    devices = sorted(devices, key=lambda d: (getattr(d, "slice_index", 0) or 0,
                                             getattr(d, "process_index", 0),
                                             d.id))
    arr = np.asarray(devices).reshape(n_slices, -1)
    return Mesh(arr, ("replica", "data"))


def data_sharding(mesh: Mesh, axis="data") -> NamedSharding:
    """Sharding for batched arrays: leading dim split along `axis`.

    `axis` may be a tuple of mesh axes (e.g. ``('replica', 'data')`` on a
    multi-slice mesh) — the batch dim then splits over their product."""
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

    Layout note: with the default space-to-depth ResNet stem
    (``ResNet3D(s2d_stem=True)``), keep the PER-SHARD extent of the
    sharded axis even, so the stem's phase-pairing reshape (adjacent
    voxel pairs -> channels) stays shard-local; an odd per-shard extent
    splits phase pairs across shard boundaries and turns the stem reshape
    into a reshard. Measured: an 8-way split of X=16 (per-shard 2) runs
    the same halo-exchange program as the naive stem, numerics equal to
    the unsharded forward (tests/test_sharding.py::Test2DMesh). For
    arbitrary split degrees on odd extents, build the model with
    ``s2d_stem=False`` (checkpoint-compatible — see
    models/resnet3d.generate_model).
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
