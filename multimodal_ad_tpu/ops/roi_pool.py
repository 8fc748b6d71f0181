"""AAL atlas ROI pooling: per-region mean of voxel features.

The reference computes this as a dense broadcast product
(B,1,C,D,H,W) x (1,R,1,D,H,W) summed over space
(reference image_features.py:111-114) — materializing a B*R*C*N-element
intermediate. SURVEY.md §3.3 marks it the #1 kernel target.

TPU-native formulation: a segment-sum over the label volume, expressed as a
one-hot matmul so it runs on the MXU:

    sums[b, r, c] = sum_n [label[n] == r+1] * feats[b, n, c]
                  = (onehot^T @ feats)  with onehot[n, r] built on the fly

Two implementations with identical semantics:
- `roi_pool_xla`: jnp one-hot einsum (any backend; XLA already maps the
  contraction to the MXU, but materializes the (N, R) one-hot in HBM),
- `roi_pool_pallas`: Pallas kernel that builds the one-hot tile-by-tile in
  VMEM (never touching HBM with it) and accumulates (R, C) partials in the
  output block across grid steps.

Both take feats (B, X, Y, Z, C) [or (B, N, C)], labels (X, Y, Z) int32
with ROI ids 1..R (0 = background), and return per-ROI means (B, R, C)
float32 with the reference's 1e-6 count clamp (image_features.py:113).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp



def _flatten(feats, labels):
    if feats.ndim == 5:
        b, x, y, z, c = feats.shape
        feats = feats.reshape(b, x * y * z, c)
    labels = jnp.asarray(labels).reshape(-1)
    return feats, labels


def roi_counts(labels, num_rois: int):
    """Voxels per ROI, (R,) float32."""
    labels = jnp.asarray(labels).reshape(-1)
    return jnp.bincount(labels, length=num_rois + 1)[1:].astype(jnp.float32)


def roi_pool_xla(feats, labels, num_rois: int):
    feats, labels = _flatten(feats, labels)
    onehot = (labels[:, None] == jnp.arange(1, num_rois + 1)[None, :])
    onehot = onehot.astype(feats.dtype)
    sums = jnp.einsum("bnc,nr->brc", feats, onehot,
                      preferred_element_type=jnp.float32)
    counts = jnp.sum(onehot, axis=0).astype(jnp.float32)
    return sums / jnp.clip(counts, 1e-6)[None, :, None]


def _round_up(x, m):
    return (x + m - 1) // m * m


def _roi_pool_kernel(labels_ref, feats_ref, out_ref):
    """Grid (N//TILE_N,): build the one-hot tile ONCE per spatial tile
    (VPU compare), then reuse it for every batch sample's MXU contraction —
    the one-hot never round-trips through HBM."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    labels = labels_ref[:]  # (TILE_N, 1) int32
    r_pad = out_ref.shape[1]
    roi_ids = jax.lax.broadcasted_iota(jnp.int32, (labels.shape[0], r_pad), 1)
    onehot = (labels == roi_ids + 1).astype(feats_ref.dtype)
    b = feats_ref.shape[0]
    for i in range(b):  # static unroll over batch
        out_ref[i] += jax.lax.dot_general(
            onehot, feats_ref[i],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


try:  # Pallas is TPU/importable-optional
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False


def roi_pool_pallas(feats, labels, num_rois: int, tile_n: int = 2048,
                    interpret: bool = False):
    feats, labels = _flatten(feats, labels)
    b, n, c = feats.shape
    r_pad = _round_up(num_rois, 128)
    n_pad = _round_up(n, tile_n)

    feats = jnp.pad(feats, ((0, 0), (0, n_pad - n), (0, 0)))
    labels_col = jnp.pad(labels, (0, n_pad - n)).reshape(n_pad, 1)

    grid = (n_pad // tile_n,)
    sums = pl.pallas_call(
        _roi_pool_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, tile_n, c), lambda j: (0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, r_pad, c), lambda j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, r_pad, c), jnp.float32),
        interpret=interpret,
    )(labels_col, feats)

    counts = roi_counts(labels, num_rois)
    return sums[:, :num_rois, :] / jnp.clip(counts, 1e-6)[None, :, None]


def roi_pool(feats, labels, num_rois: int, use_pallas: bool = False):
    """Dispatcher.

    Defaults to the XLA formulation: measured on v5e (B=4, 91x109x91, C=64,
    R=166) it runs 9.1 ms vs 31 ms for the Pallas kernel — XLA's fused
    one-hot contraction already saturates the op (it is HBM-stream-bound on
    feats, and the compiler's pipelining beats the hand-written schedule).
    The Pallas path is kept for layouts where materializing the (N, R)
    one-hot in HBM would not fuse (very large R) and as the kernel-authoring
    reference.
    """
    if use_pallas and HAS_PALLAS:
        return roi_pool_pallas(feats, labels, num_rois)
    return roi_pool_xla(feats, labels, num_rois)
