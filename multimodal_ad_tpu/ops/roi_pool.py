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
    """Grid (N//TILE_N,): build the one-hot tile in VMEM (VPU compare; it
    never round-trips through HBM), then ONE fat MXU contraction
    (R, T) x (T, B*C) per tile — batch and channel fold into a single
    >=128-wide lane dimension, so the MXU is not starved the way a
    per-batch (R, 64) output tile starves it. The (R_pad, B*C) accumulator
    lives in VMEM across all grid steps."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    labels = labels_ref[:]  # (TILE_N, 1) int32
    r_pad = out_ref.shape[0]
    roi_ids = jax.lax.broadcasted_iota(jnp.int32, (labels.shape[0], r_pad), 1)
    onehot = (labels == roi_ids + 1).astype(feats_ref.dtype)  # (T, R_pad)
    out_ref[:] += jax.lax.dot_general(
        onehot, feats_ref[:],
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

    # (N, B*C) layout: one XLA transpose pass outside the kernel buys a
    # single fat contraction inside it (lane dim b*c >= 128 even for the
    # U-Net's 64 channels at b >= 2)
    feats_t = jnp.pad(feats, ((0, 0), (0, n_pad - n), (0, 0)))
    feats_t = feats_t.transpose(1, 0, 2).reshape(n_pad, b * c)
    labels_col = jnp.pad(labels, (0, n_pad - n)).reshape(n_pad, 1)

    grid = (n_pad // tile_n,)
    sums = pl.pallas_call(
        _roi_pool_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, b * c), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r_pad, b * c), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r_pad, b * c), jnp.float32),
        interpret=interpret,
    )(labels_col, feats_t)

    sums = sums.reshape(r_pad, b, c).transpose(1, 0, 2)
    counts = roi_counts(labels, num_rois)
    return sums[:, :num_rois, :] / jnp.clip(counts, 1e-6)[None, :, None]


def roi_pool(feats, labels, num_rois: int, use_pallas: bool = False):
    """Dispatcher.

    Defaults to the XLA formulation. Measured on v5e
    (benchmarks/ROI_POOL.md, round 3): XLA wins at BOTH operating points —
    26 ms vs 37-41 ms at the production 2-mm shape (B=4, 91x109x91, C=64,
    R=166) and 34-37 ms vs 115-127 ms at the 1-mm-atlas shape (B=1,
    182x218x182, C=64, R=600). XLA never materializes the (N, R) one-hot:
    the compare fuses into the contraction loop, and the op is
    HBM-stream-bound on `feats`, where the compiler's pipelining beats
    this hand-written schedule even after the round-3 rework (single fat
    (R,T)x(T,B*C) MXU contraction per tile). The Pallas path is kept as
    the measured counter-example and kernel-authoring reference.
    """
    if use_pallas and HAS_PALLAS:
        return roi_pool_pallas(feats, labels, num_rois)
    return roi_pool_xla(feats, labels, num_rois)
