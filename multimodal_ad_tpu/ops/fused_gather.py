"""Fused int16 gather + per-volume min-max normalize (Pallas).

The HBM-resident training path's per-step input work is
`DeviceDataset.gather(indices)` followed by `scale_intensity`
(ops/normalize.py) — the device twin of the reference's DataLoader-worker
preprocessing (reference train_ResNet3D.py:146-148). Under XLA the
per-volume min/max reduction is a barrier, so the gathered int16 batch is
materialized once before the normalize pass reads it again. This kernel
uses scalar-prefetched indices to DMA each volume from the corpus into
VMEM exactly once, reduces min/max there, and writes the scaled f32
output — one corpus read + one output write, the bandwidth floor.

Layout: the corpus is viewed as (N, R, 128) — volumes flattened and
padded to a lane-aligned row count (`flatten_corpus`); the tail repeats
an in-volume value so min/max need no mask, and consumers read [:vox] of
the flattened result. Measured against the jitted XLA twin in
benchmarks/fused_gather_bench.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False

LANES = 128


def flatten_corpus(volumes: np.ndarray):
    """(N, X, Y, Z, C) int16 -> ((N, R, 128) int16, vox);
    R = ceil(vox / 128). The tail pads with each volume's FIRST voxel —
    a value already present in the volume, so the kernel needs no
    validity mask for its min/max (materializing a (R, 128) mask is what
    pushed the one-pass kernel past the 16 MB VMEM limit)."""
    n = volumes.shape[0]
    flat = volumes.reshape(n, -1)
    vox = flat.shape[1]
    r = -(-vox // LANES)
    out = np.repeat(flat[:, :1], r * LANES, axis=1)
    out[:, :vox] = flat
    return out.reshape(n, r, LANES), vox


def gather_normalize_xla(corpus, indices, vox: int, out_dtype=jnp.float32):
    """XLA reference path: gather -> per-volume min-max -> scale
    (scale_intensity semantics, ops/normalize.py). The corpus tail is
    padded with an in-volume value (flatten_corpus), so no mask is
    needed; consumers read [:vox] of the flattened result."""
    g = corpus[indices].astype(jnp.float32)  # (B, R, 128)
    mn = jnp.min(g, axis=(1, 2), keepdims=True)
    mx = jnp.max(g, axis=(1, 2), keepdims=True)
    out = jnp.where(mx - mn < 1e-12, 0.0, (g - mn) / (mx - mn + 1e-30))
    return out.astype(out_dtype)


def gather_normalize_pallas(corpus, indices, vox: int,
                            interpret: bool = False,
                            out_dtype=jnp.float32):
    """One volume per grid step: the block index map reads the
    scalar-prefetched index vector, so the DMA itself performs the
    gather; min/max reduce over the VMEM-resident int16 block.

    ``out_dtype=jnp.bfloat16`` halves the write traffic for consumers
    that cast anyway (the flagship's bf16 stem) — the scale arithmetic
    stays f32, only the store rounds."""
    n, r, l = corpus.shape
    b = indices.shape[0]

    def kernel(idx_ref, corpus_ref, out_ref):
        # f32 conversion first: Mosaic has no int16 reductions, and f32
        # is exact over the int16 range. No validity mask — the corpus
        # tail carries an in-volume value (flatten_corpus), so min/max
        # over the padded block equal the volume's true min/max.
        x = corpus_ref[0].astype(jnp.float32)  # (R, 128)
        lo = jnp.min(x)
        hi = jnp.max(x)
        rng_f = hi - lo
        scale = jnp.where(rng_f < 1e-12, 0.0, 1.0 / (rng_f + 1e-30))
        out_ref[0] = ((x - lo) * scale).astype(out_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, r, l), lambda i, idx_ref: (idx_ref[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, r, l), lambda i, idx_ref: (i, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, r, l), out_dtype),
        interpret=interpret,
    )(indices.astype(jnp.int32), corpus)
