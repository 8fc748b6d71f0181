"""3D max pooling with a TPU-fast backward.

Motivation (measured, benchmarks/TRAIN_OP_TRACE.md): XLA differentiates
`reduce_window`-max through a `select-and-scatter` op that runs at ~0.2%
of HBM bandwidth on TPU — 17.9 ms of the flagship ResNet's 387 ms train
step (4.5%), the single largest non-conv op. The forward here is the
ordinary `reduce_window` max; the backward is re-expressed as dense
slice/compare/pad arithmetic that XLA fuses into a few VPU passes:

1. for every window offset ``o`` (w^3 of them), a strided slice of the
   padded input aligns x's contribution to each window on the OUTPUT
   grid; equality with the pooled max gives the argmax indicator,
2. each window's cotangent is split equally among its tied maxima
   (``g / count``),
3. the per-offset contributions are accumulated onto stride-phase grids
   (input index ``i = s*m + o - p`` decomposes as ``i = s*q + r``) and the
   phases are interleaved back to the input grid — a pure
   pad/stack/reshape assembly, no scatter.

MEASURED NEGATIVE RESULT (round 4, paired A/B on the chip): wired into
the flagship ResNet-18 train step this backward is ~8% SLOWER end to end
(291.6 vs 315.6 vols/s at batch 128) than XLA's select-and-scatter.
Select-and-scatter's 17.9 ms/step moves ~4 GB at 227 GB/s — only ~2.5x
off the HBM floor — while the dense per-offset form re-reads the stem
grid for each of the 27 window offsets twice (indicator + contribution
passes), ~3x the total traffic. The op is therefore NOT routed by
default (models/resnet3d.py::max_pool_3d uses nn.max_pool); it remains
available, numerically validated (tests/test_pool.py), for shapes where
window overlap is lower (2^3/s2: 8 offsets, one phase each).

Intentional divergence from XLA/torch semantics (documented in README
"intentional divergences"): when a window has SEVERAL elements equal to
its max (common after ReLU: zero plateaus), select-and-scatter routes the
whole cotangent to one of them; this backward splits it equally — a
symmetric subgradient of the same max. On tie-free inputs the two are
bit-identical (tests/test_pool.py); either is a valid subgradient, and
the total gradient mass per window is preserved exactly in both.

Covers the model zoo's two pool shapes (ResNet/DAFT stem 3^3/s2/p1,
U-Net encoder 2^3/s2). Only stride 2 is implemented.
"""

from __future__ import annotations

from functools import partial
from itertools import product

import jax
import jax.numpy as jnp
from flax import linen as nn


def _reduce_window_max(x, window: int, stride: int, padding: int):
    return nn.max_pool(
        x,
        window_shape=(window,) * 3,
        strides=(stride,) * 3,
        padding=((padding, padding),) * 3,
    )


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def max_pool_3d_fast(x, window: int = 3, stride: int = 2, padding: int = 1):
    """`nn.max_pool` forward, tie-splitting dense backward (see module
    docstring). x: (B, D, H, W, C) channels-last."""
    return _reduce_window_max(x, window, stride, padding)


def _fwd(x, window, stride, padding):
    y = _reduce_window_max(x, window, stride, padding)
    return y, (x, y)


def _bwd(window, stride, padding, res, g):
    if stride != 2:
        raise NotImplementedError("max_pool_3d_fast backward: stride 2 only")
    x, y = res
    b, d_in, h_in, w_in, c = x.shape
    out_sp = y.shape[1:4]
    spatial = (d_in, h_in, w_in)

    neg = (jnp.finfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    # pad so every (offset, output-position) slice is in range:
    # input index i = 2m + o - p, m in [0, out), o in [0, window)
    hi = {}
    for ax, (n, no) in enumerate(zip(spatial, out_sp)):
        hi[ax] = max(0, 2 * (no - 1) + (window - 1) - padding - (n - 1))
    xpad = jnp.pad(
        x,
        ((0, 0), (padding, hi[0]), (padding, hi[1]), (padding, hi[2]),
         (0, 0)),
        constant_values=neg)

    def offset_slice(o):
        """x values each window reads at offset o, on the output grid."""
        starts = (0, o[0], o[1], o[2], 0)
        limits = (b,
                  o[0] + 2 * (out_sp[0] - 1) + 1,
                  o[1] + 2 * (out_sp[1] - 1) + 1,
                  o[2] + 2 * (out_sp[2] - 1) + 1,
                  c)
        return jax.lax.slice(xpad, starts, limits, (1, 2, 2, 2, 1))

    offsets = list(product(range(window), repeat=3))
    inds = {o: (offset_slice(o) == y) for o in offsets}
    count = sum(ind.astype(g.dtype) for ind in inds.values())
    inv = g / count  # every window has >= 1 real max, so count >= 1

    # phase grids: i = 2q + r, r in {0,1}; phase r covers q in [0, Qr)
    q_max = {ax: (spatial[ax] + 1) // 2 for ax in range(3)}  # r = 0
    q_len = lambda ax, r: (spatial[ax] - r + 1) // 2

    phases = {}
    for o in offsets:
        p_o = inds[o].astype(g.dtype) * inv
        r = tuple((oa - padding) % 2 for oa in o)
        s = tuple((oa - padding - ra) // 2 for oa, ra in zip(o, r))
        # contribution lands at q = m + s; clip to the phase's valid range
        lo = [max(0, -sa) for sa in s]
        hi_m = [min(out_sp[ax], q_len(ax, r[ax]) - s[ax]) for ax in range(3)]
        if any(lo[ax] >= hi_m[ax] for ax in range(3)):
            continue
        sl = p_o[:, lo[0]:hi_m[0], lo[1]:hi_m[1], lo[2]:hi_m[2], :]
        pad_cfg = ((0, 0),) + tuple(
            (lo[ax] + s[ax], q_max[ax] - (hi_m[ax] + s[ax]))
            for ax in range(3)) + ((0, 0),)
        contrib = jnp.pad(sl, pad_cfg)
        phases[r] = contrib if r not in phases else phases[r] + contrib

    zeros = jnp.zeros((b, q_max[0], q_max[1], q_max[2], c), g.dtype)
    stacked = jnp.stack([phases.get((rd, rh, rw), zeros)
                         for rd in (0, 1) for rh in (0, 1) for rw in (0, 1)])
    stacked = stacked.reshape(2, 2, 2, b, q_max[0], q_max[1], q_max[2], c)
    # (rd,rh,rw,B,Qd,Qh,Qw,C) -> (B, Qd,rd, Qh,rh, Qw,rw, C) -> interleave
    grad = stacked.transpose(3, 4, 0, 5, 1, 6, 2, 7).reshape(
        b, 2 * q_max[0], 2 * q_max[1], 2 * q_max[2], c)
    return (grad[:, :d_in, :h_in, :w_in, :].astype(x.dtype),)


max_pool_3d_fast.defvjp(_fwd, _bwd)
