"""Stem-conv experiment: native 7^3/s2 on 1 channel vs space-to-depth.

ROOFLINE.md attributes part of the residual MFU gap to the 1-channel stem:
conv1 (7^3, C_in=1, stride 2) is ~3.4% of analytic FLOPs but its input
pads 1 -> 8 lanes in channels-last layout, and the contraction dim
(343*1) leaves the MXU half-starved. The classic TPU fix (TF TPU ResNet's
"conv0 space-to-depth") reshapes the input into 2^3 spatial blocks -> 8
channels, turning the stem into a DENSE 4^3 stride-1 conv over a
half-resolution grid with a lane-aligned C_in=8.

Derivation (per spatial dim, kernel 7, stride 2, pad 3): output o reads
x[2o + k - 3]. Writing input index i = 2m + p (phase p in {0,1}),
k = 2(m - o) + 3 + p is valid for tap t = m - o + 2 in {0..3}, i.e.
w2[t, p] = w[2t + p - 1] (zero where 2t+p-1 is outside [0,6]) with
padding (2, 1) in block space. In 3-D: w2 is (4,4,4, 8*C_in, C_out) with
the 8 phases stacked on the input-channel axis.

Measures the isolated stem (batch 32/512-equivalent volume work, bf16)
fwd and fwd+bwd both ways, verifies bit-level equivalence, and appends to
ROOFLINE.md. Run on the real chip:

    python benchmarks/stem_s2d.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

B = 32  # stem activations are big: 32 vols keeps both variants in HBM
VOL = (91, 109, 91)
C_OUT = 64
V5E_BF16_PEAK_FLOPS = 197e12

DIMNUMS = lax.conv_dimension_numbers(
    (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC"))


def conv_stem(x, w):
    """Native stem: 7^3, stride 2, pad 3, C_in=1."""
    return lax.conv_general_dilated(
        x, w, window_strides=(2, 2, 2), padding=((3, 3),) * 3,
        dimension_numbers=DIMNUMS)


def s2d_weights(w):
    """(7,7,7,C,64) -> (4,4,4,8*C,64); phase-major on the channel axis:
    channel index = ((pd*2 + ph)*2 + pw)*C + c, matching s2d_input.

    Built from the SAME static tap map the production StemConv uses
    (models/resnet3d.py::_stem_s2d_index_map), so this benchmark always
    measures the packing the shipped model runs — a phase-order change
    there cannot silently diverge from the numbers appended here."""
    from multimodal_ad_tpu.models.resnet3d import _STEM_S2D_IDX

    k7, _, _, c_in, c_out = w.shape
    assert k7 == 7
    idx = jnp.asarray(_STEM_S2D_IDX.reshape(-1))
    w_flat = w.reshape(343, c_in, c_out)
    w2 = jnp.where((idx >= 0)[:, None, None],
                   jnp.take(w_flat, jnp.maximum(idx, 0), axis=0), 0)
    return w2.reshape(4, 4, 4, 8 * c_in, c_out)


def s2d_input(x):
    """(B, D, H, W, C) -> (B, ceil(D/2), ceil(H/2), ceil(W/2), 8C);
    x2[m, phase p] = x[2m + p] (phase-major channel order)."""
    b, D, H, W, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, D % 2), (0, H % 2), (0, W % 2), (0, 0)))
    Dp, Hp, Wp = xp.shape[1:4]
    xs = xp.reshape(b, Dp // 2, 2, Hp // 2, 2, Wp // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return xs.reshape(b, Dp // 2, Hp // 2, Wp // 2, 8 * c)


def conv_stem_s2d(x, w2):
    """Stem as a dense 4^3 stride-1 conv over the space-to-depth grid."""
    return lax.conv_general_dilated(
        s2d_input(x), w2, window_strides=(1, 1, 1),
        padding=((2, 1),) * 3, dimension_numbers=DIMNUMS)


def timeit(fn, *args, reps=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])  # true sync = fetch
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0])
    return (time.time() - t0) / reps


def main():
    print("devices:", jax.devices())
    D, H, W = VOL
    key = jax.random.PRNGKey(0)
    kx, kw = jax.random.split(key)
    x = jax.random.normal(kx, (B, D, H, W, 1), jnp.bfloat16)
    w = (jax.random.normal(kw, (7, 7, 7, 1, C_OUT), jnp.float32)
         * 0.05).astype(jnp.bfloat16)
    w2 = s2d_weights(w)

    f_nat = jax.jit(conv_stem)
    f_s2d = jax.jit(conv_stem_s2d)

    ya = np.asarray(f_nat(x, w), np.float32)
    yb = np.asarray(f_s2d(x, w2), np.float32)
    assert ya.shape == yb.shape, (ya.shape, yb.shape)
    err = np.max(np.abs(ya - yb)) / max(np.max(np.abs(ya)), 1e-6)
    print("output shape", ya.shape, "rel err", err)
    assert err < 2e-2, f"mismatch rel {err:.3g}"

    def loss_nat(x, w):
        return (conv_stem(x, w).astype(jnp.float32) ** 2).mean()

    def loss_s2d(x, w2):
        return (conv_stem_s2d(x, w2).astype(jnp.float32) ** 2).mean()

    g_nat = jax.jit(jax.grad(loss_nat, argnums=(0, 1)))
    g_s2d = jax.jit(jax.grad(loss_s2d, argnums=(0, 1)))

    od, oh, ow = ya.shape[1:4]
    gflop = 2 * B * od * oh * ow * 343 * 1 * C_OUT / 1e9
    rows = []
    t_fn = timeit(f_nat, x, w)
    t_fs = timeit(f_s2d, x, w2)
    t_gn = timeit(g_nat, x, w)
    t_gs = timeit(g_s2d, x, w2)
    for tag, t, mult in (("fwd native", t_fn, 1), ("fwd s2d", t_fs, 1),
                         ("f+b native", t_gn, 3), ("f+b s2d", t_gs, 3)):
        eff = mult * gflop / t / 1e3 / (V5E_BF16_PEAK_FLOPS / 1e12)
        us_vol = t / B * 1e6
        rows.append((tag, t, eff, us_vol))
        print(f"{tag}: {t*1e3:.2f} ms ({us_vol:.0f} us/vol, "
              f"{mult*gflop/t/1e3:.1f} TFLOP/s, {eff*100:.1f}% MXU)",
              flush=True)

    lines = [
        "",
        "## Stem conv: native 7^3/s2 (C_in=1) vs space-to-depth (round 3)",
        "",
        f"Isolated conv1 at batch {B}, volume {VOL}, bf16; MXU% against "
        "the analytic 343*64 MAC count (f+b rows at 3x). Regenerate with "
        "`python benchmarks/stem_s2d.py`.",
        "",
        "| variant | time | us/vol | MXU% |",
        "|---|---|---|---|",
    ]
    for tag, t, eff, us_vol in rows:
        lines.append(f"| {tag} | {t*1e3:.2f} ms | {us_vol:.0f} |"
                     f" {eff*100:.1f}% |")
    lines.append("")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ROOFLINE.md")
    with open(out, "a") as f:
        f.write("\n".join(lines))
    print("appended to", out)


if __name__ == "__main__":
    main()
