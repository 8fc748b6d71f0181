"""Dilated-conv backward experiment: native dilation vs space-to-batch.

ROOFLINE.md's round-3 attribution found the honest train-MFU headroom is
the backward pass of the dilated stage-3/4 convs (input-gradient convs of
a dilated kernel transpose awkwardly; bwd+update runs at ~84% of the
forward's per-FLOP efficiency). The classical alternative formulation is
space-to-batch: a stride-1 dilation-d conv equals d^3 independent DENSE
convs over the d^3 interleaved sub-grids (output position o only reads
inputs at o + d*k, all congruent to o mod d). Dense-conv backwards are the
best-tiled path on the MXU, at the cost of reshape/transpose traffic and
sub-grid padding waste.

This benchmark measures both formulations at the flagship stage-3/4
operating shapes (12x14x12 spatial, 256/512 ch, dilation 2/4, batch 128)
for forward and forward+backward, checks numerical equivalence, and
appends the measured table to ROOFLINE.md. Run on the real chip:

    python benchmarks/dilated_backward.py
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

B = 128
V5E_BF16_PEAK_FLOPS = 197e12

# (name, spatial, C_in, C_out, dilation) — the two dilated stages of the
# flagship ResNet-18 at 91x109x91 input (both run at 12x14x12 spatial)
CASES = [
    ("stage3 3^3 dil2", (12, 14, 12), 256, 256, 2),
    ("stage4 3^3 dil4", (12, 14, 12), 512, 512, 4),
]

DIMNUMS = lax.conv_dimension_numbers(
    (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC"))


def conv_dilated(x, w, d):
    pad = d  # SAME for kernel 3, dilation d
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding=((pad, pad),) * 3,
        rhs_dilation=(d, d, d), dimension_numbers=DIMNUMS)


def conv_s2b(x, w, d):
    """Space-to-batch: pad spatial to multiples of d, pull the d^3 sub-grid
    phases into the batch dim, run one DENSE SAME conv, undo."""
    b, D, H, W, c = x.shape
    pd, ph, pw = (-D) % d, (-H) % d, (-W) % d
    xp = jnp.pad(x, ((0, 0), (0, pd), (0, ph), (0, pw), (0, 0)))
    Dp, Hp, Wp = D + pd, H + ph, W + pw
    # (B, D/d, d, H/d, d, W/d, d, C) -> (B, d,d,d, D/d, H/d, W/d, C)
    xs = xp.reshape(b, Dp // d, d, Hp // d, d, Wp // d, d, c)
    xs = xs.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    xs = xs.reshape(b * d * d * d, Dp // d, Hp // d, Wp // d, c)
    ys = lax.conv_general_dilated(
        xs, w, window_strides=(1, 1, 1), padding=((1, 1),) * 3,
        dimension_numbers=DIMNUMS)
    co = ys.shape[-1]
    ys = ys.reshape(b, d, d, d, Dp // d, Hp // d, Wp // d, co)
    ys = ys.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    return ys.reshape(b, Dp, Hp, Wp, co)[:, :D, :H, :W]


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
    rows = []
    for name, (D, H, W), ci, co, d in CASES:
        key = jax.random.PRNGKey(0)
        kx, kw = jax.random.split(key)
        x = jax.random.normal(kx, (B, D, H, W, ci), jnp.bfloat16)
        w = (jax.random.normal(kw, (3, 3, 3, ci, co), jnp.float32)
             * 0.01).astype(jnp.bfloat16)

        f_dil = jax.jit(lambda x, w, d=d: conv_dilated(x, w, d))
        f_s2b = jax.jit(lambda x, w, d=d: conv_s2b(x, w, d))

        # numerical equivalence (bf16 tolerance)
        ya = np.asarray(f_dil(x, w), np.float32)
        yb = np.asarray(f_s2b(x, w), np.float32)
        err = np.max(np.abs(ya - yb)) / max(np.max(np.abs(ya)), 1e-6)
        assert err < 2e-2, f"{name}: mismatch rel {err:.3g}"

        def loss_dil(x, w, d=d):
            return (conv_dilated(x, w, d).astype(jnp.float32) ** 2).mean()

        def loss_s2b(x, w, d=d):
            return (conv_s2b(x, w, d).astype(jnp.float32) ** 2).mean()

        g_dil = jax.jit(jax.grad(loss_dil, argnums=(0, 1)))
        g_s2b = jax.jit(jax.grad(loss_s2b, argnums=(0, 1)))

        gflop = 2 * B * D * H * W * 27 * ci * co / 1e9
        t_fd = timeit(f_dil, x, w)
        t_fs = timeit(f_s2b, x, w)
        t_gd = timeit(g_dil, x, w)
        t_gs = timeit(g_s2b, x, w)
        rows.append((name, gflop, t_fd, t_fs, t_gd, t_gs))
        for tag, t, mult in (("fwd dil", t_fd, 1), ("fwd s2b", t_fs, 1),
                             ("f+b dil", t_gd, 3), ("f+b s2b", t_gs, 3)):
            eff = mult * gflop / t / 1e3 / (V5E_BF16_PEAK_FLOPS / 1e12)
            print(f"{name} {tag}: {t*1e3:.2f} ms "
                  f"({mult*gflop/t/1e3:.1f} TFLOP/s, {eff*100:.1f}% MXU)",
                  flush=True)

    lines = [
        "",
        "## Dilated-conv backward: native dilation vs space-to-batch "
        "(round 3)",
        "",
        "Microbenchmark of the flagship's two dilated stages (batch 128, "
        "12x14x12 spatial, bf16), forward and forward+backward(input+"
        "kernel grads); MXU% against 3x the analytic conv FLOPs for the "
        "f+b rows. Regenerate with `python benchmarks/dilated_backward.py`.",
        "",
        "| case | GFLOP(fwd) | fwd dil | fwd s2b | f+b dil | f+b s2b |",
        "|---|---|---|---|---|---|",
    ]
    for name, gflop, t_fd, t_fs, t_gd, t_gs in rows:
        def cell(t, mult):
            eff = mult * gflop / t / 1e3 / (V5E_BF16_PEAK_FLOPS / 1e12)
            return f"{t*1e3:.2f} ms ({eff*100:.0f}%)"
        lines.append(
            f"| {name} | {gflop:.1f} | {cell(t_fd,1)} | {cell(t_fs,1)} |"
            f" {cell(t_gd,3)} | {cell(t_gs,3)} |")
    lines.append("")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ROOFLINE.md")
    with open(out, "a") as f:
        f.write("\n".join(lines))
    print("appended to", out)


if __name__ == "__main__":
    main()
