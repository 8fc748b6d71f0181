"""ROI pooling kernel benchmark: Pallas vs XLA one-hot einsum.

Measures the atlas ROI mean-pool (SURVEY.md §3.3 hot op, reference
image_features.py:111-114) at two operating points on the real chip:

- 2-mm pipeline: B=4 volumes 91x109x91, C=64, R=166 (AAL3 on the 2-mm
  MNI grid — the production extract_features shape),
- 1-mm pipeline: B=1 volume 182x218x182, C=64, R=600 (pooling on the
  reference's in-tree 1-mm atlas grid) — here XLA's fused one-hot would
  materialize an (N=7.2M, R=600) intermediate.

Timing: median of repeats; every sample ends in a device->host fetch of a
scalar reduction because `block_until_ready` is a no-op over the hosted
TPU tunnel (CLAUDE.md). Writes benchmarks/ROI_POOL.md.

Usage: python benchmarks/roi_pool_bench.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_ad_tpu.ops.roi_pool import (roi_pool_pallas,  # noqa: E402
                                            roi_pool_xla)

CASES = [
    # name, batch, vol shape, channels, n_rois
    ("2mm-R166", 4, (91, 109, 91), 64, 166),
    ("1mm-R600", 1, (182, 218, 182), 64, 600),
]
REPEATS = 7


def _time(fn, *args):
    out = fn(*args)  # compile + warm
    float(jnp.sum(out))  # sync via fetch
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000)  # ms


def main():
    print("devices:", jax.devices())
    rows = []
    for name, b, shape, c, r in CASES:
        rng = np.random.default_rng(0)
        n = int(np.prod(shape))
        labels = jnp.asarray(
            rng.integers(0, r + 1, size=n).astype(np.int32))
        for dtype in (jnp.float32, jnp.bfloat16):
            feats = jnp.asarray(
                rng.normal(size=(b, n, c)).astype(np.float32)).astype(dtype)

            xla_fn = jax.jit(lambda f, lb, r=r: roi_pool_xla(f, lb, r))
            pl_fn = jax.jit(lambda f, lb, r=r: roi_pool_pallas(f, lb, r))

            t_xla = _time(xla_fn, feats, labels)
            t_pl = _time(pl_fn, feats, labels)
            # numerics cross-check
            a = np.asarray(xla_fn(feats, labels), np.float32)
            p = np.asarray(pl_fn(feats, labels), np.float32)
            err = float(np.max(np.abs(a - p) / (np.abs(a) + 1e-3)))
            dt = "f32" if dtype == jnp.float32 else "bf16"
            rows.append((name, dt, t_xla, t_pl, t_xla / t_pl, err))
            print(f"{name} {dt}: XLA {t_xla:.2f} ms  Pallas {t_pl:.2f} ms  "
                  f"speedup {t_xla/t_pl:.2f}x  max-rel-err {err:.2e}",
                  flush=True)

    lines = [
        "# ROI pooling: Pallas vs XLA (real v5e chip)",
        "",
        "Atlas ROI mean-pool (reference image_features.py:111-114). "
        "Median of "
        f"{REPEATS} runs, device->host fetch sync. Regenerate with "
        "`python benchmarks/roi_pool_bench.py`.",
        "",
        "| case | dtype | XLA ms | Pallas ms | Pallas speedup | max rel err |",
        "|---|---|---|---|---|---|",
    ]
    for name, dt, tx, tp, sp, err in rows:
        lines.append(f"| {name} | {dt} | {tx:.2f} | {tp:.2f} | {sp:.2f}x "
                     f"| {err:.1e} |")
    lines += [
        "",
        "2mm-R166 = production extract_features shape (B=4, 91x109x91, "
        "C=64, R=166); 1mm-R600 = pooling on the in-tree 1-mm atlas grid "
        "(B=1, 182x218x182, C=64, R=600), where the XLA formulation "
        "materializes an (N=7.2M, R) one-hot in HBM and the Pallas kernel "
        "builds it tile-by-tile in VMEM.",
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ROI_POOL.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print("wrote", out)


if __name__ == "__main__":
    main()
