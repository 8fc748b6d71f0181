"""Fused gather+normalize kernel vs XLA on the HBM-resident input path.

Appends a measured table to benchmarks/ROI_POOL.md (the Pallas-tier
measurement doc). Shapes: the production operating point — 91x109x91 int16
volumes, train batch 128 gathered from a 12-volume corpus (bench.py's
configuration). Run on the real chip:
    python benchmarks/fused_gather_bench.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_ad_tpu.ops.fused_gather import (  # noqa: E402
    flatten_corpus, gather_normalize_pallas, gather_normalize_xla)

VOL_SHAPE = (91, 109, 91)
BATCHES = (32, 128)
REPEATS = 7


def _time(fn, *args):
    out = fn(*args)
    float(jnp.sum(out))  # device->host fetch = the only true sync here
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(out))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1000)


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    vols = rng.integers(0, 4096, (12, *VOL_SHAPE, 1)).astype(np.int16)
    corpus_np, vox = flatten_corpus(vols)
    corpus = jnp.asarray(corpus_np)

    rows = []
    for b in BATCHES:
        idx = jnp.asarray(rng.integers(0, len(vols), b), jnp.int32)
        xla_fn = jax.jit(lambda c, i: gather_normalize_xla(c, i, vox))
        pl_fn = jax.jit(lambda c, i: gather_normalize_pallas(c, i, vox))
        t_xla = _time(xla_fn, corpus, idx)
        t_pl = _time(pl_fn, corpus, idx)
        a = np.asarray(xla_fn(corpus, idx))
        p = np.asarray(pl_fn(corpus, idx))
        err = float(np.abs(a - p).max())
        rows.append((b, t_xla, t_pl, t_xla / t_pl, err))
        print(f"batch {b}: XLA {t_xla:.2f} ms  Pallas {t_pl:.2f} ms  "
              f"speedup {t_xla/t_pl:.2f}x  max-err {err:.1e}", flush=True)

    lines = [
        "",
        "## Fused int16 gather + normalize (HBM input path, round 3)",
        "",
        "Per-step input work of the HBM-resident trainer: gather the batch "
        "from the int16 corpus and min-max normalize per volume. The "
        "Pallas kernel DMAs each volume into VMEM once via scalar-"
        "prefetched indices and fuses the min/max + scale there; the XLA "
        "path materializes the gathered batch before the reduction "
        "barrier. 91x109x91 volumes, 12-volume corpus, median of "
        f"{REPEATS} runs. Regenerate: `python "
        "benchmarks/fused_gather_bench.py`.",
        "",
        "| batch | XLA ms | Pallas ms | Pallas speedup | max abs err |",
        "|---|---|---|---|---|",
    ]
    for b, tx, tp, sp, err in rows:
        lines.append(f"| {b} | {tx:.2f} | {tp:.2f} | {sp:.2f}x | {err:.1e} |")
    lines.append("")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ROI_POOL.md")
    with open(out, "a") as f:
        f.write("\n".join(lines))
    print("appended to", out)


if __name__ == "__main__":
    main()
