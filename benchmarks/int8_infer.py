"""End-to-end int8 inference benchmark: flagship 3D ResNet-18, real chip.

benchmarks/int8_probe.py showed the two FLOP-dominant dilated stages run
1.43-1.70x faster as int8 x int8 -> int32 on the v5e MXU. This measures
the FULL quantized model (models/resnet3d_int8.py: BN-folded, per-channel
int8 weights, calibrated static activation scales, bf16 stem/head)
against the production bf16 forward at the bench operating point
(91x109x91, batch 512), plus the logit agreement between the two graphs.

Appends results to benchmarks/ROOFLINE.md. Run: python benchmarks/int8_infer.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_ad_tpu.models.resnet3d import ResNet3D  # noqa: E402
from multimodal_ad_tpu.models.resnet3d_int8 import (  # noqa: E402
    calibrate_int8, export_int8, resnet3d_int8_apply)

B = 512
VOL = (91, 109, 91)
GFLOP_PER_VOL = 102.8  # bench.py analytic count (s2d stem)


def timeit(fn, *args, reps=8):
    out = fn(*args)
    np.asarray(out.ravel()[0])  # device->host fetch = the only true sync
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out.ravel()[0])
    return (time.time() - t0) / reps


def main():
    print("devices:", jax.devices(), flush=True)
    model = ResNet3D(depth=18, num_classes=2, dropout_rate=0.0)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(2, *VOL, 1)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    state = {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}
    # push a couple of train-mode batches so BN stats are realistic
    for i in range(2):
        xb = jnp.asarray(rng.normal(size=(2, *VOL, 1)), jnp.float32)
        _, upd = model.apply(state, xb, train=True,
                             rngs={"dropout": jax.random.PRNGKey(i)},
                             mutable=["batch_stats"])
        state["batch_stats"] = upd["batch_stats"]

    qp = export_int8(state, depth=18)
    cal = [jnp.asarray(rng.normal(size=(4, *VOL, 1)), jnp.float32)
           for _ in range(2)]
    scales = calibrate_int8(qp, cal)
    print("calibrated", len(scales), "activation scales", flush=True)

    x = jnp.asarray(rng.normal(size=(B, *VOL, 1)), jnp.float32)
    f_bf16 = jax.jit(lambda v: model.apply(state, v, train=False))
    f_int8 = jax.jit(lambda v: resnet3d_int8_apply(qp, scales, v))

    # agreement on a small batch first (cheap fetch)
    xa = x[:16]
    la = np.asarray(f_bf16(xa), np.float32)
    lb = np.asarray(f_int8(xa), np.float32)
    agree = float((la.argmax(1) == lb.argmax(1)).mean())
    mad = float(np.abs(la - lb).mean())
    print(f"argmax agreement {agree:.3f}, mean |logit delta| {mad:.4f}",
          flush=True)

    tb = timeit(f_bf16, x)
    ti = timeit(f_int8, x)
    vb, vi = B / tb, B / ti
    mfu_b = vb * GFLOP_PER_VOL / 1e3 / 197
    tops_i = vi * GFLOP_PER_VOL / 1e3
    lines = [
        "",
        "## int8 quantized inference: full flagship model (round 3)",
        "",
        "Post-training quantization (`models/resnet3d_int8.py`): BN folded, "
        "per-output-channel int8 weights, calibrated static per-tensor "
        "activation scales; stem + head stay bf16. Batch "
        f"{B}, {VOL[0]}x{VOL[1]}x{VOL[2]}, real chip. Regenerate: "
        "`python benchmarks/int8_infer.py`.",
        "",
        "| graph | ms/batch | vols/s | speedup | argmax agreement |",
        "|---|---|---|---|---|",
        f"| bf16 (production) | {tb*1e3:.1f} | {vb:.1f} "
        f"({mfu_b*100:.1f}% MFU) | 1.00x | — |",
        f"| int8 | {ti*1e3:.1f} | {vi:.1f} ({tops_i:.1f} TOP/s eq.) | "
        f"{tb/ti:.2f}x | {agree:.3f} (mean logit delta {mad:.3f}) |",
    ]
    print("\n".join(lines), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ROOFLINE.md")
    with open(out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended to", out)


if __name__ == "__main__":
    main()
