"""Roofline analysis of the flagship forward/train step on TPU.

Quantifies WHAT bounds the measured throughput (BENCH/PARITY numbers):
pulls FLOPs and HBM bytes from XLA's compiled cost analysis at the bench
operating points, measures steady-state step time with the same HBM-resident
data path bench.py uses, and reports achieved TFLOP/s and GB/s against the
chip's peaks — i.e. whether each phase sits on the compute or the bandwidth
roof, and how far below it.

Writes benchmarks/ROOFLINE.md. Usage (real TPU): python benchmarks/roofline.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# public v5e specs: ~197 bf16 TFLOP/s, ~819 GB/s HBM bandwidth per chip
PEAK_FLOPS = 197e12
PEAK_BYTES = 819e9
VOL_SHAPE = (91, 109, 91)
INFER_BATCH = 512
TRAIN_BATCH = 128


def cost(compiled):
    c = compiled.cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def main():
    import jax
    import jax.numpy as jnp

    from multimodal_ad_tpu.models.resnet3d import generate_model
    from multimodal_ad_tpu.ops.normalize import scale_intensity as dev_scale
    from multimodal_ad_tpu.parallel.mesh import make_mesh, replicate
    from multimodal_ad_tpu.train.loop import (create_train_state,
                                              make_epoch_schedule,
                                              make_train_step)

    mesh = make_mesh({"data": -1})
    model = generate_model(model_depth=18, nb_class=2)

    rows = []

    # ---- inference at the bench operating point ----
    x_inf = jnp.zeros((INFER_BATCH, *VOL_SHAPE, 1), jnp.int16)
    variables = replicate(
        model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, *VOL_SHAPE, 1), jnp.float32), train=False),
        mesh)
    fwd = jax.jit(lambda v, r: model.apply(v, dev_scale(r), train=False))
    compiled = fwd.lower(variables, x_inf).compile()
    f_flops, f_bytes = cost(compiled)
    x_dev = jax.device_put(np.zeros((INFER_BATCH, *VOL_SHAPE, 1), np.int16))
    np.asarray(fwd(variables, x_dev))  # warm
    reps = 6
    t0 = time.time()
    outs = [fwd(variables, x_dev) for _ in range(reps)]
    np.asarray(outs[-1])
    dt_inf = (time.time() - t0) / reps
    rows.append(("inference (norm+forward)", INFER_BATCH, f_flops, f_bytes,
                 dt_inf))

    # ---- train step at the bench operating point ----
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        {"image": jnp.zeros((1, *VOL_SHAPE, 1), jnp.float32)},
        make_epoch_schedule(1e-4, 100))
    state = replicate(state, mesh)
    cw = replicate(jnp.ones((2,), jnp.float32), mesh)
    base_step = make_train_step(2)

    def tstep(state, raw, key):
        b = {"image": dev_scale(raw),
             "label": jnp.zeros((raw.shape[0],), jnp.int32),
             "mask": jnp.ones((raw.shape[0],), jnp.float32)}
        return base_step(state, b, cw, key)

    x_tr = jnp.zeros((TRAIN_BATCH, *VOL_SHAPE, 1), jnp.int16)
    key = jax.random.PRNGKey(1)
    jitted = jax.jit(tstep, donate_argnums=(0,))
    compiled_tr = jitted.lower(state, x_tr, key).compile()
    t_flops, t_bytes = cost(compiled_tr)
    x_dev_tr = jax.device_put(np.zeros((TRAIN_BATCH, *VOL_SHAPE, 1), np.int16))
    state, loss, _ = jitted(state, x_dev_tr, key)
    np.asarray(loss)  # warm + sync
    reps_tr = 6
    t0 = time.time()
    for _ in range(reps_tr):
        state, loss, _ = jitted(state, x_dev_tr, key)
    np.asarray(loss)
    dt_tr = (time.time() - t0) / reps_tr
    rows.append(("train step (fwd+bwd+update)", TRAIN_BATCH, t_flops, t_bytes,
                 dt_tr))

    # ---- render ----
    lines = [
        "# Roofline: flagship 3D ResNet-18 on one v5e chip",
        "",
        f"FLOPs / HBM bytes from XLA compiled cost analysis at the bench "
        f"operating points (volume {VOL_SHAPE}, bf16 compute). Peaks used: "
        f"{PEAK_FLOPS/1e12:.0f} bf16 TFLOP/s, {PEAK_BYTES/1e9:.0f} GB/s HBM. "
        "Regenerate with `python benchmarks/roofline.py` (real TPU).",
        "",
        "| phase | batch | GFLOP/vol | MB/vol | AI (flop/byte) | ridge AI |"
        " vols/s | TFLOP/s (MFU) | GB/s (of peak) | bound |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    ridge = PEAK_FLOPS / PEAK_BYTES
    for name, batch, flops, bytes_, dt in rows:
        vps = batch / dt
        ai = flops / bytes_ if bytes_ else float("inf")
        tfs = flops / dt / 1e12
        gbs = bytes_ / dt / 1e9
        bound = "compute" if ai >= ridge else "bandwidth"
        lines.append(
            f"| {name} | {batch} | {flops/batch/1e9:.1f} | "
            f"{bytes_/batch/1e6:.1f} | {ai:.0f} | {ridge:.0f} | {vps:.1f} | "
            f"{tfs:.1f} ({tfs*1e12/PEAK_FLOPS:.1%}) | "
            f"{gbs:.0f} ({gbs*1e9/PEAK_BYTES:.1%}) | {bound} |")
    lines += [
        "",
        "Reading: a phase whose arithmetic intensity (AI) exceeds the ridge "
        "point is compute-bound — its ceiling is the MXU, and its MFU is the "
        "fraction of that ceiling achieved. A phase below the ridge is "
        "HBM-bound and the % of peak bandwidth is the honest utilization "
        "number. The residual gap to the roof is XLA fusion overhead, "
        "layout/padding work (e.g. the 1-channel stem pads to the 8-lane "
        "minimum), and non-MXU ops (BatchNorm updates, maxpool, softmax).",
        "",
    ]
    out = os.path.join(REPO, "benchmarks", "ROOFLINE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print("\n".join(lines))
    print("wrote", out)


if __name__ == "__main__":
    main()
