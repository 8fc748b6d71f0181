"""Training-throughput sweep: batch x remat, flagship 3D ResNet-18.

Round-3 MFU push (VERDICT item 9): measure the train step (fwd+bwd+update,
HBM-resident data, device-side normalize) at batches past the round-2
operating point (128) with and without block rematerialization — remat
trades recompute FLOPs for activation HBM, which can unlock larger batches
whose bigger matmuls tile the MXU better.

Appends a measured table to benchmarks/ROOFLINE.md. Run on the real chip:
    python benchmarks/train_mfu_sweep.py [--batches 64,96,112,128,144]
        [--no-remat-axis] [--tag "round 4"]

Round 4 re-sweeps AROUND the 128 optimum with the s2d stem default (the
round-3 table predates it) — XLA's conv schedules are batch-sensitive in
both directions, so the sharp 128 peak needs re-locating after any stem
change.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

VOL_SHAPE = (91, 109, 91)
V5E_BF16_PEAK_FLOPS = 197e12
FWD_GFLOP_PER_VOL = 99.4  # bench.py analytic count (see ROOFLINE.md note)

BATCHES = (128, 256)  # 192 dropped: remote compiles dominate sweep cost
REMAT = (False, True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default=None,
                   help="comma-separated batch sizes (default 128,256)")
    p.add_argument("--no-remat-axis", action="store_true",
                   help="sweep remat=False only")
    p.add_argument("--tag", default="round 3",
                   help="section tag appended to the ROOFLINE.md heading")
    args = p.parse_args(argv)
    batches = (BATCHES if args.batches is None
               else tuple(int(b) for b in args.batches.split(",")))
    remats = (False,) if args.no_remat_axis else REMAT

    from multimodal_ad_tpu.data.device_cache import DeviceDataset
    from multimodal_ad_tpu.models.resnet3d import generate_model
    from multimodal_ad_tpu.ops.normalize import scale_intensity as dev_scale
    from multimodal_ad_tpu.parallel.mesh import make_mesh, replicate
    from multimodal_ad_tpu.train.loop import (create_train_state,
                                              make_epoch_schedule,
                                              make_train_step)

    print("devices:", jax.devices())
    mesh = make_mesh({"data": -1})
    rng = np.random.default_rng(0)
    vols = np.stack([rng.integers(0, 4096, VOL_SHAPE).astype(np.int16)
                     for _ in range(12)])[..., None]
    ds = DeviceDataset(vols, np.zeros(len(vols), np.int32), mesh=mesh)
    np.asarray(ds.labels)

    rows = []
    for remat in remats:
        model = generate_model(model_depth=18, nb_class=2, remat=remat)
        base_step = make_train_step(2)
        for batch in batches:
            try:
                # fresh state per config: the jit'd train step DONATES its
                # state buffers, so a shared template would be deleted
                # after the first config's first step
                state = replicate(create_train_state(
                    model, jax.random.PRNGKey(0),
                    {"image": jnp.zeros((1, *VOL_SHAPE, 1), jnp.float32)},
                    make_epoch_schedule(1e-4, 100)), mesh)
                cw = replicate(jnp.ones((2,), jnp.float32), mesh)

                def step(state, indices, key):
                    b = ds.gather(indices)
                    b["image"] = dev_scale(b["image"])
                    return base_step(state, b, cw, key)

                key = jax.random.PRNGKey(1)
                idx = lambda: jnp.asarray(
                    rng.integers(0, ds.n, batch), jnp.int32)
                state, loss, _ = step(state, idx(), key)
                np.asarray(loss)  # sync (fetch is the only true sync here)

                timed = max(4, 512 // batch)
                t0 = time.time()
                for _ in range(timed):
                    state, loss, _ = step(state, idx(), key)
                np.asarray(loss)
                vps = timed * batch / (time.time() - t0)
                mfu = vps * 3 * FWD_GFLOP_PER_VOL * 1e9 / V5E_BF16_PEAK_FLOPS
                rows.append((batch, remat, vps, mfu))
                print(f"batch {batch} remat={remat}: {vps:.1f} vols/s "
                      f"(train MFU ~{mfu*100:.1f}%)", flush=True)
            except Exception as e:
                rows.append((batch, remat, None, None))
                print(f"batch {batch} remat={remat}: FAILED {e}", flush=True)
    ok = [r for r in rows if r[2]]
    best = max(ok, key=lambda r: r[2]) if ok else None

    lines = [
        "",
        f"## Train-throughput sweep: batch x remat ({args.tag})",
        "",
        "fwd+bwd+update, HBM-resident data, device-side normalize; MFU vs "
        "the analytic 3x99.4 GFLOP/vol count. Regenerate with "
        "`python benchmarks/train_mfu_sweep.py`.",
        "",
        "| batch | remat | vols/s | train MFU |",
        "|---|---|---|---|",
    ]
    for batch, remat, vps, mfu in rows:
        if vps is None:
            lines.append(f"| {batch} | {remat} | OOM/fail | — |")
        else:
            lines.append(f"| {batch} | {remat} | {vps:.1f} | {mfu*100:.1f}% |")
    if best:
        lines.append("")
        lines.append(f"Best: batch {best[0]} remat={best[1]} at "
                     f"{best[2]:.1f} vols/s ({best[3]*100:.1f}% MFU).")
    lines.append("")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "ROOFLINE.md")
    with open(out, "a") as f:
        f.write("\n".join(lines))
    print("appended sweep to", out)


if __name__ == "__main__":
    main()
