"""Per-op device-time trace of the flagship train step (round-4 verdict
item 7: attribute every remaining millisecond of the train-MFU gap).

Captures a jax.profiler device trace around timed train steps at the
production operating point (batch 128, HBM-resident data, s2d stem),
parses the Chrome-trace export the TPU runtime writes next to the xplane
protobuf (this image's tensorboard_plugin_profile converter is broken:
its _pywrap_profiler build lacks xspace_to_tools_data), and writes the
measured per-op / per-grid breakdown to benchmarks/TRAIN_OP_TRACE.md —
where the step's wall time actually goes: dilated-stage convs vs backward
glue (BN statistic grads, stem/stage-1/2, maxpool backward) vs VPU
fusions.

Run on the real chip: python benchmarks/train_op_trace.py
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

VOL_SHAPE = (91, 109, 91)
BATCH = 128
STEPS = 4


def run_steps(trace_dir: str) -> float:
    from multimodal_ad_tpu.data.device_cache import DeviceDataset
    from multimodal_ad_tpu.models.resnet3d import generate_model
    from multimodal_ad_tpu.ops.normalize import scale_intensity as dev_scale
    from multimodal_ad_tpu.parallel.mesh import make_mesh, replicate
    from multimodal_ad_tpu.train.loop import (create_train_state,
                                              make_epoch_schedule,
                                              make_train_step)

    mesh = make_mesh({"data": -1})
    rng = np.random.default_rng(0)
    vols = np.stack([rng.integers(0, 4096, VOL_SHAPE).astype(np.int16)
                     for _ in range(12)])[..., None]
    ds = DeviceDataset(vols, np.zeros(len(vols), np.int32), mesh=mesh)
    np.asarray(ds.labels)

    model = generate_model(model_depth=18, nb_class=2)
    base_step = make_train_step(2)
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
    idx = lambda: jnp.asarray(rng.integers(0, ds.n, BATCH), jnp.int32)
    state, loss, _ = step(state, idx(), key)  # compile outside the trace
    np.asarray(loss)

    t0 = time.time()
    with jax.profiler.trace(trace_dir):
        for _ in range(STEPS):
            state, loss, _ = step(state, idx(), key)
        np.asarray(loss)  # device->host fetch = the only true sync here
    wall = time.time() - t0
    print(f"{STEPS} steps of batch {BATCH}: {STEPS * BATCH / wall:.1f} "
          f"vols/s during trace")
    return wall


def load_device_ops(trace_dir: str):
    """Chrome-trace export -> list of XLA-op events on the device's
    'XLA Ops' lane, each with dur (us) and the runtime's per-op args
    (hlo_category, model_flops [MACs for convs], bytes, long_name)."""
    traces = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not traces:
        raise FileNotFoundError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(traces[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    # resolve the device pid and its 'XLA Ops' tid from metadata events
    dev_pid = next(e["pid"] for e in ev if e.get("ph") == "M"
                   and e["name"] == "process_name"
                   and "TPU" in e["args"]["name"])
    ops_tid = next(e["tid"] for e in ev if e.get("ph") == "M"
                   and e.get("pid") == dev_pid
                   and e["name"] == "thread_name"
                   and e["args"]["name"] == "XLA Ops")
    return [e for e in ev if e.get("ph") == "X" and e.get("pid") == dev_pid
            and e.get("tid") == ops_tid]


GRID_BUCKETS = [
    (r"46,55,46", "stem grid 46x55x46 (stem conv f+b, BN, relu, pool fwd)"),
    (r"23,28,23", "stage1 grid 23x28x23 (64ch convs f+b + glue)"),
    (r"12,14,12,512", "stage3/4 grid 12x14x12 c512 (dilated convs f+b)"),
    (r"12,14,12,256", "stage2/3 grid 12x14x12 c256"),
    (r"12,14,12,128", "stage2 grid 12x14x12 c128"),
    (r"12,14,12", "grid 12x14x12 (other widths)"),
    (r"91,109,91", "full volume 91x109x91 (gather + normalize + s2d)"),
]


def bucket(e) -> str:
    args = e.get("args", {})
    if args.get("hlo_category") == "select-and-scatter":
        return "maxpool backward (select-and-scatter)"
    ln = args.get("long_name", "")
    for pat, lab in GRID_BUCKETS:
        if re.search(pat, ln):
            return lab
    return f"other: {args.get('hlo_category', '?')}"


def main():
    trace_dir = "/tmp/train_op_trace"
    os.makedirs(trace_dir, exist_ok=True)
    print("devices:", jax.devices())
    run_steps(trace_dir)

    ops = load_device_ops(trace_dir)
    total = sum(e["dur"] for e in ops)

    by_cat = collections.defaultdict(float)
    by_grid = collections.defaultdict(lambda: [0.0, 0.0])
    agg = {}
    for e in ops:
        args = e.get("args", {})
        fl = float(args.get("model_flops") or 0)
        by_cat[args.get("hlo_category", "?")] += e["dur"]
        g = by_grid[bucket(e)]
        g[0] += e["dur"]
        g[1] += fl
        a = agg.setdefault(e["name"], [0.0, 0, args])
        a[0] += e["dur"]
        a[1] += 1

    lines = [
        "# Measured per-op device-time trace: flagship train step",
        "",
        f"jax.profiler device trace over {STEPS} train steps (batch "
        f"{BATCH}, volume {VOL_SHAPE}, s2d stem, HBM-resident data) on one "
        "v5e chip, parsed from the runtime's Chrome-trace export. "
        "Self-time microseconds summed across the trace. `model_flops` is "
        "the runtime's per-op count (MACs for convolutions — the eq. "
        "TFLOP/s column doubles it). Regenerate: "
        "`python benchmarks/train_op_trace.py`.",
        "",
        f"Total device self time: **{total / 1e3 / STEPS:.1f} ms/step**.",
        "",
        "## Device time by spatial grid",
        "",
        "| where | ms/step | % | eq. TFLOP/s |",
        "|---|---|---|---|",
    ]
    for lab, (d, fl) in sorted(by_grid.items(), key=lambda kv: -kv[1][0]):
        tf = 2 * fl / (d * 1e-6) / 1e12 if d else 0.0
        lines.append(f"| {lab} | {d / 1e3 / STEPS:.2f} | "
                     f"{100 * d / total:.1f}% | {tf:.1f} |")
    lines += [
        "",
        "## Device time by HLO category",
        "",
        "| category | ms/step | % |",
        "|---|---|---|",
    ]
    for cat, d in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        if d / total < 0.001:
            continue
        lines.append(f"| {cat} | {d / 1e3 / STEPS:.2f} | "
                     f"{100 * d / total:.1f}% |")
    lines += [
        "",
        "## Top HLO ops by self time",
        "",
        "| op | ms/step | n/step | category | eq. TFLOP/s | GB/s |",
        "|---|---|---|---|---|---|",
    ]
    for name, (d, n, args) in sorted(
            agg.items(), key=lambda kv: -kv[1][0])[:30]:
        fl = float(args.get("model_flops") or 0) * n
        byt = float(args.get("raw_bytes_accessed") or 0) * n
        tf = 2 * fl / (d * 1e-6) / 1e12 if d else 0.0
        gbs = byt / (d * 1e-6) / 1e9 if d else 0.0
        lines.append(
            f"| `{name}` | {d / 1e3 / STEPS:.2f} | {n // STEPS} | "
            f"{args.get('hlo_category', '?')} | {tf:.1f} | {gbs:.0f} |")
    lines.append("")

    out = os.path.join(REPO, "benchmarks", "TRAIN_OP_TRACE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print("wrote", out, f"(total device self time {total / 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
