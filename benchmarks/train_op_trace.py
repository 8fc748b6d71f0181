"""Per-op device-time trace of the flagship train step (round-4 verdict
item 7: attribute every remaining millisecond of the train-MFU gap).

Captures a jax.profiler device trace around timed train steps at the
production operating point (batch 128, HBM-resident data, s2d stem),
parses the xplane protobuf with tensorboard_plugin_profile's hlo-stats
converter, and writes the top self-time HLO ops to
benchmarks/TRAIN_OP_TRACE.md — the measured (not cost-model) breakdown of
where the step's wall time goes: dilated-stage convs vs backward glue
(BN statistic grads, stem/stage-1/2) vs VPU fusions.

Run on the real chip: python benchmarks/train_op_trace.py
"""

from __future__ import annotations

import glob
import json
import os
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


def parse_hlo_stats(trace_dir: str):
    """xplane.pb -> list of dicts (one per HLO op) via the tensorboard
    profile plugin's hlo_stats tool."""
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    xplanes = glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.xplane.pb"))
    if not xplanes:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir} — the "
                                "tunnel may not export device traces")
    data, _ = raw_to_tool_data.xspace_to_tool_data(xplanes, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    rows = json.loads(data)
    # gviz table: first entry carries cols, rest rows — handle both layouts
    if isinstance(rows, dict):
        cols = [c["label"] for c in rows["cols"]]
        out = [dict(zip(cols, [c["v"] for c in r["c"]]))
               for r in rows["rows"]]
        return out
    return rows


def main():
    trace_dir = "/tmp/train_op_trace"
    os.makedirs(trace_dir, exist_ok=True)
    print("devices:", jax.devices())
    run_steps(trace_dir)

    try:
        ops = parse_hlo_stats(trace_dir)
    except Exception as e:
        print(f"hlo_stats parse failed ({e}); falling back to raw tool "
              "list")
        raise

    # normalize column names across plugin versions
    def col(r, *names, default=0.0):
        for n in names:
            for k in r:
                if n.lower() in k.lower():
                    return r[k]
        return default

    agg = {}
    for r in ops:
        cat = str(col(r, "category", default="?"))
        name = str(col(r, "hlo op expression", "hlo op name", "op name",
                       default="?"))[:90]
        t = float(col(r, "total self time (us)", "self time",
                      default=0.0) or 0.0)
        occ = int(col(r, "occurrences", "#occurrences", default=1) or 1)
        key = (cat, name)
        a = agg.setdefault(key, [0.0, 0])
        a[0] += t
        a[1] += occ
    total = sum(a[0] for a in agg.values())
    top = sorted(agg.items(), key=lambda kv: -kv[1][0])[:40]

    by_cat = {}
    for (cat, _), (t, _) in agg.items():
        by_cat[cat] = by_cat.get(cat, 0.0) + t

    lines = [
        "# Measured per-op device-time trace: flagship train step",
        "",
        f"jax.profiler device trace over {STEPS} train steps (batch "
        f"{BATCH}, volume {VOL_SHAPE}, s2d stem, HBM-resident data) on one "
        "v5e chip, parsed with tensorboard_plugin_profile hlo_stats. "
        "Self-time microseconds summed across the trace; regenerate with "
        "`python benchmarks/train_op_trace.py`.",
        "",
        "## Device time by op category",
        "",
        "| category | ms | % |",
        "|---|---|---|",
    ]
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        lines.append(f"| {cat} | {t / 1e3:.2f} | {100 * t / total:.1f}% |")
    lines += [
        "",
        "## Top HLO ops by self time",
        "",
        "| category | op | ms | n |",
        "|---|---|---|---|",
    ]
    for (cat, name), (t, occ) in top:
        lines.append(f"| {cat} | `{name}` | {t / 1e3:.2f} | {occ} |")
    lines.append("")

    out = os.path.join(REPO, "benchmarks", "TRAIN_OP_TRACE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print("wrote", out, f"(total device self time {total / 1e3:.1f} ms)")


if __name__ == "__main__":
    main()
