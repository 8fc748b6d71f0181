"""In-step A/B of the input front end: XLA gather->normalize vs the fused
Pallas kernel (ops/fused_gather.py) INSIDE the jitted train and infer steps.

Round 3 measured the kernel in isolation, where both paths sat on the
~25 ms tunnel RTT floor and the win was unresolvable (ROI_POOL.md). The
trace (benchmarks/TRAIN_OP_TRACE.md) attributes 15.4 ms/step of the
batch-128 train step to the gather+normalize+s2d chain, so the honest
measurement is step-time delta with everything else held constant:
variants interleaved A/B/A/B to cancel tunnel drift.

Run on the real chip: python benchmarks/train_frontend_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

VOL_SHAPE = (91, 109, 91)
TRAIN_BATCH = 128
INFER_BATCH = 512
REPS = int(os.environ.get("AB_REPS", "3"))


def build(fused: bool):
    from multimodal_ad_tpu.data.device_cache import DeviceDataset
    from multimodal_ad_tpu.models.resnet3d import generate_model
    from multimodal_ad_tpu.ops.normalize import scale_intensity
    from multimodal_ad_tpu.parallel.mesh import make_mesh, replicate
    from multimodal_ad_tpu.train.loop import (create_train_state,
                                              make_epoch_schedule,
                                              make_train_step)

    rng = np.random.default_rng(0)
    vols = rng.integers(0, 4096, (12, *VOL_SHAPE, 1)).astype(np.int16)
    labels = (np.arange(12) % 2).astype(np.int32)
    mesh = make_mesh({"data": -1})
    ds = DeviceDataset(vols, labels, mesh=mesh, fused_norm=fused)

    model = generate_model(model_depth=18, nb_class=2)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        {"image": jnp.zeros((1, *VOL_SHAPE, 1), jnp.float32)},
        make_epoch_schedule(1e-4, 100))
    state = replicate(state, mesh)
    cw = replicate(jnp.ones((2,), jnp.float32), mesh)
    base_step = make_train_step(2)

    # the WHOLE step is jitted (matching bench.py): outside jit the gather
    # and normalize would dispatch eagerly op-by-op over the tunnel, which
    # measures RTT count, not the front end. Donation rides the outer jit.
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, indices, key):
        if fused:
            b = ds.gather_normalized(indices, out_dtype=jnp.bfloat16)
        else:
            b = ds.gather(indices)
            b["image"] = scale_intensity(b["image"])
        return base_step(state, b, cw, key)

    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, *VOL_SHAPE, 1), jnp.float32),
                           train=False)

    @jax.jit
    def infer_step(indices):
        if fused:
            b = ds.gather_normalized(indices, out_dtype=jnp.bfloat16)
        else:
            b = ds.gather(indices)
            b["image"] = scale_intensity(b["image"])
        return model.apply(variables, b["image"], train=False)

    return ds, state, cw, train_step, infer_step


def main():
    builds = {tag: build(tag == "fused") for tag in ("xla", "fused")}
    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(1)
    results = {"train": {"xla": [], "fused": []},
               "infer": {"xla": [], "fused": []}}

    # compile both variants first so timed sections only run cached HLO
    states = {}
    for tag, (ds, state, cw, tstep, istep) in builds.items():
        s, loss, _ = tstep(state, jnp.zeros(TRAIN_BATCH, jnp.int32), key)
        np.asarray(loss)
        np.asarray(istep(jnp.zeros(INFER_BATCH, jnp.int32)))
        states[tag] = s
        print(f"compiled {tag}", file=sys.stderr, flush=True)

    for rep in range(REPS):
        for tag, (ds, _, cw, tstep, istep) in builds.items():
            idx = lambda n: jnp.asarray(rng.integers(0, ds.n, n), jnp.int32)
            t0 = time.perf_counter()
            s = states[tag]
            for _ in range(4):
                s, loss, _ = tstep(s, idx(TRAIN_BATCH), key)
            np.asarray(loss)
            # the step donates the state: the old states[tag] buffer is
            # dead after the first call, so keep the live one for rep+1
            states[tag] = s
            results["train"][tag].append(
                4 * TRAIN_BATCH / (time.perf_counter() - t0))
            t0 = time.perf_counter()
            for _ in range(2):
                out = istep(idx(INFER_BATCH))
            np.asarray(out)
            results["infer"][tag].append(
                2 * INFER_BATCH / (time.perf_counter() - t0))
            print(f"rep{rep} {tag}: train "
                  f"{results['train'][tag][-1]:.1f} vols/s, infer "
                  f"{results['infer'][tag][-1]:.1f} vols/s",
                  file=sys.stderr, flush=True)

    # rep 0 is warm-up (tunnel + allocator effects linger past the compile
    # pass — measured: rep0 xla 253/732 vols/s vs steady-state 323/1078);
    # medians are over the remaining reps when there are enough
    steady = {phase: {tag: v[1:] if len(v) > 2 else v
                      for tag, v in d.items()}
              for phase, d in results.items()}
    summary = {phase: {tag: round(float(np.median(v)), 2)
                       for tag, v in d.items()}
               for phase, d in steady.items()}
    summary["reps_raw"] = {phase: {tag: [round(x, 1) for x in v]
                                   for tag, v in d.items()}
                           for phase, d in results.items()}
    summary["train_speedup"] = round(
        summary["train"]["fused"] / summary["train"]["xla"], 4)
    summary["infer_speedup"] = round(
        summary["infer"]["fused"] / summary["infer"]["xla"], 4)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
