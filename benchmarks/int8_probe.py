"""Probe: does int8 MXU throughput beat bf16 for this workload's convs?

v5e lists 394 int8 TOPS vs 197 bf16 TFLOP/s (2x). Whether XLA actually
routes `lax.conv_general_dilated` with int8 operands +
`preferred_element_type=int32` onto the int8 MXU path — and whether the
quantize/dequantize overhead swamps the gain at this model's shapes — is
an empirical question this probe answers before any quantized-inference
engineering. Measures the flagship's two FLOP-dominant stages (stage4
dil4 and stage3 dil2 — ~84% of conv FLOPs, benchmarks/ROOFLINE.md) plus
a large dense matmul as the upper-bound reference.

Run on the real chip: python benchmarks/int8_probe.py
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

DN = lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                ("NDHWC", "DHWIO", "NDHWC"))


def timeit(fn, *args, reps=10):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # fetch = sync
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.time() - t0) / reps


def conv_case(name, B, spatial, C, K, dil, flops):
    d, h, w = spatial
    kx, kw = jax.random.split(jax.random.PRNGKey(0))
    xf = jax.random.normal(kx, (B, d, h, w, C), jnp.bfloat16)
    wf = (jax.random.normal(kw, (3, 3, 3, C, K), jnp.float32) * 0.05
          ).astype(jnp.bfloat16)
    xi = jnp.clip(xf.astype(jnp.float32) * 32, -127, 127).astype(jnp.int8)
    wi = jnp.clip(wf.astype(jnp.float32) * 512, -127, 127).astype(jnp.int8)

    @jax.jit
    def f_bf16(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1, 1), ((dil, dil),) * 3, rhs_dilation=(dil,) * 3,
            dimension_numbers=DN)

    @jax.jit
    def f_int8(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1, 1), ((dil, dil),) * 3, rhs_dilation=(dil,) * 3,
            dimension_numbers=DN, preferred_element_type=jnp.int32)

    tb = timeit(f_bf16, xf, wf)
    ti = timeit(f_int8, xi, wi)
    print(f"{name}: bf16 {tb*1e3:.2f} ms ({flops/tb/1e12:.1f} TFLOP/s)  "
          f"int8 {ti*1e3:.2f} ms ({flops/ti/1e12:.1f} TOP/s)  "
          f"speedup {tb/ti:.2f}x", flush=True)


def main():
    print("devices:", jax.devices())
    # stage4: B=128, 12x14x12, 512ch, 3^3 dil4 (the 67%-of-FLOPs stage)
    f4 = 2 * 128 * 12 * 14 * 12 * 27 * 512 * 512
    conv_case("stage4 dil4 512ch", 128, (12, 14, 12), 512, 512, 4, f4)
    # stage3: B=128, 12x14x12, 256ch, 3^3 dil2
    f3 = 2 * 128 * 12 * 14 * 12 * 27 * 256 * 256
    conv_case("stage3 dil2 256ch", 128, (12, 14, 12), 256, 256, 2, f3)

    # dense matmul upper bound: (8192, 4096) @ (4096, 4096)
    M, Kd, N = 8192, 4096, 4096
    ka, kb = jax.random.split(jax.random.PRNGKey(1))
    af = jax.random.normal(ka, (M, Kd), jnp.bfloat16)
    bf = jax.random.normal(kb, (Kd, N), jnp.bfloat16)
    ai = jnp.clip(af.astype(jnp.float32) * 16, -127, 127).astype(jnp.int8)
    bi = jnp.clip(bf.astype(jnp.float32) * 16, -127, 127).astype(jnp.int8)
    mm_b = jax.jit(lambda a, b: a @ b)
    mm_i = jax.jit(lambda a, b: jax.lax.dot(
        a, b, preferred_element_type=jnp.int32))
    fl = 2 * M * Kd * N
    tb = timeit(mm_b, af, bf)
    ti = timeit(mm_i, ai, bi)
    print(f"matmul 8192x4096x4096: bf16 {tb*1e3:.2f} ms "
          f"({fl/tb/1e12:.1f} TFLOP/s)  int8 {ti*1e3:.2f} ms "
          f"({fl/ti/1e12:.1f} TOP/s)  speedup {tb/ti:.2f}x", flush=True)


if __name__ == "__main__":
    main()
