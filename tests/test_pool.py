"""max_pool_3d_fast: the TPU-fast tie-splitting maxpool backward.

Validates the custom_vjp against XLA's select-and-scatter autodiff:
bit-near equality on tie-free inputs (both route each window's cotangent
to the unique argmax) and exact gradient-mass preservation on tied
windows (where the two differ only in which valid subgradient they pick —
see the intentional-divergence note in ops/pool.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from multimodal_ad_tpu.ops.pool import max_pool_3d_fast


def _ref_pool(x, w, s, p):
    return nn.max_pool(x, (w,) * 3, strides=(s,) * 3, padding=((p, p),) * 3)


CASES = [
    (3, 2, 1, (2, 9, 9, 9, 4)),     # ResNet/DAFT stem pool, odd extents
    (3, 2, 1, (1, 16, 16, 16, 3)),  # even extents
    (2, 2, 0, (2, 8, 8, 8, 4)),     # U-Net / sNet encoder pool
    (2, 2, 0, (1, 10, 10, 10, 2)),
    (3, 2, 1, (2, 8, 7, 9, 5)),     # mixed-parity spatial dims
]


@pytest.mark.parametrize("w,s,p,shape", CASES)
def test_forward_matches_reduce_window(w, s, p, shape):
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape), jnp.float32)
    np.testing.assert_allclose(
        max_pool_3d_fast(x, w, s, p), _ref_pool(x, w, s, p))


@pytest.mark.parametrize("w,s,p,shape", CASES)
def test_backward_matches_xla_on_tiefree(w, s, p, shape):
    rng = np.random.default_rng(1)
    # continuous random input: ties have probability zero
    x = jnp.asarray(rng.normal(size=shape), jnp.float32)
    g = jnp.asarray(rng.normal(size=_ref_pool(x, w, s, p).shape), jnp.float32)
    gf = jax.grad(lambda x: jnp.sum(max_pool_3d_fast(x, w, s, p) * g))(x)
    gr = jax.grad(lambda x: jnp.sum(_ref_pool(x, w, s, p) * g))(x)
    np.testing.assert_allclose(gf, gr, atol=1e-5)


def test_tied_windows_preserve_gradient_mass():
    # all-zero input (the post-ReLU plateau case): every window fully tied.
    x = jnp.zeros((1, 8, 8, 8, 2), jnp.float32)
    g = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, 4, 4, 4, 2)), jnp.float32)
    gf = jax.grad(lambda x: jnp.sum(max_pool_3d_fast(x, 3, 2, 1) * g))(x)
    assert abs(float(jnp.sum(gf) - jnp.sum(g))) < 1e-5
    # overlapping 3^3/s2 windows with shared maxima: per-window equal split
    # means interior elements accumulate from up to 8 windows; just check
    # the split is symmetric for the 2^3/s2 non-overlapping case too.
    gf2 = jax.grad(lambda x: jnp.sum(max_pool_3d_fast(x, 2, 2, 0) * g))(x)
    np.testing.assert_allclose(
        np.asarray(gf2),
        np.repeat(np.repeat(np.repeat(np.asarray(g), 2, 1), 2, 2), 2, 3) / 8,
        atol=1e-6)


def test_grad_under_jit_and_vmap():
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 8, 8, 8, 3)), jnp.float32)
    f = jax.jit(jax.grad(lambda x: jnp.sum(max_pool_3d_fast(x, 3, 2, 1))))
    r = jax.grad(lambda x: jnp.sum(_ref_pool(x, 3, 2, 1)))(x)
    np.testing.assert_allclose(f(x), r, atol=1e-5)


def test_bf16_dtype_preserved():
    x = jnp.asarray(
        np.random.default_rng(4).normal(size=(1, 8, 8, 8, 2)), jnp.bfloat16)
    y = max_pool_3d_fast(x, 3, 2, 1)
    assert y.dtype == jnp.bfloat16
    gx = jax.grad(
        lambda x: jnp.sum(max_pool_3d_fast(x, 3, 2, 1).astype(jnp.float32)))(x)
    assert gx.dtype == jnp.bfloat16
