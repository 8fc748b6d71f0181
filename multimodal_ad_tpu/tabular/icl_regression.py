"""In-context regression network with bar-distribution (Riemann) decoding.

The reference's tabular branch exposes a TabPFNRegressor surface backed by
the TabPFN v2 foundation model (reference models/tabpfn-extensions/src/
tabpfn_extensions/utils.py:302-440). Round 2 approximated it by reusing the
*classification* network over quantile-bucketed targets; this module is the
proper TabPFN-v2-style design — a dedicated prior-fitted network:

- context rows embed a CONTINUOUS target (z-scored by context statistics)
  through a learned projection instead of a class-label embedding,
- the head emits logits over `n_bins` equal-width bars spanning
  [-y_clip, y_clip] in context-normalized target space (a piecewise-
  uniform "Riemann" distribution),
- meta-training minimizes soft (two-hot, linearly interpolated) cross-
  entropy of the bar distribution against the true normalized target,
- decoding: mean = E[bar centers], median/quantiles from the bar CDF.

Everything is static-shape and jit-compiled; tasks for meta-training come
from `icl_prior.sample_reg_tasks_device`, generated on the accelerator so
whole meta-training loops fuse into one `lax.scan` (same rationale as the
classifier prior — icl_prior.py module docstring).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from .icl import ICLBlock


@dataclass(frozen=True)
class RegICLConfig:
    d_model: int = 256
    n_heads: int = 8
    n_layers: int = 6
    d_ff: int = 1024
    max_features: int = 192
    max_context: int = 512
    n_bins: int = 32
    y_clip: float = 3.0
    dropout: float = 0.0


def bin_centers(cfg: RegICLConfig) -> np.ndarray:
    edges = np.linspace(-cfg.y_clip, cfg.y_clip, cfg.n_bins + 1)
    return ((edges[:-1] + edges[1:]) / 2).astype(np.float32)


class RegICLTransformer(nn.Module):
    """Forward over a batch of in-context regression tasks.

    Inputs:
      x_ctx (B, N, F), y_ctx (B, N) float32 (context-normalized),
      ctx_mask (B, N) {0,1}, x_qry (B, M, F)
    Returns:
      bar logits (B, M, n_bins), qry_emb (B, M, d_model),
      ctx_emb (B, N, d_model)
    """

    cfg: RegICLConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_ctx, y_ctx, ctx_mask, x_qry, deterministic=True):
        c = self.cfg
        b, n, f = x_ctx.shape
        m = x_qry.shape[1]

        proj = nn.Dense(c.d_model, dtype=self.dtype, name="feature_proj")
        target_proj = nn.Dense(c.d_model, dtype=self.dtype,
                               name="target_proj")
        query_tok = self.param("query_token",
                               nn.initializers.normal(0.02), (c.d_model,))

        h_ctx = proj(x_ctx) + target_proj(y_ctx[..., None])
        h_qry = proj(x_qry) + query_tok.astype(self.dtype)
        h = jnp.concatenate([h_ctx, h_qry], axis=1)

        # same masking rule as the classifier: keys are valid context
        # tokens (+ self); queries never leak into each other
        total = n + m
        key_is_ctx = jnp.concatenate(
            [ctx_mask.astype(bool), jnp.zeros((b, m), bool)], axis=1)
        allowed = jnp.broadcast_to(key_is_ctx[:, None, :], (b, total, total))
        eye = jnp.eye(total, dtype=bool)[None]
        allowed = (allowed | eye)[:, None]

        from .icl import ICLConfig

        blk = ICLConfig(d_model=c.d_model, n_heads=c.n_heads,
                        n_layers=c.n_layers, d_ff=c.d_ff, dropout=c.dropout)
        for _ in range(c.n_layers):
            h = ICLBlock(blk, dtype=self.dtype)(h, allowed, deterministic)
        h = nn.LayerNorm(dtype=self.dtype)(h)

        logits = nn.Dense(c.n_bins, dtype=self.dtype, name="reg_head")(h)
        return logits[:, n:], h[:, n:], h[:, :n]


def soft_two_hot(y, centers):
    """Linearly-interpolated two-hot target over equal-width bar centers:
    the smooth analogue of a one-hot bucket label (keeps the regression
    gradient informative within a bar)."""
    k = centers.shape[0]
    step = centers[1] - centers[0]
    pos = (jnp.clip(y, centers[0], centers[-1]) - centers[0]) / step
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, k - 2)
    w_hi = pos - lo
    return (jax.nn.one_hot(lo, k) * (1 - w_hi)[..., None]
            + jax.nn.one_hot(lo + 1, k) * w_hi[..., None])


def _zscore_y_by_ctx(y_ctx, ctx_mask, y_qry=None):
    """Normalize targets by VALID-context statistics (mask-aware); the
    inference path fits the same statistics from the training targets."""
    denom = jnp.maximum(ctx_mask.sum(-1, keepdims=True), 1.0)
    mean = (y_ctx * ctx_mask).sum(-1, keepdims=True) / denom
    var = (((y_ctx - mean) ** 2) * ctx_mask).sum(-1, keepdims=True) / denom
    std = jnp.sqrt(var + 1e-9)
    z_ctx = (y_ctx - mean) / std * ctx_mask
    if y_qry is None:
        return z_ctx, mean, std
    return z_ctx, (y_qry - mean) / std


def pretrain_icl_regression(cfg: RegICLConfig = RegICLConfig(),
                            steps: int = 3000, batch: int = 32,
                            n_ctx: int = 96, n_qry: int = 32,
                            lr: float = 3e-4, seed: int = 0,
                            verbose: bool = False, init_params=None,
                            chunk: int = 100):
    """Meta-train the regression network on the continuous-target prior.

    Task sampling always runs on-device (`sample_reg_tasks_device` is plain
    jit-compatible JAX, so it works identically on CPU); `chunk` meta-steps
    fuse into one `lax.scan` dispatch with zero per-step host traffic."""
    from .icl import _zscore_by_ctx
    from .icl_prior import sample_reg_tasks_device

    model = RegICLTransformer(cfg)
    centers = jnp.asarray(bin_centers(cfg))
    k0 = jax.random.PRNGKey(seed)
    t0 = sample_reg_tasks_device(k0, 1, cfg, 8, 4)
    params = init_params if init_params is not None else model.init(
        k0, t0["x_ctx"], t0["y_ctx"], t0["ctx_mask"], t0["x_qry"])
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(optax.cosine_decay_schedule(lr, steps)))
    opt_state = tx.init(params)

    def loss_fn(p, task):
        xc, xq = _zscore_by_ctx(task["x_ctx"], task["x_qry"],
                                task["ctx_mask"])
        zc, zq = _zscore_y_by_ctx(task["y_ctx"], task["ctx_mask"],
                                  task["y_qry"])
        logits, _, _ = model.apply(p, xc, zc, task["ctx_mask"], xq)
        target = soft_two_hot(zq, centers)
        logp = jax.nn.log_softmax(logits)
        return -(target * logp).sum(-1).mean()

    from functools import partial

    @partial(jax.jit, static_argnames="length")
    def run_chunk(params, opt_state, key, length):
        def body(carry, _):
            params, opt_state, key = carry
            key, tk = jax.random.split(key)
            task = sample_reg_tasks_device(tk, batch, cfg, n_ctx, n_qry)
            loss, grads = jax.value_and_grad(loss_fn)(params, task)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state,
                    key), loss

        (params, opt_state, key), losses = jax.lax.scan(
            body, (params, opt_state, key), None, length=length)
        return params, opt_state, key, losses.mean()

    key = jax.random.PRNGKey(seed + 1)
    done = 0
    while done < steps:
        n = min(chunk, steps - done)
        params, opt_state, key, mloss = run_chunk(params, opt_state, key, n)
        done += n
        if verbose:
            print(f"[icl-reg pretrain] step {done}/{steps} "
                  f"loss {float(mloss):.4f}", flush=True)
    return params, cfg


def default_reg_asset_path() -> str:
    """Bundled regression asset; override with MAD_ICL_REG_ASSET."""
    import os

    env = os.environ.get("MAD_ICL_REG_ASSET")
    if env:
        return env
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", "icl_regression_default.msgpack")


def _load_reg_params_file(cfg: RegICLConfig, path: str):
    from .icl import validated_from_bytes

    model = RegICLTransformer(cfg)
    t = sample_template_task(cfg)
    template = model.init(jax.random.PRNGKey(0), t["x_ctx"], t["y_ctx"],
                          t["ctx_mask"], t["x_qry"])
    return validated_from_bytes(template, path)


def sample_template_task(cfg: RegICLConfig):
    rng = np.random.default_rng(0)
    return {
        "x_ctx": jnp.asarray(rng.normal(size=(1, 8, cfg.max_features)),
                             jnp.float32),
        "y_ctx": jnp.zeros((1, 8), jnp.float32),
        "ctx_mask": jnp.ones((1, 8), jnp.float32),
        "x_qry": jnp.asarray(rng.normal(size=(1, 4, cfg.max_features)),
                             jnp.float32),
    }


def load_default_reg_params(cfg: RegICLConfig):
    """Meta-trained regression weights for `cfg` under the classifier's
    shared `resolve_asset_params` policy (one source of truth): dangling
    MAD_ICL_REG_ASSET or a shape mismatch raises; None when no asset
    applies (the estimator self-pretrains)."""
    from .icl import resolve_asset_params

    return resolve_asset_params(
        lambda p: _load_reg_params_file(cfg, p), "MAD_ICL_REG_ASSET",
        default_reg_asset_path(), cfg == RegICLConfig(),
        f"RegICLConfig {cfg}")
