"""Device-side synthetic-task prior for ICL meta-training.

`sample_tasks` (icl.py) draws meta-training tasks with host NumPy; on the
hosted-TPU topology every step then ships ~7 MB of task tensors over a
0.4–30 MB/s tunnel link, which caps meta-training at the link speed (the
reason `cli/pretrain_icl` defaults to CPU, and the reason the bundled asset
was undertrained). This module is the TPU-native answer: the SAME
random-function prior expressed as a jit-compatible JAX program, so task
generation runs on the accelerator and whole meta-training loops compile
into one `lax.scan` with zero per-step host traffic.

Distribution parity with the host sampler (same four task families with the
same mixture weights, feature/class/context-length ranges, label noise) is
asserted statistically in tests/test_tabular.py::TestDevicePrior. Exact
stream equality is NOT a goal — both are draws from the same prior.

Dynamic task ingredients (feature count, class count, latent rank, valid
context length) become static-shape masks: features ≥ f are zeroed, class
thresholds ≥ c-1 are +inf, context rows ≥ n_valid are masked — the physical
shapes never change, so one compilation serves every draw.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .icl import ICLConfig


def _bucket(score, c, C):
    """Quantile-bucket `score` into `c` classes (np.quantile 'linear'
    interpolation + np.digitize semantics); C-1 physical thresholds,
    thresholds ≥ c-1 masked to +inf."""
    n = score.shape[0]
    s = jnp.sort(score)
    i = jnp.arange(1, C)
    pos = (i / c) * (n - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(lo + 1, 0, n - 1)
    frac = (pos - lo).astype(s.dtype)
    qs = s[lo] * (1 - frac) + s[hi] * frac
    qs = jnp.where(i < c, qs, jnp.inf)
    return (score[:, None] >= qs[None, :]).sum(1).astype(jnp.int32)


def _one_task(key, n, F, C):
    """One (x (n,F) float32, y (n,) int32) draw from the prior; mirrors the
    four families of icl.sample_tasks."""
    ks = jax.random.split(key, 20)
    f = jax.random.randint(ks[0], (), 3, max(4, F // 2) + 1)
    c = jax.random.randint(ks[1], (), 2, C + 1)
    kind = jax.random.uniform(ks[2], ())
    feat = (jnp.arange(F) < f).astype(jnp.float32)

    # -- cluster: class-conditional gaussians, random separation
    sep = jax.random.uniform(ks[3], (), minval=0.5, maxval=3.0)
    centers = jax.random.normal(ks[4], (C, F)) * sep
    lab_cl = jax.random.randint(ks[5], (n,), 0, c)
    xs_cl = (centers[lab_cl] + jax.random.normal(ks[6], (n, F))) * feat

    # -- correlated-latent: observed = mix of k < f latents + small noise;
    # score on the latents or on a whitened-coordinate direction
    Kp = max(1, F // 2)
    k = jax.random.randint(ks[7], (), 1, jnp.maximum(2, f // 2) + 1)
    kmask = (jnp.arange(Kp) < k).astype(jnp.float32)
    z = jax.random.normal(ks[8], (n, Kp)) * kmask
    mix = jax.random.normal(ks[9], (Kp, F)) * kmask[:, None] * feat[None, :]
    eps = jax.random.uniform(ks[10], (), minval=0.02, maxval=0.3)
    xs_co = z @ mix + eps * jax.random.normal(ks[11], (n, F)) * feat
    score_lat = z @ (jax.random.normal(ks[12], (Kp,)) * kmask)
    # population covariance of the generative model (host uses the empirical
    # one — same prior family); dead feature dims get a tiny ridge and carry
    # zero data, so they cannot contribute to the score
    cov = mix.T @ mix + (eps ** 2) * jnp.diag(feat) + 1e-6 * jnp.eye(F)
    evals, evecs = jnp.linalg.eigh(cov)
    kw, kb = jax.random.split(ks[13])
    w_white = evecs @ (jax.random.normal(kw, (F,)) / jnp.sqrt(evals))
    score_wht = (xs_co - xs_co.mean(0)) @ w_white
    score_co = jnp.where(jax.random.uniform(kb, ()) < 0.5,
                         score_lat, score_wht)

    # -- pairwise-interaction: XOR-like products of feature pairs
    xs_pw = jax.random.normal(ks[14], (n, F)) * feat
    n_pairs = jax.random.randint(ks[15], (), 1, 4)
    score_pw = 0.2 * xs_pw @ (jax.random.normal(ks[16], (F,)) * feat)
    pk = jax.random.split(ks[17], 3)
    for p in range(3):
        pi, pj, pg = jax.random.split(pk[p], 3)
        i = jax.random.randint(pi, (), 0, f)
        jr = jax.random.randint(pj, (), 0, jnp.maximum(f - 1, 1))
        j = jr + (jr >= i).astype(jr.dtype)
        g = jax.random.normal(pg, ())
        term = g * jnp.take(xs_pw, i, axis=1) * jnp.take(xs_pw, j, axis=1)
        score_pw = score_pw + jnp.where(p < n_pairs, term, 0.0)

    # -- random shallow MLP with some features quantized to {0,1,2}
    xs_m = jax.random.normal(ks[18], (n, F))
    mk = jax.random.split(ks[19], 6)
    n_cat = jax.random.randint(mk[0], (), 0, jnp.maximum(1, f // 3) + 1)
    r = jax.random.uniform(mk[1], (F,)) + (1 - feat) * 1e9
    rank = jnp.argsort(jnp.argsort(r))
    catm = (rank < n_cat) & (feat > 0)
    quant = (xs_m > -0.5).astype(jnp.float32) + (xs_m > 0.5)
    xs_m = jnp.where(catm[None, :], quant, xs_m) * feat
    h1 = jnp.tanh(xs_m @ jax.random.normal(mk[2], (F, 8))
                  + jax.random.normal(mk[3], (8,)))
    score_m = (h1 @ jax.random.normal(mk[4], (8,))
               + 0.3 * xs_m @ jax.random.normal(mk[5], (F,)))

    idx = ((kind >= 0.30).astype(jnp.int32) + (kind >= 0.45)
           + (kind >= 0.58))
    xs = jnp.stack([xs_cl, xs_co, xs_pw, xs_m])[idx]
    lab = jnp.stack([lab_cl, _bucket(score_co, c, C),
                     _bucket(score_pw, c, C), _bucket(score_m, c, C)])[idx]

    fk, fl = jax.random.split(jax.random.fold_in(key, 7))
    flip = jax.random.uniform(fk, (n,)) < 0.05
    lab = jnp.where(flip, jax.random.randint(fl, (n,), 0, c), lab)
    return xs, lab


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def sample_tasks_device(key, batch: int, cfg: ICLConfig, n_ctx: int,
                        n_qry: int, var_ctx: bool = True):
    """Jit-compatible twin of icl.sample_tasks: returns the same dict of
    (B, ...) task tensors, generated on-device."""
    n = n_ctx + n_qry
    kt, kv = jax.random.split(key)
    x, y = jax.vmap(lambda k: _one_task(k, n, cfg.max_features,
                                        cfg.max_classes))(
        jax.random.split(kt, batch))
    ctx_mask = jnp.ones((batch, n_ctx), jnp.float32)
    if var_ctx and n_ctx > 16:
        n_valid = jax.random.randint(kv, (batch, 1), 16, n_ctx + 1)
        ctx_mask = (jnp.arange(n_ctx)[None, :] < n_valid).astype(jnp.float32)
    x_ctx = x[:, :n_ctx] * ctx_mask[..., None]
    y_ctx = (y[:, :n_ctx] * ctx_mask.astype(jnp.int32))
    return {"x_ctx": x_ctx, "y_ctx": y_ctx, "ctx_mask": ctx_mask,
            "x_qry": x[:, n_ctx:], "y_qry": y[:, n_ctx:]}
