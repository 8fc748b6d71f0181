"""Device-side synthetic-task prior for ICL meta-training.

`sample_tasks` (icl.py) draws meta-training tasks with host NumPy; on the
hosted-TPU topology every step then ships ~7 MB of task tensors over a
0.4–30 MB/s tunnel link, which caps meta-training at the link speed (the
reason `cli/pretrain_icl` defaults to CPU, and the reason the bundled asset
was undertrained). This module is the TPU-native answer: the SAME
random-function prior expressed as a jit-compatible JAX program, so task
generation runs on the accelerator and whole meta-training loops compile
into one `lax.scan` with zero per-step host traffic.

Distribution parity with the host sampler (same five task families with the
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


def _bucket(key, score, c, C):
    """Bucket `score` at RANDOM cut quantiles (sorted uniforms in
    [0.05, 0.95] — host twin `_rand_cut_labels`, np.quantile 'linear'
    interpolation + np.digitize semantics); C-1 physical cuts, cuts
    ≥ c-1 masked to +inf. Random cuts give every bucketed family random
    class imbalance, matching real clinical label frequencies."""
    n = score.shape[0]
    s = jnp.sort(score)
    u = jax.random.uniform(key, (C - 1,), minval=0.05, maxval=0.95)
    u = jnp.sort(jnp.where(jnp.arange(C - 1) < c - 1, u, jnp.inf))
    finite = jnp.isfinite(u)
    pos = jnp.where(finite, u, 0.0) * (n - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(lo + 1, 0, n - 1)
    frac = (pos - lo).astype(s.dtype)
    qs = s[lo] * (1 - frac) + s[hi] * frac
    qs = jnp.where(finite, qs, jnp.inf)
    return (score[:, None] >= qs[None, :]).sum(1).astype(jnp.int32)


def _family_correlated(ks, n, F, f, feat):
    """Correlated-latent family, shared verbatim by the classifier and
    regression priors (consumes ks[7..13]): observed features = mix of
    k < f latents + small noise; the score is on the latents or on a
    whitened-coordinate direction. The whitened direction
    evecs @ (g / sqrt(evals)) is a draw from N(0, cov^-1); sample it with
    a Cholesky triangular solve instead of eigh — identical distribution,
    far cheaper to compile/run on TPU. Population covariance of the
    generative model (host uses the empirical one — same prior family);
    dead feature dims get a tiny ridge and carry zero data, so they cannot
    contribute to the score."""
    Kp = max(1, F // 2)
    k = jax.random.randint(ks[7], (), 1, jnp.maximum(2, f // 2) + 1)
    kmask = (jnp.arange(Kp) < k).astype(jnp.float32)
    z = jax.random.normal(ks[8], (n, Kp)) * kmask
    mix = jax.random.normal(ks[9], (Kp, F)) * kmask[:, None] * feat[None, :]
    eps = jax.random.uniform(ks[10], (), minval=0.02, maxval=0.3)
    xs_co = z @ mix + eps * jax.random.normal(ks[11], (n, F)) * feat
    score_lat = z @ (jax.random.normal(ks[12], (Kp,)) * kmask)
    cov = mix.T @ mix + (eps ** 2) * jnp.diag(feat) + 1e-6 * jnp.eye(F)
    chol = jnp.linalg.cholesky(cov)
    kw, kb = jax.random.split(ks[13])
    w_white = jax.scipy.linalg.solve_triangular(
        chol.T, jax.random.normal(kw, (F,)), lower=False)
    score_wht = (xs_co - xs_co.mean(0)) @ w_white
    score_co = jnp.where(jax.random.uniform(kb, ()) < 0.5,
                         score_lat, score_wht)
    return xs_co, score_co


def _family_pairwise(ks, n, F, f, feat, hard):
    """Pairwise-interaction family (consumes ks[14..17]): score dominated
    by products of feature pairs — XOR-like boundaries no linear readout
    of single features can express. ``hard`` (traced bool) switches the
    products to SIGN products (crisp quadrant boundaries, no magnitude
    cue); the regression prior always passes False."""
    xs_pw = jax.random.normal(ks[14], (n, F)) * feat
    n_pairs = jax.random.randint(ks[15], (), 1, 4)
    score_pw = (jnp.where(hard, 0.0, 0.2)
                * (xs_pw @ (jax.random.normal(ks[16], (F,)) * feat)))
    pk = jax.random.split(ks[17], 3)
    for p in range(3):
        pi, pj, pg = jax.random.split(pk[p], 3)
        i = jax.random.randint(pi, (), 0, f)
        jr = jax.random.randint(pj, (), 0, jnp.maximum(f - 1, 1))
        j = jr + (jr >= i).astype(jr.dtype)
        g = jax.random.normal(pg, ())
        raw = jnp.take(xs_pw, i, axis=1) * jnp.take(xs_pw, j, axis=1)
        term = g * jnp.where(hard, jnp.sign(raw), raw)
        score_pw = score_pw + jnp.where(p < n_pairs, term, 0.0)
    return xs_pw, score_pw


def _family_periodic(key, ks, n, F, f, feat):
    """Periodic family (consumes ks[21..23] + fold_in(key, 13)): sinusoids
    of single features + a small linear term — oscillating decision
    surfaces / the smooth nonlinear regression regime."""
    xs_pe = jax.random.normal(ks[21], (n, F)) * feat
    n_waves = jax.random.randint(ks[22], (), 1, 3)
    score_pe = 0.1 * (xs_pe @ (jax.random.normal(ks[23], (F,)) * feat))
    wk = jax.random.split(jax.random.fold_in(key, 13), 2)
    for p in range(2):
        ki_, kw_, kp_, kg_ = jax.random.split(wk[p], 4)
        i = jax.random.randint(ki_, (), 0, f)
        w = jax.random.uniform(kw_, (), minval=1.0, maxval=4.0)
        ph = jax.random.uniform(kp_, (), minval=0.0, maxval=2 * jnp.pi)
        g = jax.random.normal(kg_, ())
        term = g * jnp.sin(w * jnp.take(xs_pe, i, axis=1) + ph)
        score_pe = score_pe + jnp.where(p < n_waves, term, 0.0)
    return xs_pe, score_pe


def _one_task(key, n, F, C, thresholds=(0.22, 0.40, 0.62, 0.74)):
    """One (x (n,F) float32, y (n,) int32) draw from the prior; mirrors the
    five families of icl.sample_tasks. ``thresholds`` are the cumulative
    family-mixture cut points (see icl._mix_thresholds)."""
    ks = jax.random.split(key, 24)
    f = jax.random.randint(ks[0], (), 3, max(4, F // 2) + 1)
    # class count skewed toward binary (mirrors the host sampler)
    if C > 2:
        cb = jax.random.split(ks[1], 2)
        c = jnp.where(jax.random.uniform(cb[0], ()) < 0.5, 2,
                      jax.random.randint(cb[1], (), 2, C + 1))
    else:
        c = jax.random.randint(ks[1], (), 2, C + 1)
    kind = jax.random.uniform(ks[2], ())
    feat = (jnp.arange(F) < f).astype(jnp.float32)

    # -- cluster: class-conditional gaussians, random separation; a few
    # columns quantized to integer codes (mixed-type regime)
    sep = jax.random.uniform(ks[3], (), minval=0.5, maxval=3.0)
    centers = jax.random.normal(ks[4], (C, F)) * sep
    # Dirichlet class frequencies (host twin; rarely-balanced labels)
    dk1, dk2, dk3 = jax.random.split(ks[5], 3)
    alpha = jax.random.uniform(dk1, (), minval=0.4, maxval=3.0)
    g = jax.random.gamma(dk2, alpha, (C,))
    cls_valid = (jnp.arange(C) < c).astype(jnp.float32)
    g = g * cls_valid
    probs = g / jnp.maximum(g.sum(), 1e-9)
    probs = 0.9 * probs + 0.1 * cls_valid / jnp.maximum(c, 1)
    logits = jnp.where(cls_valid > 0, jnp.log(jnp.maximum(probs, 1e-12)),
                       -jnp.inf)
    lab_cl = jax.random.categorical(dk3, logits, shape=(n,))
    xs_cl = (centers[lab_cl] + jax.random.normal(ks[6], (n, F))) * feat
    ck = jax.random.split(jax.random.fold_in(key, 19), 2)
    n_cat_cl = jax.random.randint(ck[0], (), 0, jnp.maximum(1, f // 3) + 1)
    r_cl = jax.random.uniform(ck[1], (F,)) + (1 - feat) * 1e9
    rank_cl = jnp.argsort(jnp.argsort(r_cl))
    catm_cl = (rank_cl < n_cat_cl) & (feat > 0)
    quant_cl = (xs_cl > -0.5).astype(jnp.float32) + (xs_cl > 0.5)
    xs_cl = jnp.where(catm_cl[None, :], quant_cl, xs_cl) * feat

    # -- correlated-latent / pairwise-interaction / periodic: shared family
    # builders (same key-index consumption as inlined, so the sampled
    # stream is unchanged); half the pairwise tasks use SIGN products
    xs_co, score_co = _family_correlated(ks, n, F, f, feat)
    hard = jax.random.uniform(ks[20], ()) < 0.5
    xs_pw, score_pw = _family_pairwise(ks, n, F, f, feat, hard)
    xs_pe, score_pe = _family_periodic(key, ks, n, F, f, feat)

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

    t1, t2, t3, t4 = thresholds
    idx = ((kind >= t1).astype(jnp.int32) + (kind >= t2)
           + (kind >= t3) + (kind >= t4))
    xs = jnp.stack([xs_cl, xs_co, xs_pw, xs_pe, xs_m])[idx]
    # per-task categorical-column mask (host twin: sample_tasks `cat`):
    # the cluster and MLP families quantize some columns, others have none
    zeros_f = jnp.zeros((F,), jnp.float32)
    cat = jnp.stack([catm_cl.astype(jnp.float32), zeros_f, zeros_f,
                     zeros_f, catm.astype(jnp.float32)])[idx]
    bk = jax.random.split(jax.random.fold_in(key, 29), 4)
    lab = jnp.stack([lab_cl, _bucket(bk[0], score_co, c, C),
                     _bucket(bk[1], score_pw, c, C),
                     _bucket(bk[2], score_pe, c, C),
                     _bucket(bk[3], score_m, c, C)])[idx]

    fk, fl = jax.random.split(jax.random.fold_in(key, 7))
    # drawn per-task noise rate, mostly near zero (mirrors host sampler)
    r1, r2, rc = jax.random.split(jax.random.fold_in(key, 23), 3)
    rate = jnp.where(jax.random.uniform(rc, ()) < 0.6,
                     jax.random.uniform(r1, (), maxval=0.02),
                     jax.random.uniform(r2, (), minval=0.02, maxval=0.12))
    flip = jax.random.uniform(fk, (n,)) < rate
    lab = jnp.where(flip, jax.random.randint(fl, (n,), 0, c), lab)
    return xs, lab, cat


def _one_reg_task(key, n, F):
    """One (x (n,F) float32, y (n,) float32) continuous-target draw for the
    regression network (icl_regression.py). Families: pure-linear,
    correlated-latent, pairwise-interaction, periodic, shallow-MLP — the
    classifier prior's function families with the quantile-bucketing step
    removed and a drawn observation-noise level added."""
    ks = jax.random.split(key, 24)
    f = jax.random.randint(ks[0], (), 3, max(4, F // 2) + 1)
    kind = jax.random.uniform(ks[2], ())
    feat = (jnp.arange(F) < f).astype(jnp.float32)

    # -- pure linear (the bread-and-butter regression regime)
    xs_li = jax.random.normal(ks[3], (n, F)) * feat
    score_li = xs_li @ (jax.random.normal(ks[4], (F,)) * feat)

    # -- correlated-latent / pairwise (soft products only) / periodic:
    # shared family builders — any fix lands in both priors at once
    xs_co, score_co = _family_correlated(ks, n, F, f, feat)
    xs_pw, score_pw = _family_pairwise(ks, n, F, f, feat,
                                       jnp.asarray(False))
    xs_pe, score_pe = _family_periodic(key, ks, n, F, f, feat)

    # -- random shallow MLP
    xs_m = jax.random.normal(ks[18], (n, F)) * feat
    mk = jax.random.split(ks[19], 6)
    h1 = jnp.tanh(xs_m @ jax.random.normal(mk[2], (F, 8))
                  + jax.random.normal(mk[3], (8,)))
    score_m = (h1 @ jax.random.normal(mk[4], (8,))
               + 0.3 * xs_m @ (jax.random.normal(mk[5], (F,)) * feat))

    idx = ((kind >= 0.25).astype(jnp.int32) + (kind >= 0.45)
           + (kind >= 0.60) + (kind >= 0.75))
    xs = jnp.stack([xs_li, xs_co, xs_pw, xs_pe, xs_m])[idx]
    score = jnp.stack([score_li, score_co, score_pw, score_pe, score_m])[idx]

    nk1, nk2 = jax.random.split(jax.random.fold_in(key, 17))
    noise_frac = jax.random.uniform(nk1, (), minval=0.01, maxval=0.3)
    sd = jnp.sqrt(jnp.maximum(score.var(), 1e-9))
    y = score + noise_frac * sd * jax.random.normal(nk2, (n,))
    return xs, y.astype(jnp.float32)


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def sample_reg_tasks_device(key, batch: int, cfg, n_ctx: int, n_qry: int,
                            var_ctx: bool = True):
    """Continuous-target twin of sample_tasks_device for the regression
    network; `cfg` is a RegICLConfig (only max_features is read)."""
    n = n_ctx + n_qry
    kt, kv = jax.random.split(key)
    x, y = jax.vmap(lambda k: _one_reg_task(k, n, cfg.max_features))(
        jax.random.split(kt, batch))
    ctx_mask = jnp.ones((batch, n_ctx), jnp.float32)
    if var_ctx and n_ctx > 16:
        n_valid = jax.random.randint(kv, (batch, 1), 16, n_ctx + 1)
        ctx_mask = (jnp.arange(n_ctx)[None, :] < n_valid).astype(jnp.float32)
    x_ctx = x[:, :n_ctx] * ctx_mask[..., None]
    y_ctx = y[:, :n_ctx] * ctx_mask
    return {"x_ctx": x_ctx, "y_ctx": y_ctx, "ctx_mask": ctx_mask,
            "x_qry": x[:, n_ctx:], "y_qry": y[:, n_ctx:]}


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def sample_tasks_device(key, batch: int, cfg: ICLConfig, n_ctx: int,
                        n_qry: int, var_ctx: bool = True,
                        mix: tuple | None = None):
    """Jit-compatible twin of icl.sample_tasks: returns the same dict of
    (B, ...) task tensors, generated on-device. ``mix`` overrides the five
    family weights (icl.DEFAULT_FAMILY_MIX) for biased curriculum phases."""
    from .icl import DEFAULT_FAMILY_MIX, _mix_thresholds

    thresholds = _mix_thresholds(DEFAULT_FAMILY_MIX if mix is None else mix)
    n = n_ctx + n_qry
    kt, kv = jax.random.split(key)
    x, y, cat = jax.vmap(lambda k: _one_task(k, n, cfg.max_features,
                                             cfg.max_classes, thresholds))(
        jax.random.split(kt, batch))
    ctx_mask = jnp.ones((batch, n_ctx), jnp.float32)
    if var_ctx and n_ctx > 16:
        n_valid = jax.random.randint(kv, (batch, 1), 16, n_ctx + 1)
        ctx_mask = (jnp.arange(n_ctx)[None, :] < n_valid).astype(jnp.float32)
    x_ctx = x[:, :n_ctx] * ctx_mask[..., None]
    y_ctx = (y[:, :n_ctx] * ctx_mask.astype(jnp.int32))
    return {"x_ctx": x_ctx, "y_ctx": y_ctx, "ctx_mask": ctx_mask,
            "x_qry": x[:, n_ctx:], "y_qry": y[:, n_ctx:],
            "cat_mask": cat}
