"""In-context tabular learner (TabPFN-style prior-fitted transformer).

The reference's tabular branch wraps the external TabPFN v2 foundation model
(reference models/tabpfn-extensions/src/tabpfn_extensions/utils.py:270-300);
its checkpoint is not shipped (.MISSING_LARGE_BLOBS). Per SURVEY.md §7.3 the
TPU build ships the same *interface* with a swappable embedder, plus this
from-scratch small prior-fitted network as the TPU-native default:

- a row-token transformer: each table row is one token (feature values
  z-scored by context statistics, projected to d_model); context rows add a
  label embedding, query rows a learned [QUERY] embedding,
- masked attention: every token attends to context tokens only (queries
  never leak into keys) — one (N+M) self-attention with a bias mask, which
  XLA maps onto the MXU as plain batched matmuls,
- meta-trained on synthetic tasks from a random-function prior
  (`sample_tasks`): random MLP/linear latent functions over mixed
  gaussian/quantized features, quantile-bucketed into classes,
- fit() = store the (z-scored, padded) context set; predict()/embeddings =
  one jit'd forward. No gradient at inference — exactly the TabPFN usage
  pattern.

Static shapes throughout: features pad to `max_features`, context rows pad
to `max_context` with a validity mask, classes pad to `max_classes`.
"""

from __future__ import annotations


from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from sklearn.base import BaseEstimator, ClassifierMixin


@dataclass(frozen=True)
class ICLConfig:
    """Default capacity (d_model 256 / 6 layers) chosen in round 3: the
    round-2 asset (d_model 128 / 4 layers) measurably plateaued below the
    sklearn baselines on 2 of 6 benchmark families (assets/README.md)."""

    d_model: int = 256
    n_heads: int = 8
    n_layers: int = 6
    d_ff: int = 1024
    max_features: int = 192
    max_classes: int = 10
    max_context: int = 512
    dropout: float = 0.0
    #: native categorical handling: the forward accepts a per-feature
    #: categorical-indicator mask feeding two zero-init projections (values
    #: of categorical columns + the column-type pattern itself), so the
    #: network can treat integer-coded categories non-ordinally — the
    #: reference's TabPFN path likewise feeds inferred categorical indices
    #: to the model natively (reference utils.py:330-380). Zero-init keeps
    #: a warm-started asset's behavior identical until meta-training moves
    #: the new weights. Default True since round 4: the bundled asset is
    #: trained with the categorical pathway (and the contrastive
    #: embedding objective) active — see assets/README.md provenance.
    cat_input: bool = True


class ICLBlock(nn.Module):
    cfg: ICLConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, attn_mask, deterministic=True):
        c = self.cfg
        y = nn.LayerNorm(dtype=self.dtype)(h)
        y = nn.MultiHeadDotProductAttention(
            num_heads=c.n_heads, qkv_features=c.d_model, dtype=self.dtype,
            deterministic=deterministic, dropout_rate=c.dropout,
        )(y, y, mask=attn_mask)
        h = h + y
        y = nn.LayerNorm(dtype=self.dtype)(h)
        y = nn.Dense(c.d_ff, dtype=self.dtype)(y)
        y = nn.gelu(y)
        y = nn.Dense(c.d_model, dtype=self.dtype)(y)
        return h + y


class ICLTransformer(nn.Module):
    """Forward over one (or a batch of) in-context tasks.

    Inputs:
      x_ctx (B, N, F), y_ctx (B, N) int32, ctx_mask (B, N) {0,1},
      x_qry (B, M, F)
    Returns:
      logits (B, M, max_classes), qry_emb (B, M, d_model),
      ctx_emb (B, N, d_model)
    """

    cfg: ICLConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_ctx, y_ctx, ctx_mask, x_qry, cat_mask=None,
                 deterministic=True):
        c = self.cfg
        b, n, f = x_ctx.shape
        m = x_qry.shape[1]

        proj = nn.Dense(c.d_model, dtype=self.dtype, name="feature_proj")
        label_emb = nn.Embed(c.max_classes, c.d_model, dtype=self.dtype,
                             name="label_embed")
        query_tok = self.param("query_token",
                               nn.initializers.normal(0.02), (c.d_model,))

        h_ctx = proj(x_ctx) + label_emb(y_ctx)
        h_qry = proj(x_qry) + query_tok.astype(self.dtype)
        if c.cat_input:
            # per-feature categorical indicator (B, F): two zero-init
            # linear views — the values restricted to categorical columns,
            # and the type pattern itself (row-independent)
            if cat_mask is None:
                cat_mask = jnp.zeros((b, f), self.dtype)
            cat_mask = cat_mask.astype(self.dtype)
            cat_proj = nn.Dense(c.d_model, dtype=self.dtype, name="cat_proj",
                                kernel_init=nn.initializers.zeros)
            cat_ind = nn.Dense(c.d_model, dtype=self.dtype, name="cat_ind",
                               use_bias=False,
                               kernel_init=nn.initializers.zeros)
            ind = cat_ind(cat_mask)[:, None, :]  # (B, 1, D)
            h_ctx = h_ctx + cat_proj(x_ctx * cat_mask[:, None, :]) + ind
            h_qry = h_qry + cat_proj(x_qry * cat_mask[:, None, :]) + ind
        h = jnp.concatenate([h_ctx, h_qry], axis=1)  # (B, N+M, D)

        # attention bias: everyone may attend to VALID context tokens and to
        # itself; queries are never keys for other tokens
        total = n + m
        key_is_ctx = jnp.concatenate(
            [ctx_mask.astype(bool), jnp.zeros((b, m), bool)], axis=1)
        allowed = jnp.broadcast_to(key_is_ctx[:, None, :], (b, total, total))
        eye = jnp.eye(total, dtype=bool)[None]
        allowed = (allowed | eye)[:, None]  # (B, 1, Q, K) boolean mask

        for li in range(c.n_layers):
            h = ICLBlock(c, dtype=self.dtype)(h, allowed, deterministic)
            if li == c.n_layers - 2:
                # penultimate-layer tap for multi-layer embeddings: flax
                # `sow` adds NO parameters (checkpoint-compatible) and is
                # only materialized when apply() passes
                # mutable=["intermediates"] — the classifier forward is
                # unchanged. Queries-only (rows n:) to bound the capture.
                self.sow("intermediates", "h_penult", h[:, n:])
        h = nn.LayerNorm(dtype=self.dtype)(h)

        logits = nn.Dense(c.max_classes, dtype=self.dtype, name="cls_head")(h)
        return (logits[:, n:], h[:, n:], h[:, :n])


# ----------------------------------------------------------------------
# Synthetic-task prior for meta-training
# ----------------------------------------------------------------------

def _rand_cut_labels(rng: np.random.Generator, score, c: int):
    """Bucket `score` at RANDOM cut quantiles (sorted uniforms in
    [0.05, 0.95]) instead of equal-frequency cuts — every bucketed task
    family then carries random class imbalance, which real clinical
    labels do (equal-frequency cuts would meta-train the network only on
    balanced contexts)."""
    u = np.sort(rng.uniform(0.05, 0.95, c - 1))
    return np.digitize(score, np.quantile(score, u))


#: default family mixture weights (cluster, correlated-latent,
#: pairwise-interaction, periodic, shallow-MLP); cumulative thresholds
#: 0.22/0.40/0.62/0.74 — shared by the host sampler and the device prior.
DEFAULT_FAMILY_MIX = (0.22, 0.18, 0.22, 0.12, 0.26)


def _mix_thresholds(mix):
    """Normalize 5 family weights to the 4 cumulative cut points used by
    the samplers' `kind` draw."""
    w = np.asarray(mix, np.float64)
    if w.shape != (5,) or (w < 0).any() or w.sum() <= 0:
        raise ValueError("mix must be 5 non-negative family weights")
    cum = np.cumsum(w / w.sum())
    return tuple(float(t) for t in cum[:4])


def sample_tasks(rng: np.random.Generator, batch: int, cfg: ICLConfig,
                 n_ctx: int, n_qry: int, var_ctx: bool = True,
                 mix=None):
    """Random-function prior: gaussian/mixed/correlated features ->
    random score (cluster, latent-linear, pairwise-interaction, periodic,
    or shallow MLP) -> quantile-bucketed labels (+ label noise).

    With ``var_ctx`` each task draws a random VALID context length in
    [16, n_ctx] (physical shape stays static; the tail is zeroed and masked
    out). Inference-time contexts range anywhere up to
    ``ICLConfig.max_context``, so the network must be meta-trained across
    context sizes — a fixed fully-valid n_ctx leaves every other context
    size (and masked-key attention itself) out of distribution.

    ``mix`` overrides the five family weights (``DEFAULT_FAMILY_MIX``) —
    used by biased adaptation phases of the meta-training curriculum."""
    F, C = cfg.max_features, cfg.max_classes
    t1, t2, t3, t4 = _mix_thresholds(DEFAULT_FAMILY_MIX if mix is None
                                     else mix)
    n = n_ctx + n_qry
    x = np.zeros((batch, n, F), np.float32)
    y = np.zeros((batch, n), np.int64)
    cat = np.zeros((batch, F), np.float32)  # per-task categorical columns
    for b in range(batch):
        f = int(rng.integers(3, max(4, F // 2) + 1))
        # class count skewed toward binary (half of clinical tasks are
        # 2-class diagnoses) but still covering the full alphabet so every
        # label embedding gets meta-trained
        c = 2 if (C > 2 and rng.random() < 0.5) else int(rng.integers(2, C + 1))
        kind = rng.random()
        if kind < t1:
            # cluster prior: class-conditional gaussians with random
            # separation (covers the "shifted means" regime of clinical
            # tables); a few columns quantize to integer codes — the
            # mixed categorical/numeric regime of real clinical tables
            sep = rng.uniform(0.5, 3.0)
            centers = rng.normal(size=(c, f)).astype(np.float32) * sep
            # class frequencies from a Dirichlet — clinical tables are
            # rarely balanced (e.g. 8% positives); a uniform label draw
            # would meta-train the network only on ~balanced contexts
            probs = rng.dirichlet(np.full(c, rng.uniform(0.4, 3.0)))
            probs = 0.9 * probs + 0.1 / c  # keep every class reachable
            lab = rng.choice(c, size=n, p=probs)
            xs = centers[lab] + rng.normal(size=(n, f)).astype(np.float32)
            n_cat = int(rng.integers(0, max(1, f // 3) + 1))
            for jcol in rng.choice(f, n_cat, replace=False):
                xs[:, jcol] = np.digitize(xs[:, jcol],
                                          [-0.5, 0.5]).astype(np.float32)
                cat[b, jcol] = 1.0
        elif kind < t2:
            # correlated-latent prior: observed features are linear mixes of
            # fewer latent factors plus small independent noise — the
            # near-duplicate-columns regime clinical tables hit constantly.
            # Half the tasks score on the LATENTS; the other half draw the
            # signal direction in WHITENED coordinates, so low-variance
            # residual directions (differences of highly correlated
            # features) are as likely to carry the label as the dominant
            # factors — without this the learner meta-learns to ignore
            # exactly those directions.
            k = int(rng.integers(1, max(2, f // 2) + 1))
            z = rng.normal(size=(n, k)).astype(np.float32)
            mix = rng.normal(size=(k, f)).astype(np.float32)
            eps = rng.uniform(0.02, 0.3)
            xs = z @ mix + eps * rng.normal(size=(n, f)).astype(np.float32)
            if rng.random() < 0.5:
                score = z @ rng.normal(size=k).astype(np.float32)
            else:
                cov = np.cov(xs, rowvar=False) + 1e-6 * np.eye(f)
                evals, evecs = np.linalg.eigh(cov)
                w = evecs @ (rng.normal(size=f) / np.sqrt(evals))
                score = (xs - xs.mean(0)) @ w.astype(np.float32)
            lab = _rand_cut_labels(rng, score, c)
        elif kind < t3:
            # pairwise-interaction prior: score dominated by products of
            # feature pairs (XOR-like boundaries that no linear readout of
            # single features can express). Half the tasks use SIGN
            # products — crisp quadrant/XOR boundaries with zero magnitude
            # cue, the regime where GradBoost beat the round-2 asset
            # 1.00 vs 0.77.
            xs = rng.normal(size=(n, f)).astype(np.float32)
            n_pairs = int(rng.integers(1, 4))
            hard = rng.random() < 0.5
            score = ((0.0 if hard else 0.2)
                     * xs @ rng.normal(size=f).astype(np.float32))
            for _ in range(n_pairs):
                i, j = rng.choice(f, 2, replace=False)
                term = xs[:, i] * xs[:, j]
                if hard:
                    term = np.sign(term)
                score = score + rng.normal() * term
            lab = _rand_cut_labels(rng, score, c)
        elif kind < t4:
            # periodic prior: sinusoidal functions of single features —
            # oscillating decision surfaces (and the smooth nonlinear
            # regression regime) that neither clusters nor one MLP layer
            # of tanh units cover well
            xs = rng.normal(size=(n, f)).astype(np.float32)
            n_waves = int(rng.integers(1, 3))
            score = 0.1 * xs @ rng.normal(size=f).astype(np.float32)
            for _ in range(n_waves):
                i = int(rng.integers(0, f))
                w = rng.uniform(1.0, 4.0)
                ph = rng.uniform(0, 2 * np.pi)
                score = score + rng.normal() * np.sin(w * xs[:, i] + ph)
            lab = _rand_cut_labels(rng, score, c)
        else:
            # function prior: random shallow MLP score, quantile-bucketed
            xs = rng.normal(size=(n, f)).astype(np.float32)
            n_cat = int(rng.integers(0, max(1, f // 3) + 1))
            for j in rng.choice(f, n_cat, replace=False):
                xs[:, j] = np.digitize(xs[:, j], [-0.5, 0.5]).astype(np.float32)
                cat[b, j] = 1.0
            h1 = np.tanh(xs @ rng.normal(size=(f, 8)).astype(np.float32)
                         + rng.normal(size=8).astype(np.float32))
            score = (h1 @ rng.normal(size=8).astype(np.float32)
                     + 0.3 * xs @ rng.normal(size=f).astype(np.float32))
            lab = _rand_cut_labels(rng, score, c)
        # label-noise RATE is itself drawn per task, mostly near zero — a
        # fixed 5% flip teaches the network that no context is ever fully
        # predictable and caps its confidence on clean separable tables
        flip_rate = (rng.uniform(0.0, 0.02) if rng.random() < 0.6
                     else rng.uniform(0.02, 0.12))
        flip = rng.random(lab.shape) < flip_rate
        lab = np.where(flip, rng.integers(0, c, n), lab)
        x[b, :, :f] = xs
        y[b] = lab
    ctx_mask = np.ones((batch, n_ctx), np.float32)
    if var_ctx and n_ctx > 16:
        for b in range(batch):
            n_valid = int(rng.integers(16, n_ctx + 1))
            ctx_mask[b, n_valid:] = 0.0
            x[b, n_valid:n_ctx] = 0.0
            y[b, n_valid:n_ctx] = 0
    return {
        "x_ctx": x[:, :n_ctx], "y_ctx": y[:, :n_ctx].astype(np.int32),
        "ctx_mask": ctx_mask,
        "x_qry": x[:, n_ctx:], "y_qry": y[:, n_ctx:].astype(np.int32),
        "cat_mask": cat,
    }


def _zscore_by_ctx(x_ctx, x_qry, ctx_mask):
    denom = jnp.maximum(ctx_mask.sum(1, keepdims=True), 1.0)[..., None]
    mean = (x_ctx * ctx_mask[..., None]).sum(1, keepdims=True) / denom
    var = (((x_ctx - mean) ** 2) * ctx_mask[..., None]).sum(1, keepdims=True) / denom
    std = jnp.sqrt(var + 1e-6)
    return (x_ctx - mean) / std * ctx_mask[..., None], (x_qry - mean) / std


def pretrain_icl(cfg: ICLConfig = ICLConfig(), steps: int = 3000,
                 batch: int = 32, n_ctx: int = 96, n_qry: int = 32,
                 lr: float = 3e-4, seed: int = 0, verbose: bool = False,
                 init_params=None, device_prior: bool = False,
                 chunk: int = 100, mix=None, aux_embed: float = 0.0,
                 aux_tau: float = 0.2, aux_qc: float = 0.0):
    """Meta-train the prior-fitted network on synthetic tasks; returns
    (params, cfg).

    ``init_params`` warm-starts from existing weights (fresh optimizer
    state) — used for phased curricula, e.g. bulk training at a cheap
    context size followed by a short long-context adaptation phase at
    ``max_context`` (attention cost grows quadratically with context, so
    training everything at the longest context wastes meta-training
    steps).

    ``device_prior`` samples tasks on-device (`icl_prior.sample_tasks_device`)
    and fuses ``chunk`` meta-steps into one `lax.scan` dispatch — zero
    per-step host traffic, which on the hosted-TPU tunnel is the difference
    between link-bound (~1 step/s) and compute-bound (hundreds/s)
    meta-training. The host path streams a fresh NumPy-sampled task per
    step (fine on a local CPU).

    ``mix`` overrides the prior's family weights (``DEFAULT_FAMILY_MIX``)
    for biased curriculum phases (e.g. a pairwise-interaction-heavy
    adaptation pass).

    ``aux_embed`` > 0 adds an embedding-aware auxiliary objective: a
    supervised-contrastive (InfoNCE) loss over the per-task QUERY hidden
    states — same-class queries attract, other-class queries repel, at
    temperature ``aux_tau``. The NLL alone only requires class information
    to survive the one linear cls_head readout; downstream users train
    NEW linear models on the embeddings across K-fold refits (reference
    tabel_test.py:166-185), which needs class identity to dominate the
    embedding geometry itself. Round-3 measured the gap this closes: ICL
    OoF embeddings scored exactly the raw-feature baseline (0.829) on the
    reference's clinical table while TabPFN-v2's scored 0.932.

    ``aux_qc`` > 0 adds a query->CONTEXT contrastive term: each query
    attracts the valid context hidden states of its own class and repels
    the rest (same temperature ``aux_tau``). The query-only term shapes
    the hidden block of 'rich' embeddings; the canonical prototype-cosine
    and kNN-evidence blocks (``get_embeddings``) are built from CONTEXT
    hidden states, which only the NLL shapes — this term optimizes the
    exact query-to-context geometry those blocks read at inference."""
    mix_t = None if mix is None else tuple(float(w) for w in mix)
    model = ICLTransformer(cfg)
    rng = np.random.default_rng(seed)
    t0 = sample_tasks(rng, batch, cfg, n_ctx, n_qry)
    params = init_params if init_params is not None else model.init(
        jax.random.PRNGKey(seed),
        jnp.asarray(t0["x_ctx"]), jnp.asarray(t0["y_ctx"]),
        jnp.asarray(t0["ctx_mask"]), jnp.asarray(t0["x_qry"]))
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(optax.cosine_decay_schedule(lr, steps)))
    opt_state = tx.init(params)

    def loss_fn(p, task):
        xc, xq = _zscore_by_ctx(task["x_ctx"], task["x_qry"],
                                task["ctx_mask"])
        logits, q_emb, c_emb = model.apply(p, xc, task["y_ctx"],
                                           task["ctx_mask"], xq,
                                           task.get("cat_mask"))
        logp = jax.nn.log_softmax(logits)
        nll = -jnp.take_along_axis(
            logp, task["y_qry"][..., None].astype(jnp.int32), axis=-1)
        loss = nll.mean()
        if aux_embed > 0.0:
            # supervised contrastive over queries within each task
            y = task["y_qry"].astype(jnp.int32)
            z = q_emb / jnp.maximum(
                jnp.linalg.norm(q_emb, axis=-1, keepdims=True), 1e-6)
            sim = jnp.einsum("bmd,bnd->bmn", z, z) / aux_tau
            m = sim.shape[1]
            eye = jnp.eye(m, dtype=bool)[None]
            sim = jnp.where(eye, -jnp.inf, sim)
            same = (y[:, :, None] == y[:, None, :]) & ~eye
            log_z = jax.nn.logsumexp(sim, axis=-1)  # (B, M)
            pos_lp = jnp.where(same, sim - log_z[..., None], 0.0).sum(-1)
            n_pos = same.sum(-1)
            has_pos = n_pos > 0
            con = -jnp.where(has_pos, pos_lp / jnp.maximum(n_pos, 1), 0.0)
            loss = loss + aux_embed * (con.sum()
                                       / jnp.maximum(has_pos.sum(), 1))
        if aux_qc > 0.0:
            # query->context contrastive: anchors are queries, keys are
            # VALID context states; positives share the query's label
            yq = task["y_qry"].astype(jnp.int32)  # (B, M)
            yc = task["y_ctx"].astype(jnp.int32)  # (B, N)
            valid = task["ctx_mask"] > 0  # (B, N)
            zq = q_emb / jnp.maximum(
                jnp.linalg.norm(q_emb, axis=-1, keepdims=True), 1e-6)
            zc = c_emb / jnp.maximum(
                jnp.linalg.norm(c_emb, axis=-1, keepdims=True), 1e-6)
            sim = jnp.einsum("bmd,bnd->bmn", zq, zc) / aux_tau
            sim = jnp.where(valid[:, None, :], sim, -jnp.inf)
            same = (yq[:, :, None] == yc[:, None, :]) & valid[:, None, :]
            log_z = jax.nn.logsumexp(sim, axis=-1)  # (B, M)
            pos_lp = jnp.where(same, sim - log_z[..., None], 0.0).sum(-1)
            n_pos = same.sum(-1)
            has_pos = n_pos > 0
            con = -jnp.where(has_pos, pos_lp / jnp.maximum(n_pos, 1), 0.0)
            loss = loss + aux_qc * (con.sum()
                                    / jnp.maximum(has_pos.sum(), 1))
        return loss

    if device_prior:
        from .icl_prior import sample_tasks_device

        from functools import partial

        @partial(jax.jit, static_argnames="length")
        def run_chunk(params, opt_state, key, length):
            def body(carry, _):
                params, opt_state, key = carry
                key, tk = jax.random.split(key)
                task = sample_tasks_device(tk, batch, cfg, n_ctx, n_qry,
                                           True, mix_t)
                loss, grads = jax.value_and_grad(loss_fn)(params, task)
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state,
                        key), loss

            (params, opt_state, key), losses = jax.lax.scan(
                body, (params, opt_state, key), None, length=length)
            return params, opt_state, key, losses.mean()

        key = jax.random.PRNGKey(seed)
        done = 0
        while done < steps:
            # final chunk sized to the remainder (one extra compile) so
            # --steps runs EXACTLY that many optimizer steps — an overshoot
            # would run at the exhausted cosine schedule's lr=0
            n = min(chunk, steps - done)
            params, opt_state, key, mloss = run_chunk(params, opt_state,
                                                      key, n)
            done += n
            if verbose:
                print(f"[icl pretrain/device] step {done}/{steps}"
                      f" loss {float(mloss):.4f}", flush=True)
        return params, cfg

    @jax.jit
    def step(params, opt_state, task):
        loss, grads = jax.value_and_grad(loss_fn)(params, task)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        task = {k: jnp.asarray(v) for k, v in
                sample_tasks(rng, batch, cfg, n_ctx, n_qry,
                             mix=mix_t).items()}
        params, opt_state, loss = step(params, opt_state, task)
        if verbose and (i + 1) % max(1, steps // 10) == 0:
            print(f"[icl pretrain] step {i + 1}/{steps} loss {float(loss):.4f}")
    return params, cfg


def default_asset_path() -> str:
    """Bundled CLASSIFIER asset location; override with MAD_ICL_ASSET to
    point every ICLClassifier in the process at a different meta-trained
    weight file (e.g. one produced by cli/pretrain_icl). The regressor's
    bar-distribution network has its own asset and its own override,
    MAD_ICL_REG_ASSET (icl_regression.py)."""
    import os

    env = os.environ.get("MAD_ICL_ASSET")
    if env:
        return env
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "assets", "icl_default.msgpack")


def validated_from_bytes(template, path: str):
    """flax deserialization with leaf-SHAPE validation + fp32 upcast,
    shared by the classifier and regression asset loaders. from_bytes
    validates tree STRUCTURE but not array shapes — a d_model/d_ff/
    max_features mismatch would load silently and only fail later with an
    opaque ScopeParamShapeError; compare leaves here so the caller's
    helpful config-mismatch message fires instead."""
    from flax import serialization

    with open(path, "rb") as f:
        loaded = serialization.from_bytes(template, f.read())
    mismatches = [
        f"{jax.tree_util.keystr(k)}: asset {np.shape(v)} != expected {np.shape(t)}"
        for (k, v), t in zip(jax.tree_util.tree_leaves_with_path(loaded),
                             jax.tree_util.tree_leaves(template))
        if np.shape(v) != np.shape(t)]
    if mismatches:
        raise ValueError("array shape mismatch: " + "; ".join(mismatches[:4]))
    # assets may be stored in reduced precision; compute expects fp32
    return jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), loaded)


def merge_compatible_params(template, path: str, verbose: bool = False):
    """Key-intersection warm start ACROSS architecture revisions: leaves
    present in both trees with matching shapes load from the file; new
    leaves (e.g. the zero-init cat_proj/cat_ind pathway added in round 4)
    keep their template values. The same merge semantics the reference
    uses for MedicalNet pretrain transfer (reference
    train_ResNet3D.py:74-81 key-intersection state-dict merge)."""
    from flax import serialization, traverse_util

    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    flat_t = traverse_util.flatten_dict(serialization.to_state_dict(template))
    flat_o = traverse_util.flatten_dict(raw)
    merged, hits = {}, 0
    for k, v in flat_t.items():
        if k in flat_o and np.shape(flat_o[k]) == np.shape(v):
            merged[k] = np.asarray(flat_o[k], np.float32)
            hits += 1
        else:
            merged[k] = v
    if verbose:
        print(f"[icl warm start] {hits}/{len(flat_t)} leaves matched "
              f"{path} ({len(flat_o)} stored)")
    return serialization.from_state_dict(
        template, traverse_util.unflatten_dict(merged))


def resolve_asset_params(load_file, env_var: str, bundled_path: str,
                         cfg_is_default: bool, cfg_desc: str):
    """Shared env-override / bundled-asset policy (one source of truth for
    both networks): an env override is loaded for ANY config and
    hard-fails on a dangling path or mismatch (a user-supplied asset is
    never silently ignored); the bundled asset applies only to the default
    config and degrades to None — self-pretraining — on any problem."""
    import os

    env = os.environ.get(env_var)
    if env:
        if not os.path.isfile(env):
            # a typo'd path must not be indistinguishable from "no override"
            # (the estimator would silently self-pretrain at lower quality)
            raise FileNotFoundError(
                f"{env_var}={env} does not exist; unset the variable to "
                "use the bundled asset or point it at a real weight file")
        try:
            return load_file(env)
        except Exception as e:
            raise ValueError(
                f"{env_var}={env} does not match {cfg_desc} "
                f"(was it trained with different --d-model/layers?): {e}"
            ) from e
    if not cfg_is_default or not os.path.isfile(bundled_path):
        return None
    try:
        return load_file(bundled_path)
    except ValueError as e:
        # a stale bundled asset (e.g. trained for an older default config)
        # degrades like a missing one — only explicit env overrides
        # hard-fail on mismatch
        import warnings

        warnings.warn(f"ignoring bundled ICL asset {bundled_path}: {e}")
        return None


def _load_params_file(cfg: ICLConfig, path: str):
    model = ICLTransformer(cfg)
    rng = np.random.default_rng(0)
    t = sample_tasks(rng, 1, cfg, 8, 4)
    template = model.init(jax.random.PRNGKey(0), jnp.asarray(t["x_ctx"]),
                          jnp.asarray(t["y_ctx"]), jnp.asarray(t["ctx_mask"]),
                          jnp.asarray(t["x_qry"]))
    return validated_from_bytes(template, path)


def load_default_params(cfg: ICLConfig):
    """Meta-trained weights for `cfg` under the `resolve_asset_params`
    policy; None when no asset applies (the estimator self-pretrains).
    (default_asset_path() consults MAD_ICL_ASSET too, but resolve's env
    branch fires first, so the bundled argument only ever reads the
    bundled location.)"""
    return resolve_asset_params(
        lambda p: _load_params_file(cfg, p), "MAD_ICL_ASSET",
        default_asset_path(), cfg == ICLConfig(), f"ICLConfig {cfg}")


class FeaturePreprocessMixin:
    """Train-median imputation + supervised width screen + feature padding
    + optional fitted transform (whiten/quantile/onehot/pairs), shared by
    ICLClassifier and ICLRegressor. Subclasses provide `_cfg`
    (with .max_features) and a `preprocess` attribute."""

    #: "auto" = screen tables wider than the meta-trained feature range
    #: (max_features // 2, the prior's sampling ceiling in sample_tasks)
    #: down to that width by supervised F-score; an int forces that width;
    #: 0/None disables (over-wide tables then raise in _pad_features).
    screen_features: Any = "auto"

    def _screen_cap(self) -> int:
        sf = getattr(self, "screen_features", "auto")
        if sf == "auto":
            return max(4, self._cfg.max_features // 2)
        return int(sf) if sf else 0

    def _fit_impute(self, X):
        """Column medians over FINITE train cells (TabPFN-style missing-
        value handling). The previous nan->0 fill injected fake in-range
        values into the context z-score statistics — on the reference's
        real clinical table (7.3% NaN, some columns ~95% NaN) that biased
        both the column scale and every downstream transform."""
        import warnings

        X = np.asarray(X, np.float32)
        finite = np.isfinite(X)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # all-NaN columns -> NaN median
            med = np.nanmedian(np.where(finite, X, np.nan), axis=0)
        self._impute_ = np.nan_to_num(med, nan=0.0, posinf=0.0,
                                      neginf=0.0).astype(np.float32)
        return np.where(finite, X, self._impute_[None])

    def _apply_impute(self, X):
        X = np.asarray(X, np.float32)
        med = getattr(self, "_impute_", None)
        if med is None:  # never fitted (pre-fit helper use): plain cleanup
            return np.nan_to_num(X, nan=0.0, posinf=0.0, neginf=0.0)
        if med.shape[0] != X.shape[1]:
            # a wrong-width X at predict time must fail like any sklearn
            # estimator, not degrade to zero-fill (with an active width
            # screen the stale _screen_idx_ would then select shifted
            # columns and produce silently wrong predictions)
            raise ValueError(
                f"X has {X.shape[1]} features, but this estimator was "
                f"fitted with {med.shape[0]} features")
        return np.where(np.isfinite(X), X, med[None])

    def _fit_screen(self, X, y):
        """Top-k supervised feature screen for tables wider than the
        meta-trained feature range: the prior samples at most
        max_features//2 real columns (sample_tasks), so e.g. the reference
        clinical table's 156 features sit outside the asset's training
        distribution AND dilute the row projection with noise columns.
        Falls back to variance ranking when the supervised score is
        undefined (single-class y, degenerate targets)."""
        import warnings

        cap = self._screen_cap()
        if not cap or X.shape[1] <= cap or y is None:
            self._screen_idx_ = None
            return X
        from sklearn.base import is_regressor
        from sklearn.feature_selection import f_classif, f_regression

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")  # constant columns
            try:
                fn = f_regression if is_regressor(self) else f_classif
                scores = np.nan_to_num(fn(X, np.asarray(y))[0], nan=0.0)
            except Exception:
                scores = X.std(0)
        self._screen_idx_ = np.sort(np.argsort(-scores)[:cap])
        return X[:, self._screen_idx_]

    def _pad_features(self, X):
        X = np.asarray(X, np.float32)
        X = np.nan_to_num(X, nan=0.0, posinf=0.0, neginf=0.0)
        F = self._cfg.max_features
        if X.shape[1] > F:
            raise ValueError(
                f"{X.shape[1]} features > max_features={F}; raise "
                f"{type(self._cfg).__name__}.max_features or enable the "
                f"width screen (screen_features='auto')")
        return np.pad(X, ((0, 0), (0, F - X.shape[1])))

    def _fit_preprocess(self, X, kind="__self__", y=None):
        """Fit imputation + width screen + the optional feature transform
        on the raw training matrix and return the transformed matrix
        (before padding). ``y`` drives the width screen and the supervised
        'pairs' interaction screen."""
        if kind == "__self__":
            kind = self.preprocess
        X = self._fit_impute(X)
        X = self._fit_screen(X, y)
        if kind is None:
            self._pre = None
            return X
        if kind == "whiten":
            mu = X.mean(0)
            cov = np.cov(X - mu, rowvar=False)
            cov = np.atleast_2d(cov) + 1e-6 * np.eye(X.shape[1])
            evals, evecs = np.linalg.eigh(cov)
            # clip tiny eigenvalues RELATIVE to the largest so pure-noise
            # directions are not blown up to unit scale
            evals = np.maximum(evals, 1e-4 * evals.max() + 1e-12)
            zca = (evecs / np.sqrt(evals)) @ evecs.T
            self._pre = ("whiten", mu.astype(np.float32),
                         zca.astype(np.float32))
            return (X - mu) @ self._pre[2]
        if kind == "quantile":
            from sklearn.preprocessing import QuantileTransformer

            qt = QuantileTransformer(
                n_quantiles=min(64, len(X)), output_distribution="normal",
                random_state=0).fit(X)
            self._pre = ("quantile", qt)
            return qt.transform(X).astype(np.float32)
        if kind == "onehot":
            # expand low-cardinality integer columns to indicators (how
            # TabPFN's preprocessing treats categoricals) — an integer
            # code's ordering is arbitrary, indicators let the network
            # read each category independently
            from .utils import infer_categorical_features

            cats = infer_categorical_features(X)
            values = [np.unique(X[:, j]) for j in cats]
            self._pre = ("onehot", cats, values)
            return self._onehot_expand(X, cats, values)
        if kind == "pairs":
            # screened quadratic interactions: candidate products (and
            # squares) of SCALE-only standardized features (no centering —
            # it would shift sign(x_i*x_j) boundaries), rank-correlated
            # against the label with Bonferroni-controlled selection, and
            # the few survivors appended RANK-GAUSSED (a raw gaussian
            # product is heavy-tailed; the context z-score would compress
            # its sign structure into a spike at 0). Multiplicative
            # interactions — the sign-product/XOR regime where a row-token
            # network must approximate multiplication inside its MLP —
            # become directly readable gaussian columns. Mirrors the
            # polynomial-interaction dimension of TabPFN's preprocessing
            # search (reference hpo/search_space.py:18-244). Appending the
            # FULL unscreened expansion was measured strictly worse than
            # identity (the one informative product drowns among f(f+1)/2
            # heavy-tailed noise columns).
            if y is None:
                raise ValueError("preprocess='pairs' needs y at fit time")
            sd = (X.std(0) + 1e-6).astype(np.float32)
            # each survivor appends TWO columns (rank-gauss value + sign)
            k = min(8, (self._cfg.max_features - X.shape[1]) // 2)
            sel_i, sel_j, refs = self._pairs_screen(X / sd, y, k)
            self._pre = ("pairs", sd, sel_i, sel_j, refs)
            return self._pairs_apply(X, sd, sel_i, sel_j, refs)
        raise ValueError(f"unknown preprocess={kind!r}")

    @staticmethod
    def _pairs_screen(Z, y, k):
        """Select up to ``k`` product columns Z_i*Z_j (i<=j) whose rank
        correlation with the target clears a Bonferroni-corrected noise
        floor; returns (i_idx, j_idx, sorted-train-product refs)."""
        from scipy.stats import norm

        n, f = Z.shape
        if k <= 0 or f < 2 or n < 16:
            return np.empty(0, np.int64), np.empty(0, np.int64), []
        iu, ju = np.triu_indices(f)
        prods = Z[:, iu] * Z[:, ju]
        # rank-transform candidates: the correlation statistic must not be
        # dominated by a product's heavy tails
        r = np.argsort(np.argsort(prods, axis=0), axis=0) / (n - 1) - 0.5
        y = np.asarray(y)
        if y.dtype.kind == "f" and len(np.unique(y)) > max(16, n // 8):
            targets = [(np.argsort(np.argsort(y)) / (n - 1) - 0.5)]
        else:  # class labels: one-vs-rest indicators
            targets = [(y == c).astype(np.float64) for c in np.unique(y)]
        corr = np.zeros(prods.shape[1])
        for t in targets:
            t = t - t.mean()
            denom = np.sqrt((r ** 2).sum(0) * (t ** 2).sum()) + 1e-12
            corr = np.maximum(corr, np.abs(r.T @ t) / denom)
        # FWER <= 1% over all candidates: a wide table proposes thousands
        # of products and an uncorrected floor would admit ~0.1% of them
        floor = norm.ppf(1 - 0.01 / len(corr)) / np.sqrt(n)
        sel = np.argsort(-corr)[:k]
        sel = sel[corr[sel] > floor]
        refs = [np.sort(prods[:, j]) for j in sel]
        return iu[sel], ju[sel], refs

    @staticmethod
    def _pairs_apply(X, sd, sel_i, sel_j, refs):
        """Append, per surviving product, its rank-gauss column AND its raw
        sign (±1/0). The sign column matters for the crisp sign-product
        regime (the meta-prior's 'hard' XOR tasks score on sign(x_i*x_j)
        with zero magnitude cue): the rank-gauss column still mixes
        magnitude into the ordering, while the sign column is exactly the
        quadrant indicator — measured 0.978 → 1.000 on the XOR benchmark
        family. For smooth product relationships it is a coarse binary
        column the network can ignore."""
        from scipy.stats import norm

        if len(refs) == 0:
            return X
        Z = X / sd
        cols = [X]
        for i, j, ref in zip(sel_i, sel_j, refs):
            prod = Z[:, i] * Z[:, j]
            pos = np.searchsorted(ref, prod, side="left") + 0.5
            cols.append(norm.ppf(np.clip(pos / (len(ref) + 1), 1e-4,
                                         1 - 1e-4)).astype(np.float32)[:, None])
            if i != j:  # sign(z^2) is constant 1 — dead column for squares
                cols.append(np.sign(prod).astype(np.float32)[:, None])
        return np.concatenate(cols, axis=1)

    @staticmethod
    def _onehot_expand(X, cats, values):
        keep = [j for j in range(X.shape[1]) if j not in cats]
        cols = [X[:, keep]] if keep else []
        for j, vals in zip(cats, values):
            cols.append((X[:, j:j + 1] == vals[None, :]).astype(np.float32))
        return np.concatenate(cols, axis=1) if cols else X

    def _apply_preprocess(self, X):
        X = self._apply_impute(X)
        idx = getattr(self, "_screen_idx_", None)
        if idx is not None:
            X = X[:, idx]
        pre = getattr(self, "_pre", None)
        if pre is None:
            return X
        if pre[0] == "whiten":
            return (X - pre[1]) @ pre[2]
        if pre[0] == "onehot":
            return self._onehot_expand(X, pre[1], pre[2])
        if pre[0] == "pairs":
            return self._pairs_apply(X, pre[1], pre[2], pre[3], pre[4])
        return pre[1].transform(X).astype(np.float32)

    @staticmethod
    def context_bucket(n_rows: int, max_context: int) -> int:
        """Smallest power-of-two bucket (>= 64, capped at max_context) that
        holds the context — a 50-row fit runs 64-token attention instead of
        max_context, at one jit compile per bucket."""
        bucket = 64
        while bucket < n_rows:
            bucket *= 2
        return min(bucket, max_context)


class ICLClassifier(FeaturePreprocessMixin, ClassifierMixin, BaseEstimator):
    """sklearn estimator over the prior-fitted network.

    Implements the interface surface the reference uses from
    TabPFNClassifier: fit / predict / predict_proba / get_embeddings
    (get_embeddings returns (n_estimators=1, n, d) like TabPFN v2 so the
    embedding harness's `[0]` indexing works — reference tabel_test.py:70).
    sklearn get_params/set_params/clone work, so the ensemble/HPO/RF-hybrid
    wrappers compose with it. `softmax_temperature`, `context_size` and
    `preprocess` are the inference-time knobs the HPO searches — mirroring
    TabPFN's preprocessing-transform search dimension (reference
    hpo/search_space.py:18-244). `preprocess` options:

    - 'auto' (default): pick among the options below with a small internal
      stratified validation split at fit() time — plain ICL matches the
      Auto/Tuned wrappers on e.g. correlated tables without needing them,
    - None: context z-scoring only (built into the forward),
    - 'whiten': ZCA whitening fit on the training set — equalizes variance
      across ALL directions, exposing signal hidden in low-variance
      residuals of near-duplicate features (e.g. a difference of two 99%-
      correlated clinical measurements),
    - 'quantile': rank-gauss per-feature transform (robust to heavy tails
      and monotone distortions),
    - 'pairs': screened quadratic interactions — rank-correlation-selected
      products/squares of scaled features appended as rank-gauss + sign
      columns, making multiplicative interactions (XOR/sign-product
      boundaries) directly readable,
    - 'onehot': indicator expansion of low-cardinality integer columns;
      under 'auto' it is the BASELINE whenever such columns are detected
      (the reference natively encodes categoricals unconditionally,
      tabpfn_extensions/utils.py:330-380) and other kinds must beat it
      by the selection margin.

    The resolved choice lands in `preprocess_` after fit.

    `n_estimators` (default 8; the reference TabPFNClassifier defaults
    to 4 — reference utils.py:94 — and 8 measurably helps, e.g.
    mixed-type +0.8 points, benchmarks/ICL_QUALITY.md) averages
    predict_proba over that many dataset
    VIEWS: view 0 is the identity; each further view permutes the feature
    columns and the class→label-embedding assignment. The network is not
    exactly permutation-equivariant (feature_proj assigns each column its
    own weight row; label_embed each class its own vector), so the views
    are genuinely diverse predictors of the same task and their average
    cancels position-specific noise — the same variance-reduction trick
    TabPFN v2 ships by default. All views run as ONE batched forward
    (leading dim V), so the cost is one compile and V× FLOPs, not V
    dispatches.

    Meta-trained weights are shared process-wide per (cfg, seed,
    pretrain_steps) so clones don't re-pretrain.
    """

    _param_cache: dict = {}

    def __init__(self, params=None, cfg: ICLConfig | None = None,
                 pretrain_steps: int = 300, seed: int = 0,
                 softmax_temperature: float = 1.0,
                 context_size: int | None = None,
                 preprocess: str | None = "auto",
                 n_estimators: int = 8,
                 screen_features="auto",
                 embedding_kind: str = "rich"):
        self.params = params
        self.cfg = cfg
        self.pretrain_steps = pretrain_steps
        self.seed = seed
        self.softmax_temperature = softmax_temperature
        self.context_size = context_size
        self.preprocess = preprocess
        self.n_estimators = n_estimators
        self.screen_features = screen_features
        self.embedding_kind = embedding_kind

    @property
    def _cfg(self) -> ICLConfig:
        return self.cfg or ICLConfig()

    @property
    def model(self):
        return ICLTransformer(self._cfg)

    def _ensure_params(self):
        import os

        if self.params is not None:
            return self.params
        # asset (path, mtime) participates in the key so MAD_ICL_ASSET
        # changes — AND in-place overwrites of the same file, e.g. after
        # cli/pretrain_icl — aren't masked by an earlier cached load
        asset = default_asset_path()
        try:
            stamp = os.path.getmtime(asset)
        except OSError:
            stamp = None
        key = (self._cfg, self.seed, self.pretrain_steps, asset, stamp)
        if key not in ICLClassifier._param_cache:
            bundled = load_default_params(self._cfg)
            if bundled is not None:
                ICLClassifier._param_cache[key] = bundled
            else:
                ICLClassifier._param_cache[key], _ = pretrain_icl(
                    self._cfg, steps=self.pretrain_steps, seed=self.seed)
        return ICLClassifier._param_cache[key]

    def _select_preprocess(self, X, y):
        """Pick the feature transform with small internal stratified
        validation splits (round-2 verdict weak #3: whiten/quantile existed
        but nothing selected them without the Auto/Tuned wrappers). Ties
        resolve to the earlier candidate, so None wins when transforms
        don't help.

        Adoption bars:

        - with categorical columns detected, 'onehot' IS the baseline
          (not a candidate): native categorical encoding is the
          reference's unconditional behavior
          (tabpfn_extensions/utils.py:330-380 infer_categorical_features
          feeds the model's categorical pathway, never holdout-gated),
          and the single-holdout gate measurably mis-fires — on the
          mixed-type family one seed's holdout prefers identity while
          onehot scores +2.5 points on test (benchmarks/ICL_QUALITY.md).
          Every other kind must now beat onehot by the margin;
        - rotating/distorting transforms (whiten/quantile/pairs) must
          clear the baseline by a REAL margin (~2 holdout samples):
          holdout noise otherwise flips axis-aligned tasks into 'whiten',
          which rotates their structure away. (A probe that averaged TWO
          holdout splits instead made things worse — the extra split let
          'quantile' clear its margin by luck.)"""
        from sklearn.model_selection import train_test_split

        from .utils import infer_categorical_features

        base_kind = "onehot" if infer_categorical_features(X) else None
        y = np.asarray(y)
        if len(X) < 24:
            return base_kind  # too few rows for a meaningful holdout
        idx = np.arange(len(X))
        try:
            tr, vl = train_test_split(idx, test_size=0.25,
                                      random_state=self.seed, stratify=y)
        except ValueError:  # a class with < 2 members
            tr, vl = train_test_split(idx, test_size=0.25,
                                      random_state=self.seed)
        kinds = [base_kind, None, "whiten", "quantile"]
        kinds = list(dict.fromkeys(kinds))  # drop the duplicate None case
        if X.shape[1] >= 2 and X.shape[1] + 2 <= self._cfg.max_features:
            kinds.append("pairs")  # room for >=1 screened interaction (2 cols)
        scores = {}
        for kind in kinds:
            sub = ICLClassifier(
                params=self.params, cfg=self.cfg,
                pretrain_steps=self.pretrain_steps, seed=self.seed,
                softmax_temperature=self.softmax_temperature,
                context_size=self.context_size, preprocess=kind,
                n_estimators=self.n_estimators,
                screen_features=self.screen_features)
            try:
                sub.fit(X[tr], y[tr])
                scores[kind] = float((sub.predict(X[vl]) == y[vl]).mean())
            except Exception:
                continue
        if not scores:
            return base_kind
        margin = max(0.02, 2.0 / max(len(vl), 1))
        base = scores.get(base_kind, -1.0)
        best_kind, best_acc = base_kind, base
        for kind in kinds:
            if kind == base_kind:
                continue
            if scores.get(kind, -1.0) > max(base + margin, best_acc):
                best_kind, best_acc = kind, scores[kind]
        return best_kind

    def fit(self, X, y):
        # NaN/inf cells survive to _fit_preprocess, which imputes them
        # with train-column medians (nan->0 here would hide them from it)
        X = np.asarray(X, np.float32)
        y = np.asarray(y)
        kind = self.preprocess
        if kind == "auto":
            kind = self._select_preprocess(X, y)
        self.preprocess_ = kind
        Xp = self._fit_preprocess(X, kind, y=y)
        f_real = Xp.shape[1]  # width before padding: views permute only this
        X = self._pad_features(Xp)
        self.classes_, y_idx = np.unique(y, return_inverse=True)
        if len(self.classes_) > self._cfg.max_classes:
            raise ValueError(
                f"{len(self.classes_)} classes > max_classes={self._cfg.max_classes}"
                " — wrap with ManyClassClassifier")
        n_max = self._cfg.max_context
        if self.context_size is not None:
            n_max = min(n_max, int(self.context_size))
        if len(X) > n_max:
            # Class-stratified context subsampling: allocate slots
            # proportionally to class frequency but guarantee every class at
            # least one slot — a uniform draw on an imbalanced clinical
            # table (e.g. 95/5) can drop the minority class from the
            # context entirely, making it unpredictable.
            rng = np.random.default_rng(self.seed)
            n_cls = len(self.classes_)
            counts = np.bincount(y_idx, minlength=n_cls)
            quota = np.maximum(1, np.floor(counts / len(X) * n_max)).astype(int)
            quota = np.minimum(quota, counts)
            # distribute any remaining slots to the largest classes
            while quota.sum() < n_max:
                room = counts - quota
                if room.max() <= 0:
                    break
                quota[np.argmax(room)] += 1
            # the per-class floor of 1 can push the total ABOVE n_max on
            # heavily imbalanced many-class data (e.g. counts [2046,1,1],
            # n_max 512 -> [511,1,1]); trim the excess from the largest
            # quotas so the context never exceeds the configured size
            while quota.sum() > n_max and quota.max() > 1:
                quota[np.argmax(quota)] -= 1
            sel = np.concatenate([
                rng.choice(np.where(y_idx == c)[0], quota[c], replace=False)
                for c in range(n_cls) if quota[c] > 0])
            rng.shuffle(sel)
            # only reachable when n_cls itself exceeds n_max (every class
            # already at its floor of one slot): keep a uniform n_max subset
            sel = sel[:n_max]
            X, y_idx = X[sel], y_idx[sel]
        pad = self.context_bucket(len(X), self._cfg.max_context) - len(X)
        self._fitted = {
            "x_ctx": np.pad(X, ((0, pad), (0, 0)))[None],
            "y_ctx": np.pad(y_idx, (0, pad)).astype(np.int32)[None],
            "ctx_mask": np.pad(np.ones(len(X), np.float32), (0, pad))[None],
        }
        # Ensemble views (identity first): feature-column permutations over
        # the REAL width (pad columns stay in place) + class→embedding-row
        # permutations within the task's alphabet. Drawn from a stream
        # distinct from the context subsampler's so context_size and
        # n_estimators vary independently under one seed.
        k = len(self.classes_)
        V = max(1, int(self.n_estimators))
        rng = np.random.default_rng((self.seed, 101))
        fp, cp = [np.arange(self._cfg.max_features)], [np.arange(k)]
        for _ in range(V - 1):
            p = np.arange(self._cfg.max_features)
            p[:f_real] = rng.permutation(f_real)
            fp.append(p)
            cp.append(rng.permutation(k))
        self._views = (np.stack(fp), np.stack(cp))
        # per-feature categorical indicator for the native cat pathway
        # (reference utils.py:330-380 infer_categorical_features feeding
        # the model); computed on the PREPROCESSED matrix so e.g. onehot
        # indicators are flagged and rank-gauss'd columns are not
        cat_vec = np.zeros(self._cfg.max_features, np.float32)
        if self._cfg.cat_input and f_real:
            from .utils import infer_categorical_features

            for j in infer_categorical_features(Xp):
                cat_vec[j] = 1.0
        # the permuted CONTEXT views are fit-time constants: build and
        # upload them once here, so predict calls only permute the queries
        x_ctx = self._fitted["x_ctx"][0]
        y_ctx = self._fitted["y_ctx"][0]
        mask = self._fitted["ctx_mask"][0]
        self._views_dev = (
            jnp.asarray(np.stack([x_ctx[:, p] for p in fp])),
            jnp.asarray(np.stack([c[y_ctx] for c in cp]).astype(np.int32)),
            jnp.asarray(np.ascontiguousarray(
                np.broadcast_to(mask, (V, mask.shape[0])))),
            jnp.asarray(np.stack([cat_vec[p] for p in fp])))
        return self

    # one compiled forward per config, shared across instances/clones
    _fwd_cache: dict = {}

    @property
    def _forward(self):
        cfg = self._cfg
        if cfg not in ICLClassifier._fwd_cache:
            model = ICLTransformer(cfg)

            @jax.jit
            def fwd(params, x_ctx, y_ctx, ctx_mask, x_qry, cat):
                xc, xq = _zscore_by_ctx(x_ctx, x_qry, ctx_mask)
                return model.apply(params, xc, y_ctx, ctx_mask, xq, cat)

            ICLClassifier._fwd_cache[cfg] = fwd
        return ICLClassifier._fwd_cache[cfg]

    # separate compile for the multi-layer-tap variant: it collects the
    # sown penultimate hidden states ("intermediates"), which the
    # classification forward never materializes
    _fwd_tap_cache: dict = {}

    @property
    def _forward_tapped(self):
        cfg = self._cfg
        if cfg not in ICLClassifier._fwd_tap_cache:
            model = ICLTransformer(cfg)

            @jax.jit
            def fwd(params, x_ctx, y_ctx, ctx_mask, x_qry, cat):
                xc, xq = _zscore_by_ctx(x_ctx, x_qry, ctx_mask)
                (logits, q_emb, ctx_emb), inter = model.apply(
                    params, xc, y_ctx, ctx_mask, xq, cat,
                    mutable=["intermediates"])
                h_pen = inter["intermediates"]["h_penult"][0]
                return logits, q_emb, ctx_emb, h_pen

            ICLClassifier._fwd_tap_cache[cfg] = fwd
        return ICLClassifier._fwd_tap_cache[cfg]

    def _run(self, X, want_ctx: bool = False, want_tap: bool = False):
        """One batched forward over all ensemble views.

        Returns (logits (V, M, k) with class columns un-permuted back to
        canonical `classes_` order, per-view query embeddings (V, M, d)[,
        identity-view context embeddings (N, d) when ``want_ctx``][,
        per-view penultimate-layer query states (V, M, d) when
        ``want_tap``])."""
        if getattr(self, "_fitted", None) is None:
            raise RuntimeError("fit() first")
        params = self._ensure_params()
        fp, cp = self._views
        V = len(fp)
        Xq = self._pad_features(self._apply_preprocess(X))
        # context views were built + uploaded once at fit time (cp maps
        # canonical class index -> label-embedding row; padded context rows
        # map through cp too but their keys are masked out); only the
        # query views are per-call work
        x_ctx_v, y_ctx_v, mask_v, cat_v = self._views_dev
        xq_dev = jnp.asarray(np.stack([Xq[:, p] for p in fp]))
        if want_tap:
            logits, q_emb, ctx_emb, h_pen = self._forward_tapped(
                params, x_ctx_v, y_ctx_v, mask_v, xq_dev, cat_v)
        else:
            logits, q_emb, ctx_emb = self._forward(
                params, x_ctx_v, y_ctx_v, mask_v, xq_dev, cat_v)
        logits = np.asarray(logits)
        canon = np.stack([logits[v][:, cp[v]] for v in range(V)])
        out = [canon, np.asarray(q_emb)]
        if want_ctx:
            # identity-view only: views permute class/feature assignments,
            # so only view 0's context rows align with canonical labels
            out.append(np.asarray(ctx_emb[0]))
        if want_tap:
            out.append(np.asarray(h_pen))
        return tuple(out)

    def predict_proba(self, X):
        logits, _ = self._run(X)  # (V, M, k), already canonical order
        logits = logits / max(float(self.softmax_temperature), 1e-6)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        return (e / e.sum(-1, keepdims=True)).mean(0)

    def predict(self, X):
        return self.classes_[np.argmax(self.predict_proba(X), axis=1)]

    def _class_columns(self, values):
        """Scatter per-class columns (M, k) into a canonical (M,
        max_classes) block. Columns are addressed by the class LABEL when
        every label is a small non-negative integer — so K-fold OoF refits
        whose folds see different class subsets still write each class to
        the SAME column — and by `classes_` position otherwise."""
        M, k = values.shape
        C = self._cfg.max_classes
        out = np.zeros((M, C), values.dtype)
        cls = self.classes_
        try:
            idx = np.asarray(cls, np.int64)
            ok = (np.asarray(cls, np.float64) == idx).all() and \
                (idx >= 0).all() and (idx < C).all()
        except (ValueError, TypeError):
            ok = False
        cols = idx if ok else np.arange(k)
        out[:, cols] = values
        return out

    def get_embeddings(self, X, data_source: str = "test"):
        """(1, n, d) query representations — TabPFN v2 get_embeddings
        shape contract (reference tabel_test.py:70 indexes [0]).

        `embedding_kind` controls the representation:

        - 'rich' (default): view-averaged final hidden state (d_model)
          ++ canonical view-mean class logits (max_classes)
          ++ cosine similarity of the query state to per-class context
          prototypes (max_classes). The class-logit and prototype blocks
          are CANONICAL coordinates — identical meaning across the K-fold
          refits of the OoF harness — whereas raw hidden states drift with
          each refit's preprocessing/screen choices; a downstream linear
          model (reference tabel_test.py:166-185 trains an SVM across
          folds) needs those stable columns.
        - 'compact': the canonical blocks only (4·max_classes dims) — the
          fold-stable evidence without the hidden state. This was the
          ensemble-embedder default before the contrastive embedder
          asset: with a plain-NLL asset the hidden block's 256 drifting
          dims diluted the downstream SVM (round-4 measurement, 0.863
          compact vs 0.829 hidden-diluted); with the round-5 embedder
          asset the hidden block CARRIES the SVM and 'rich' is the
          default (benchmarks/ADNI_TABULAR.md).
        - 'rich2': 'rich' plus the view-averaged PENULTIMATE-layer query
          state (multi-layer tap via the sown intermediate) — 2·d_model
          + canonical blocks. Measured on the reference's clinical table
          it DILUTES (0.880 vs rich 0.906, CPU eval): the contrastive
          objective shapes only the final layer, and the penultimate
          state's extra d_model drifting dims cost more than their
          feature structure adds. Kept as an option for probes.
        - 'hidden': the identity view's final hidden state only (the
          pre-round-4 behavior).

        Both rich and compact carry a kNN-evidence block alongside the
        prototype cosines: per-class max and mean-top-3 cosine similarity
        of the query hidden state to the CONTEXT hidden states — bounded,
        canonical-by-class columns capturing LOCAL neighborhood structure
        that a single per-class prototype averages away (e.g. multi-modal
        classes). Like the other canonical blocks, identical meaning
        across K-fold OoF refits.
        """
        kind = getattr(self, "embedding_kind", "rich")
        if kind == "hidden":
            _, emb = self._run(X)
            return emb[:1]
        if kind not in ("rich", "rich2", "compact"):
            raise ValueError(f"unknown embedding_kind={kind!r}")
        if kind == "rich2":
            canon, emb, ctx, h_pen = self._run(X, want_ctx=True,
                                               want_tap=True)
        else:
            canon, emb, ctx = self._run(X, want_ctx=True)
        k = len(self.classes_)
        logit_mean = self._class_columns(canon.mean(0)[:, :k])
        # per-class context prototypes from the identity view
        y_ctx = self._fitted["y_ctx"][0]
        mask = self._fitted["ctx_mask"][0]
        protos = np.zeros((k, ctx.shape[1]), np.float32)
        for c in range(k):
            w = mask * (y_ctx == c)
            protos[c] = (ctx * w[:, None]).sum(0) / max(w.sum(), 1.0)
        q0 = emb[0]  # identity view, same geometry as the prototypes
        qn = q0 / np.maximum(np.linalg.norm(q0, axis=1, keepdims=True), 1e-6)
        pn = protos / np.maximum(
            np.linalg.norm(protos, axis=1, keepdims=True), 1e-6)
        cos = self._class_columns(qn @ pn.T)
        # kNN evidence: per-class top-1 / mean-top-3 query->context cosine
        ctx_n = ctx / np.maximum(
            np.linalg.norm(ctx, axis=1, keepdims=True), 1e-6)
        sims = qn @ ctx_n.T  # (M, N)
        top1 = np.zeros((len(q0), k), np.float32)
        top3 = np.zeros((len(q0), k), np.float32)
        for c in range(k):
            cols = (mask > 0) & (y_ctx == c)
            if not cols.any():
                continue
            sc = np.sort(sims[:, cols], axis=1)[:, ::-1]
            top1[:, c] = sc[:, 0]
            top3[:, c] = sc[:, :min(3, sc.shape[1])].mean(1)
        knn = np.concatenate([self._class_columns(top1),
                              self._class_columns(top3)], axis=1)
        blocks = [logit_mean, cos, knn]
        if kind == "rich":
            blocks = [emb.mean(0)] + blocks
        elif kind == "rich2":
            # multi-layer tap: final + penultimate hidden states (both
            # view-averaged). The contrastive aux objective shapes only
            # the FINAL layer directly; the penultimate layer keeps
            # feature structure the class-clustering pressure compresses
            # away, which a downstream linear probe can use.
            blocks = [emb.mean(0), h_pen.mean(0)] + blocks
        return np.concatenate(blocks, axis=1)[None]
