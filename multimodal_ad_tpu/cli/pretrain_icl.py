"""Meta-train the in-context tabular learner on the synthetic prior and
save the weights (the bundled `assets/icl_default.msgpack` was produced by
this CLI).

Usage:
    python -m multimodal_ad_tpu.cli.pretrain_icl --steps 4500 --n-ctx 256 \
        --out multimodal_ad_tpu/assets/icl_default.msgpack
    # long-context adaptation phase (warm start from the phase-1 weights):
    python -m multimodal_ad_tpu.cli.pretrain_icl --steps 1200 --n-ctx 512 \
        --lr 1e-4 --resume-from multimodal_ad_tpu/assets/icl_default.msgpack \
        --out multimodal_ad_tpu/assets/icl_default.msgpack

Tasks draw variable valid context lengths (see `sample_tasks`), so one run
already covers context sizes up to --n-ctx; the second phase extends
coverage to `max_context` cheaply (attention cost is quadratic in context,
so bulk training at the longest context would waste steps).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--n-ctx", type=int, default=128)
    p.add_argument("--n-qry", type=int, default=32)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--d-model", type=int, default=None,
                   help="override ICLConfig.d_model (default config if unset)")
    p.add_argument("--resume-from", default=None,
                   help="warm-start weights (msgpack from a previous phase)")
    p.add_argument("--platform", default="cpu",
                   help="jax platform (default cpu: meta-training streams a "
                        "fresh host-sampled task every step, so a remote "
                        "accelerator link becomes the bottleneck — unless "
                        "--device-prior)")
    p.add_argument("--device-prior", action="store_true",
                   help="sample tasks on-device (icl_prior) and fuse "
                        "--chunk steps per dispatch: zero per-step host "
                        "traffic, the TPU-speed path (use --platform '')")
    p.add_argument("--chunk", type=int, default=100,
                   help="meta-steps fused per dispatch with --device-prior")
    p.add_argument("--regression", action="store_true",
                   help="meta-train the bar-distribution REGRESSION network "
                        "(icl_regression.py) instead of the classifier; "
                        "task sampling is always on-device in this mode")
    p.add_argument("--mix", default=None,
                   help="comma-separated 5 family weights (cluster,"
                        "correlated,pairwise,periodic,mlp) overriding the "
                        "prior's default mixture — for biased adaptation "
                        "phases (classifier only)")
    p.add_argument("--aux-embed", type=float, default=0.0,
                   help="weight of the supervised-contrastive auxiliary "
                        "loss on query embeddings (classifier only); shapes "
                        "the hidden states for downstream linear probes — "
                        "see pretrain_icl docstring")
    p.add_argument("--aux-tau", type=float, default=0.2,
                   help="temperature of the contrastive auxiliary loss")
    p.add_argument("--aux-qc", type=float, default=0.0,
                   help="weight of the query->context contrastive auxiliary "
                        "loss (classifier only): shapes the context-state "
                        "geometry the prototype-cosine / kNN embedding "
                        "blocks read — see pretrain_icl docstring")
    p.add_argument("--cat-input", action="store_true",
                   help="train with the native categorical pathway "
                        "(ICLConfig.cat_input=True): the prior's cat_mask "
                        "feeds zero-init cat projections (classifier only)")
    p.add_argument("--save-dtype", default="float32",
                   choices=["float32", "float16"],
                   help="weight dtype in the saved msgpack (float16 halves "
                        "the asset size; loaders upcast to float32)")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from flax import serialization

    if args.regression:
        import jax

        from ..tabular.icl_regression import (RegICLConfig,
                                              RegICLTransformer,
                                              pretrain_icl_regression,
                                              sample_template_task)

        cfg = (RegICLConfig() if args.d_model is None
               else RegICLConfig(d_model=args.d_model))
        init_params = None
        if args.resume_from:
            model = RegICLTransformer(cfg)
            t = sample_template_task(cfg)
            template = model.init(jax.random.PRNGKey(0), t["x_ctx"],
                                  t["y_ctx"], t["ctx_mask"], t["x_qry"])
            with open(args.resume_from, "rb") as f:
                init_params = serialization.from_bytes(template, f.read())
            init_params = jax.tree_util.tree_map(
                lambda a: a.astype("float32"), init_params)
            print(f"warm start from {args.resume_from}")
        params, _ = pretrain_icl_regression(
            cfg, steps=args.steps, batch=args.batch, n_ctx=args.n_ctx,
            n_qry=args.n_qry, lr=args.lr, seed=args.seed, verbose=True,
            init_params=init_params, chunk=args.chunk)
    else:
        from ..tabular.icl import ICLConfig, pretrain_icl

        kw = {} if args.d_model is None else {"d_model": args.d_model}
        if args.cat_input:
            kw["cat_input"] = True
        cfg = ICLConfig(**kw)
        init_params = None
        if args.resume_from:
            import jax
            import jax.numpy as jnp
            import numpy as np

            from ..tabular.icl import (ICLTransformer,
                                       merge_compatible_params, sample_tasks)

            model = ICLTransformer(cfg)
            t = sample_tasks(np.random.default_rng(0), 1, cfg, 8, 4)
            template = model.init(
                jax.random.PRNGKey(0), jnp.asarray(t["x_ctx"]),
                jnp.asarray(t["y_ctx"]), jnp.asarray(t["ctx_mask"]),
                jnp.asarray(t["x_qry"]))
            # key-intersection merge: tolerates architecture revisions
            # (e.g. warm-starting a cat_input=True run from an older asset)
            init_params = merge_compatible_params(template, args.resume_from,
                                                  verbose=True)
            init_params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, "float32"), init_params)
            print(f"warm start from {args.resume_from}")

        mix = (None if args.mix is None
               else tuple(float(w) for w in args.mix.split(",")))
        params, _ = pretrain_icl(cfg, steps=args.steps, batch=args.batch,
                                 n_ctx=args.n_ctx, n_qry=args.n_qry,
                                 lr=args.lr, seed=args.seed, verbose=True,
                                 init_params=init_params,
                                 device_prior=args.device_prior,
                                 chunk=args.chunk, mix=mix,
                                 aux_embed=args.aux_embed,
                                 aux_tau=args.aux_tau, aux_qc=args.aux_qc)
    if args.save_dtype == "float16":
        import jax
        import numpy as np

        params = jax.tree_util.tree_map(
            lambda a: np.asarray(a, np.float16), params)
    blob = serialization.to_bytes(params)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"saved {len(blob) / 1e6:.2f} MB -> {args.out}")


if __name__ == "__main__":
    main()
