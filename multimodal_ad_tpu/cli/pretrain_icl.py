"""Meta-train the in-context tabular learner on the synthetic prior and
save the weights (the bundled `assets/icl_default.msgpack` was produced by
this CLI).

Usage:
    python -m multimodal_ad_tpu.cli.pretrain_icl --steps 4000 --out \
        multimodal_ad_tpu/assets/icl_default.msgpack
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
    p.add_argument("--platform", default="cpu",
                   help="jax platform (default cpu: meta-training streams a "
                        "fresh host-sampled task every step, so a remote "
                        "accelerator link becomes the bottleneck)")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from flax import serialization

    from ..tabular.icl import ICLConfig, pretrain_icl

    cfg = ICLConfig() if args.d_model is None else ICLConfig(d_model=args.d_model)
    params, _ = pretrain_icl(cfg, steps=args.steps, batch=args.batch,
                             n_ctx=args.n_ctx, n_qry=args.n_qry, lr=args.lr,
                             seed=args.seed, verbose=True)
    blob = serialization.to_bytes(params)
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"saved {len(blob) / 1e6:.2f} MB -> {args.out}")


if __name__ == "__main__":
    main()
