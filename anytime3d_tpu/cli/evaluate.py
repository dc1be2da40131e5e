"""Evaluation CLI — anytime missing-rate sweep, PR curve, latent extraction,
and reconstruction dumping for a checkpoint.

Replaces the 17 test_*.py reference scripts:

- sweep + PR curve (default): test_modelnet_AE.py:104-156 / modelnetAE3.ipynb
- ``--latents-out f.npy``: per-class mean latents (test_modelnet_getLatents.py:93-115)
- ``--dump dir/``: GT/pred voxel dumps across missing rates
  (test_modelnet_3D.py:117-143, test_pascal_3D.py:144-173)

``python -m anytime3d_tpu.cli.evaluate --config modelnet_nolbo --ckpt <path>``.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--data", default="synthetic")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--batches", type=int, default=8)
    parser.add_argument("--rates", default="0.3,0.5,0.7,0.9")
    parser.add_argument("--image-size", type=int, default=64)
    parser.add_argument("--cad-path", default=None)
    parser.add_argument("--latents-out", default=None,
                        help="write per-class mean latents (category_vectors) to .npy")
    parser.add_argument("--dump", default=None,
                        help="dump GT/pred voxel grids per missing rate to this dir")
    args = parser.parse_args(argv)

    from anytime3d_tpu.cli.train import build_batch_fn, build_loaders
    from anytime3d_tpu.evaluation import category_vectors, missing_rate_sweep, pr_curve
    from anytime3d_tpu.evaluation.dump import dump_reconstructions
    from anytime3d_tpu.models import configs
    from anytime3d_tpu.models.mmvae import MultiModalVAE
    from anytime3d_tpu.train import create_train_state
    from anytime3d_tpu.train.checkpoint import restore_state

    model_cfg = configs.REGISTRY[args.config]()
    model = MultiModalVAE(model_cfg)
    image_size = (
        (args.image_size, args.image_size) if model_cfg.encoder == "image" else None
    )
    _, loader = build_loaders(args, model_cfg)
    batch_fn = build_batch_fn(loader, model_cfg, args.batch_size, image_size)

    state = create_train_state(model, batch_fn(0)["input"], jax.random.PRNGKey(0))
    if args.ckpt:
        state = restore_state(args.ckpt, state)

    if args.latents_out:
        vecs = category_vectors(
            model, state.params, batch_fn,
            num_classes=model_cfg.category_dim or 40, num_batches=args.batches,
        )
        np.save(args.latents_out, vecs)
        print(f"wrote {vecs.shape} category vectors to {args.latents_out}")
        return

    rates = [float(r) for r in args.rates.split(",")]
    if args.dump:
        dump_reconstructions(
            model, state.params, batch_fn(0), args.dump, rates=rates
        )
        print(f"dumped reconstructions for rates {rates} to {args.dump}")
        return

    table = missing_rate_sweep(
        model, state.params, batch_fn, rates=rates, num_batches=args.batches
    )
    print(json.dumps({str(k): v for k, v in table.items()}, indent=2))

    batch = batch_fn(0)
    pred = model.apply({"params": state.params}, batch["input"])
    curve = pr_curve(batch["target"], pred)
    best = int(curve["iou"].argmax())
    print(
        f"best decode threshold {curve['threshold'][best]:.2f} "
        f"iou {curve['iou'][best]:.4f}"
    )


if __name__ == "__main__":
    main()
