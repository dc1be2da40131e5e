"""Evaluation CLI — anytime missing-rate sweep + PR curve for a checkpoint.

Replaces the 17 test_*.py reference scripts:
``python -m anytime3d_tpu.cli.evaluate --config modelnet_nolbo --ckpt <path>``.
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True)
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--data", default="synthetic")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--batches", type=int, default=8)
    parser.add_argument("--rates", default="0.3,0.5,0.7,0.9")
    args = parser.parse_args(argv)

    from anytime3d_tpu.data import ModelNetLoader, SyntheticVoxelLoader
    from anytime3d_tpu.evaluation import missing_rate_sweep, pr_curve
    from anytime3d_tpu.models import configs
    from anytime3d_tpu.models.mmvae import MultiModalVAE
    from anytime3d_tpu.train import create_train_state
    from anytime3d_tpu.train.checkpoint import restore_state

    model_cfg = configs.REGISTRY[args.config]()
    model = MultiModalVAE(model_cfg)
    if args.data == "synthetic":
        loader = SyntheticVoxelLoader(
            num_samples=512, dim=model_cfg.decoder.output_shape[0],
            num_classes=max(model_cfg.category_dim, 1) or 40, seed=1,
        )
    else:
        loader = ModelNetLoader(args.data, "test")

    def batch_fn(_):
        b = loader.getNextBatch(args.batch_size)
        out = {
            "input": jnp.asarray(b["input_images"]),
            "target": jnp.asarray(b["input_images"]),
        }
        if model_cfg.prior_category is not None:
            out["category_onehot"] = jnp.asarray(b["class_list"])
        return out

    state = create_train_state(
        model, batch_fn(0)["input"], jax.random.PRNGKey(0)
    )
    if args.ckpt:
        state = restore_state(args.ckpt, state)

    rates = [float(r) for r in args.rates.split(",")]
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
