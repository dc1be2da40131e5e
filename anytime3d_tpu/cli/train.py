"""Training CLI — one entry point for every experiment in the variant table.

Replaces the 17 copy-pasted train_*.py reference scripts with
``python -m anytime3d_tpu.cli.train --config modelnet_nolbo --data <path>``.
``--data synthetic`` runs on procedural voxels (smoke tests / benches).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def build_batch_fn(loader, model_cfg):
    """Adapt a reference-style loader dict/tuple to the train-step batch dict."""

    def batch_fn(_it: int):
        b = loader.getNextBatch()
        if isinstance(b, dict):  # modelnet-style
            out = {
                "input": jnp.asarray(b["input_images"]),
                "target": jnp.asarray(b["input_images"]),
            }
            if model_cfg.prior_category is not None or model_cfg.category_dim:
                out["category_onehot"] = jnp.asarray(b["class_list"])
            if model_cfg.inst_dim:
                out["inst_onehot"] = jnp.asarray(b["inst_list"])
            return out
        # pascal-style tuple (inst, cls, sin, cos, images, voxels)
        inst, cls, _sin, _cos, images, voxels = b
        out = {"input": jnp.asarray(images), "target": jnp.asarray(voxels)}
        if model_cfg.prior_category is not None or model_cfg.category_dim:
            out["category_onehot"] = jnp.asarray(cls)
        if model_cfg.inst_dim:
            out["inst_onehot"] = jnp.asarray(inst)
        return out

    return batch_fn


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", required=True, help="name from models.configs.REGISTRY")
    parser.add_argument("--data", default="synthetic", help="dataset path or 'synthetic'")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--learning-rate", type=float, default=1e-4)
    parser.add_argument("--save-path", default=None)
    parser.add_argument("--load-path", default=None)
    parser.add_argument("--jsonl", default=None)
    parser.add_argument("--eval-every", type=int, default=200)
    parser.add_argument("--save-every", type=int, default=1000)
    parser.add_argument("--bf16", action="store_true", help="bfloat16 compute dtype")
    parser.add_argument("--mesh", action="store_true", help="shard batch over all devices")
    parser.add_argument("--compilation-cache", default="/tmp/anytime3d_jax_cache")
    args = parser.parse_args(argv)

    from anytime3d_tpu.data import ModelNetLoader, SyntheticVoxelLoader
    from anytime3d_tpu.models import configs
    from anytime3d_tpu.models.mmvae import MultiModalVAE
    from anytime3d_tpu.train import LossConfig, create_train_state
    from anytime3d_tpu.train.trainer import Trainer, TrainerConfig
    from anytime3d_tpu.utils.profiling import enable_compilation_cache

    if args.compilation_cache:
        enable_compilation_cache(args.compilation_cache)

    model_cfg = configs.REGISTRY[args.config]()
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = MultiModalVAE(model_cfg, dtype=dtype)

    if model_cfg.encoder != "voxel":
        raise SystemExit(
            "image-encoder configs need a Pascal3D/KITTI dataset path wired via "
            "anytime3d_tpu.data loaders; use a voxel config for synthetic runs"
        )

    if args.data == "synthetic":
        loader = SyntheticVoxelLoader(
            num_samples=1024, dim=model_cfg.decoder.output_shape[0],
            num_classes=max(model_cfg.category_dim, 1) or 40,
        )
        eval_loader = SyntheticVoxelLoader(
            num_samples=256, dim=model_cfg.decoder.output_shape[0],
            num_classes=max(model_cfg.category_dim, 1) or 40, seed=1,
        )
    else:
        loader = ModelNetLoader(args.data, "train")
        eval_loader = ModelNetLoader(args.data, "test")

    def make_loader_fn(ld):
        def fn(_):
            b = ld.getNextBatch(args.batch_size)
            out = {
                "input": jnp.asarray(b["input_images"]),
                "target": jnp.asarray(b["input_images"]),
            }
            if model_cfg.prior_category is not None:
                out["category_onehot"] = jnp.asarray(b["class_list"])
            return out

        return fn

    state = create_train_state(
        model,
        jnp.zeros((args.batch_size, *model_cfg.decoder.output_shape), dtype),
        jax.random.PRNGKey(0),
        learning_rate=args.learning_rate,
    )

    loss_cfg = LossConfig(
        reg_weight=0.01 if "category" in args.config or "nolbo" in args.config else 1.0
    )
    trainer = Trainer(
        model,
        state,
        make_loader_fn(loader),
        loss_config=loss_cfg,
        eval_batch_fn=make_loader_fn(eval_loader),
        config=TrainerConfig(
            total_steps=args.steps,
            eval_every=args.eval_every,
            save_every=args.save_every,
            save_path=args.save_path,
            load_path=args.load_path,
            jsonl_path=args.jsonl,
            use_mesh=args.mesh,
        ),
    )
    trainer.run(epoch_fn=lambda: loader.epoch)
    print("\ndone; final metrics:", {k: round(v, 4) for k, v in trainer.logger.means().items()})


if __name__ == "__main__":
    main()
