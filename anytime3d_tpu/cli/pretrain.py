"""Backbone-pretraining CLI (ImageNet classifier).

Replaces the reference's classifier pretraining path
(src/module/classifier.py driven by ImageNet batches from
src/dataset_loader/Imagenet_dataset.py:6-104); the resulting checkpoint's
``backbone`` subtree is loadable into any image-encoder MMVAE config
(cross-experiment composability, train_pascal.py:222-225).

``python -m anytime3d_tpu.cli.pretrain --data <imagenet_dir>`` or
``--data synthetic`` for a procedural smoke run.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", default="synthetic")
    parser.add_argument("--backbone", default="darknet19")
    parser.add_argument("--num-classes", type=int, default=None,
                        help="defaults to the dataset's class count")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--image-size", type=int, default=224)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--learning-rate", type=float, default=1e-4)
    parser.add_argument("--save-path", default=None)
    parser.add_argument("--load-path", default=None)
    parser.add_argument("--jsonl", default=None)
    parser.add_argument("--save-every", type=int, default=1000)
    parser.add_argument("--eval-every", type=int, default=200)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--mesh", action="store_true")
    args = parser.parse_args(argv)

    from anytime3d_tpu.data import ImagenetLoader
    from anytime3d_tpu.data.modelnet import SyntheticImageObjectLoader
    from anytime3d_tpu.models.classifier import Classifier, ClassifierConfig
    from anytime3d_tpu.train import create_train_state
    from anytime3d_tpu.train.classifier_step import (
        ClassifierLossConfig,
        classifier_losses,
        make_classifier_train_step,
    )
    from anytime3d_tpu.train.trainer import Trainer, TrainerConfig

    size = (args.image_size, args.image_size)
    if args.data == "synthetic":
        n_cls = args.num_classes or 10
        loader = SyntheticImageObjectLoader(
            num_samples=1024, dim=32, num_classes=n_cls
        )
        eval_loader = SyntheticImageObjectLoader(
            num_samples=256, dim=32, num_classes=n_cls, seed=1
        )

        def batch_of(ld):
            def fn(_it):
                _inst, cls, _s, _c, images, _vox = ld.getNextBatch(
                    args.batch_size, imageSize=size
                )
                return {"images": jnp.asarray(images), "labels": jnp.asarray(cls)}

            return fn

    else:
        loader = ImagenetLoader(args.data)
        eval_loader = loader  # the reference pretrainer has no held-out split
        n_cls = args.num_classes or loader.class_num

        def batch_of(ld):
            def fn(_it):
                images, labels = ld.getNextBatch(args.batch_size, imageSize=size)
                return {"images": jnp.asarray(images), "labels": jnp.asarray(labels)}

            return fn

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = Classifier(ClassifierConfig(num_classes=n_cls, backbone=args.backbone), dtype=dtype)
    state = create_train_state(
        model,
        jnp.zeros((args.batch_size, *size, 3), dtype),
        jax.random.PRNGKey(0),
        learning_rate=args.learning_rate,
    )

    loss_cfg = ClassifierLossConfig()
    step = make_classifier_train_step(model, loss_cfg, donate=True)

    def eval_fn(params, batch, _key):
        _, metrics = classifier_losses(model, loss_cfg, params, batch)
        return metrics

    trainer = Trainer(
        model,
        state,
        batch_of(loader),
        eval_batch_fn=batch_of(eval_loader),
        config=TrainerConfig(
            total_steps=args.steps,
            eval_every=args.eval_every,
            save_every=args.save_every,
            save_path=args.save_path,
            load_path=args.load_path,
            jsonl_path=args.jsonl,
            use_mesh=args.mesh,
        ),
        step_fn=step,
        eval_fn=jax.jit(eval_fn),
    )
    trainer.run(epoch_fn=lambda: loader.epoch)
    print("\ndone; final metrics:", {k: round(v, 4) for k, v in trainer.logger.means().items()})


if __name__ == "__main__":
    main()
