"""Multi-object detector-reconstructor training CLI.

The reference ships multi-object NOLBO as inference only
(src/module/nolbo_test.py:41-256, no training path); this framework adds the
training step (train/detector_step.py) and this entry point drives it over
Pascal3D full-image grid batches (pascal3D.py:286-549 semantics) or a
synthetic multi-object scene generator.

``python -m anytime3d_tpu.cli.train_detector --data synthetic``.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--data", default="synthetic")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--image-size", type=int, nargs=2, default=(128, 96),
                        metavar=("COLS", "ROWS"))
    parser.add_argument("--grid-size", type=int, nargs=2, default=(4, 3),
                        metavar=("COLS", "ROWS"))
    parser.add_argument("--voxel-dim", type=int, default=32)
    parser.add_argument("--max-slots", type=int, default=8)
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--learning-rate", type=float, default=1e-4)
    parser.add_argument("--save-path", default=None)
    parser.add_argument("--load-path", default=None)
    parser.add_argument("--jsonl", default=None)
    parser.add_argument("--save-every", type=int, default=1000)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--mesh", action="store_true")
    args = parser.parse_args(argv)

    from anytime3d_tpu.data import Pascal3DMultiObjectLoader, SyntheticMultiObjectLoader
    from anytime3d_tpu.data.collate import collate_multiobject
    from anytime3d_tpu.models.detector import DetectorConfig, DetectorReconstructor
    from anytime3d_tpu.nn.autoencoder3d import Decoder3DConfig
    from anytime3d_tpu.train import create_train_state
    from anytime3d_tpu.train.detector_step import (
        DetectorLossConfig,
        make_detector_train_step,
    )
    from anytime3d_tpu.train.trainer import Trainer, TrainerConfig

    image_size = tuple(args.image_size)
    grid_size = tuple(args.grid_size)
    d = args.voxel_dim
    if args.data == "synthetic":
        loader = SyntheticMultiObjectLoader(
            num_samples=1024, dim=d, image_size=image_size, grid_size=grid_size
        )
    else:
        loader = Pascal3DMultiObjectLoader(
            args.data, "train", image_size=image_size, grid_size=grid_size
        )

    n_strides = 3 if d >= 32 else 2
    decoder = Decoder3DConfig(
        input_dim=16,
        output_shape=(d, d, d, 1),
        filter_nums=(128, 64, 32)[:n_strides] + (1,),
        filter_sizes=(4,) * (n_strides + 1),
        strides=(1,) + (2,) * n_strides,
    )
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = DetectorReconstructor(
        DetectorConfig(decoder=decoder), dtype=dtype
    )

    def batch_fn(_it):
        images, targets, voxel_lists = loader.getNextBatch(args.batch_size)
        b = collate_multiobject(images, targets, voxel_lists, max_slots=args.max_slots)
        return {k: jnp.asarray(v) for k, v in b.items()}

    state = create_train_state(
        model,
        jnp.zeros((args.batch_size, image_size[1], image_size[0], 3), dtype),
        jax.random.PRNGKey(0),
        learning_rate=args.learning_rate,
    )
    step = make_detector_train_step(model, DetectorLossConfig(), donate=True)
    trainer = Trainer(
        model,
        state,
        batch_fn,
        config=TrainerConfig(
            total_steps=args.steps,
            save_every=args.save_every,
            save_path=args.save_path,
            load_path=args.load_path,
            jsonl_path=args.jsonl,
            use_mesh=args.mesh,
        ),
        step_fn=step,
    )
    trainer.run(epoch_fn=lambda: loader.epoch)
    print("\ndone; final metrics:", {k: round(v, 4) for k, v in trainer.logger.means().items()})

    from anytime3d_tpu.evaluation.detection import evaluate_detector

    det = evaluate_detector(model, trainer.state.params, batch_fn, num_batches=2)
    print("detection eval:", {k: round(v, 4) for k, v in det.items()})


if __name__ == "__main__":
    main()
