"""Streaming anytime reconstruction demo.

Trains a small voxel NOLBO on synthetic shapes, then feeds a stream of
PARTIAL observations (each frame reveals a random subset of latent
dimensions) through the recursive Gaussian fusion engine and prints how
reconstruction IoU improves monotonically as observations accumulate —
the "anytime" property the reference approximates with per-eval masking
(nolbo.py:199-259), here as a first-class streaming API.

    python examples/streaming_anytime.py            # real device
    JAX_PLATFORMS=cpu python examples/streaming_anytime.py --tiny
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# runnable from a checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--tiny", action="store_true", help="16^3 model (CPU-friendly)")
    parser.add_argument("--train-steps", type=int, default=300)
    parser.add_argument("--frames", type=int, default=8)
    parser.add_argument("--observed-frac", type=float, default=0.25,
                        help="fraction of latent dims observed per frame")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    from anytime3d_tpu.anytime import AnytimeReconstructor
    from anytime3d_tpu.data import SyntheticVoxelLoader
    from anytime3d_tpu.models import configs
    from anytime3d_tpu.models.mmvae import MMVAEConfig, MultiModalVAE
    from anytime3d_tpu.nn.autoencoder3d import Decoder3DConfig, Encoder3DConfig
    from anytime3d_tpu.nn.priornet import PriorNetConfig
    from anytime3d_tpu.ops import voxel_tp_fp_fn
    from anytime3d_tpu.train import LossConfig, create_train_state, make_train_step

    if args.tiny:
        z, n_cls, dim = 16, 8, 16
        cfg = MMVAEConfig(
            z_category_dim=z, z_inst_dim=0, category_dim=n_cls, encoder="voxel",
            encoder3d=Encoder3DConfig(
                output_dim=2 * z, filter_nums=(16, 32), filter_sizes=(4, 4, 3),
                strides=(2, 2, 1),
            ),
            decoder=Decoder3DConfig(
                input_dim=z, output_shape=(dim, dim, dim, 1), filter_nums=(32, 16, 1),
                filter_sizes=(4, 4, 4), strides=(1, 2, 2),
            ),
            prior_category=PriorNetConfig(input_dim=n_cls, unit_nums=(32, z), const_log_var=0.0),
        )
    else:
        z, n_cls, dim = 64, 40, 64
        cfg = configs.modelnet_nolbo()

    model = MultiModalVAE(cfg, dtype=jnp.float32)
    loader = SyntheticVoxelLoader(num_samples=512, dim=dim, num_classes=n_cls)

    def batch_fn():
        b = loader.getNextBatch(32)
        return {
            "input": jnp.asarray(b["input_images"]),
            "target": jnp.asarray(b["input_images"]),
            "category_onehot": jnp.asarray(b["class_list"]),
        }

    print(f"training {args.train_steps} steps...", flush=True)
    state = create_train_state(model, batch_fn()["input"], jax.random.PRNGKey(0),
                               learning_rate=3e-4)
    step = make_train_step(model, LossConfig(), donate=True)
    for i in range(args.train_steps):
        state, m = step(state, batch_fn(), jax.random.PRNGKey(i))
    print(f"final train loss {float(m['loss_total']):.1f}", flush=True)

    # ---- streaming phase --------------------------------------------------
    recon = AnytimeReconstructor(model, state.params)
    b = batch_fn()
    target = np.asarray(b["target"][:1])
    mean, log_var = recon.encode_observation(b["input"][:1])

    belief = recon.new_object(batch_shape=(1,))
    rng = np.random.default_rng(0)
    print(f"\nstreaming {args.frames} partial observations "
          f"({args.observed_frac:.0%} of latent dims each):")
    last_iou = 0.0
    for f in range(args.frames):
        mask = (rng.random(mean.shape) < args.observed_frac).astype(np.float32)
        belief = recon.observe(belief, mean, log_var, mask=jnp.asarray(mask))
        corrected = recon.correct(belief)
        pred = recon.decode(corrected)
        tp, fp, fn = voxel_tp_fp_fn(jnp.asarray(target), pred)
        iou = float(tp[0] / (tp[0] + fp[0] + fn[0] + 1e-9))
        n_obs = int((np.asarray(belief.precision) > 1e-3).sum())
        print(f"  frame {f}: observed dims {n_obs}/{mean.size}  IoU {iou:.4f}")
        last_iou = iou
    print(f"\nfinal IoU after {args.frames} partial frames: {last_iou:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
