"""Benchmark harness — prints ONE JSON line with the headline metric.

Metric: end-to-end training throughput (voxels/s) of the flagship ModelNet
NOLBO config (64³ voxel encoder + priornet + 64³ voxel decoder, batch 32),
the dominant-FLOPs path of the reference (SURVEY.md §3.1: 5×Conv3D enc +
5×Conv3DTranspose dec on 64³ grids).

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
reported against a fixed reference point measured once and recorded below:
the same step in this framework's first working (unoptimized, fp32,
XLA-default) build on the same chip. Ratios > 1.0 are genuine optimization
wins, not hardware deltas.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Throughput of the first working build (bf16 compute, XLA defaults, batch
# 32) on the v5e bench chip, measured 2026-08-17 — the denominator for
# vs_baseline. Re-measured only if the bench config changes.
BASELINE_VOXELS_PER_S = 2.89e8
# First measurements of the secondary families (2026-08-20, v5e, bf16) —
# their vs_baseline is the regression ratio against these fixed points.
BASELINE_IMAGE_VOXELS_PER_S = 6.03e8
BASELINE_DETECTOR_IMAGES_PER_S = 432.0


def _fence_time(step_fn, state, batch, iters=20):
    """Timed loop with a device->host scalar fetch as the completion fence
    (jax.block_until_ready returns at ENQUEUE on the axon tunnel)."""
    import os
    import jax
    import time as _t

    iters = int(os.environ.get("ANYTIME3D_BENCH_ITERS", iters))

    # pre-build PRNG keys: PRNGKey() is a host->device transfer, and on the
    # tunneled backend constructing them inside the timed loop adds ~0.4 ms
    # per step of transfer latency that is NOT the step's cost
    keys = [jax.random.PRNGKey(i) for i in range(3 + iters)]
    for i in range(3):
        state, metrics = step_fn(state, batch, keys[i])
    float(next(iter(metrics.values())))
    t0 = _t.perf_counter()
    for i in range(iters):
        state, metrics = step_fn(state, batch, keys[3 + i])
    float(next(iter(metrics.values())))
    return _t.perf_counter() - t0


def bench_image():
    """Image->shape family: Darknet19 backbone + head -> dual latent -> 64³
    decoder, the reference's train_pascal.py hot loop (SURVEY §3.2)."""
    import jax
    import jax.numpy as jnp

    from anytime3d_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from anytime3d_tpu.models import configs
    from anytime3d_tpu.models.mmvae import MultiModalVAE
    from anytime3d_tpu.train import create_train_state, make_train_step
    from anytime3d_tpu.data.packing import pack_voxels_blocked

    batch_size = 32
    model_cfg, loss_cfg = configs.variant("pascal_nolbo")
    model = MultiModalVAE(model_cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    images = rng.uniform(size=(batch_size, 96, 128, 3)).astype(np.float32)
    vox = (rng.uniform(size=(batch_size, 64, 64, 64, 1)) > 0.7).astype(np.float32)
    n_cat, n_inst = model_cfg.category_dim, model_cfg.inst_dim
    batch = {
        "input": jnp.asarray(images),
        # blocked bit order (production path, cli/train.py): the loss runs
        # in the coarse d2s layout — no fine-grid relayout or 1-ch loss
        "target_packed_blocked": jnp.asarray(pack_voxels_blocked(vox)),
        "category_onehot": jnp.asarray(
            np.eye(n_cat, dtype=np.float32)[rng.integers(0, n_cat, batch_size)]
        ),
        "inst_onehot": jnp.asarray(
            np.eye(n_inst, dtype=np.float32)[rng.integers(0, n_inst, batch_size)]
        ),
    }
    state = create_train_state(model, jnp.asarray(images), jax.random.PRNGKey(0))
    step = make_train_step(model, loss_cfg, donate=True)
    dt = _fence_time(step, state, batch, iters=20)
    vps = batch_size * 64**3 * 20 / dt
    print(json.dumps({
        "metric": "pascal_nolbo_train_voxels_per_s",
        "value": round(vps, 1),
        "unit": "voxels/s",
        "vs_baseline": round(vps / BASELINE_IMAGE_VOXELS_PER_S, 3),
    }))


def bench_detector():
    """Detector family: Darknet19 -> YOLO-style grid head train step
    (the reference ships this path inference-only, nolbo_test.py)."""
    import jax
    import jax.numpy as jnp

    from anytime3d_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from anytime3d_tpu.models.detector import DetectorConfig, DetectorReconstructor
    from anytime3d_tpu.nn.autoencoder3d import Decoder3DConfig
    from anytime3d_tpu.train import create_train_state
    from anytime3d_tpu.train.detector_step import (
        DetectorLossConfig,
        make_detector_train_step,
    )

    batch_size = 16
    gh, gw, p = 3, 4, 5
    d = 32
    decoder = Decoder3DConfig(
        input_dim=16, output_shape=(d, d, d, 1), filter_nums=(128, 64, 32, 1),
        filter_sizes=(4, 4, 4, 4), strides=(1, 2, 2, 2),
    )
    model = DetectorReconstructor(DetectorConfig(decoder=decoder), dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    max_slots = 8
    batch = {
        "images": jnp.asarray(rng.uniform(size=(batch_size, 96, 128, 3)).astype(np.float32)),
        "objness": jnp.asarray((rng.uniform(size=(batch_size, gh, gw, p, 1)) > 0.9).astype(np.float32)),
        "bbox": jnp.asarray(rng.uniform(size=(batch_size, gh, gw, p, 4)).astype(np.float32)),
        "sin": jnp.asarray(rng.uniform(-1, 1, size=(batch_size, gh, gw, p, 3)).astype(np.float32)),
        "cos": jnp.asarray(rng.uniform(-1, 1, size=(batch_size, gh, gw, p, 3)).astype(np.float32)),
        "voxel_slot": jnp.asarray(rng.integers(-1, max_slots, size=(batch_size, gh, gw, p)).astype(np.int32)),
        "voxels": jnp.asarray((rng.uniform(size=(batch_size, max_slots, d, d, d, 1)) > 0.7).astype(np.float32)),
    }
    state = create_train_state(model, batch["images"], jax.random.PRNGKey(0))
    step = make_detector_train_step(model, DetectorLossConfig(), donate=True)
    dt = _fence_time(step, state, batch, iters=20)
    ips = batch_size * 20 / dt
    print(json.dumps({
        "metric": "detector_train_images_per_s",
        "value": round(ips, 1),
        "unit": "images/s",
        "vs_baseline": round(ips / BASELINE_DETECTOR_IMAGES_PER_S, 3),
    }))


def main():
    import os

    import jax
    import jax.numpy as jnp

    from anytime3d_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()

    from anytime3d_tpu.models import configs
    from anytime3d_tpu.models.mmvae import MultiModalVAE
    from anytime3d_tpu.train import create_train_state, make_train_step

    batch_size = 32
    model_cfg, loss_cfg = configs.variant("modelnet_nolbo")
    model = MultiModalVAE(model_cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    vox = (rng.uniform(size=(batch_size, 64, 64, 64, 1)) > 0.7).astype(np.float32)
    labels = np.eye(40, dtype=np.float32)[rng.integers(0, 40, batch_size)]
    # production transfer path (cli/train.py): bit-packed in the blocked
    # coarse-layout order — 32x less host->device traffic, zero device
    # relayout (train/step.py::materialize_batch)
    from anytime3d_tpu.data.packing import pack_voxels_blocked

    batch = {
        "input_packed_blocked": jnp.asarray(pack_voxels_blocked(vox)),
        "category_onehot": jnp.asarray(labels),
    }

    state = create_train_state(model, jnp.asarray(vox), jax.random.PRNGKey(0))
    # the faithful per-variant loss (registry): 0.01*reg margin 2z, prior
    # mixing coin 0.5 / element 0.3 — what cli/train.py trains with
    step = make_train_step(model, loss_cfg, donate=True)

    # warmup / compile. NOTE: on the axon-tunneled platform
    # jax.block_until_ready returns at enqueue time, not completion — a real
    # device->host scalar fetch is the only reliable fence. PRNG keys are
    # pre-built: constructing them in the timed loop adds per-step transfer
    # latency that is not the step's cost.
    # 50-step window: ONE device->host fence per window, so the fence's
    # tunnel RTT amortizes to <0.5 ms/step (at 20 iters it biased the step
    # +1 ms)
    iters = int(os.environ.get("ANYTIME3D_BENCH_ITERS", 50))
    keys = [jax.random.PRNGKey(i) for i in range(3 + iters)]
    for i in range(3):
        state, metrics = step(state, batch, keys[i])
    float(metrics["loss_total"])

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, keys[3 + i])
    float(metrics["loss_total"])  # fence: forces the whole 20-step chain
    dt = time.perf_counter() - t0

    voxels = batch_size * 64 * 64 * 64
    vps = voxels * iters / dt
    print(
        json.dumps(
            {
                "metric": "modelnet_nolbo_train_voxels_per_s",
                "value": round(vps, 1),
                "unit": "voxels/s",
                "vs_baseline": round(vps / BASELINE_VOXELS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    import sys

    # driver contract: bare `python bench.py` prints exactly ONE JSON line
    # (the flagship). `--family image|detector` benches the secondary
    # families; `--all` prints all three lines, flagship last.
    if "--all" in sys.argv:
        bench_image()
        bench_detector()
        main()
    elif "--family" in sys.argv:
        fam = sys.argv[sys.argv.index("--family") + 1]
        {"image": bench_image, "detector": bench_detector, "modelnet": main}[fam]()
    else:
        main()
