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


def main():
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
    # device->host scalar fetch is the only reliable fence.
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    float(metrics["loss_total"])

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
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
    main()
