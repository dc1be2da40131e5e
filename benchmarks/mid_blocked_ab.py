"""A/B: flagship train-step throughput with/without the mid_blocked layout.

Same methodology as bench.py (packed blocked input, device->host scalar
fence, bf16, B=32). Prints one JSON line per arm.

  python benchmarks/mid_blocked_ab.py            # both arms
  python benchmarks/mid_blocked_ab.py --arm mid  # one arm
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_arm(name: str, mid, iters: int):
    import jax
    import jax.numpy as jnp

    from anytime3d_tpu.data.packing import pack_voxels_blocked
    from anytime3d_tpu.models import configs
    from anytime3d_tpu.models.mmvae import MultiModalVAE
    from anytime3d_tpu.train import create_train_state, make_train_step

    batch_size = 32
    model_cfg, loss_cfg = configs.variant("modelnet_nolbo")
    enc_mid, dec_mid = (mid, mid) if isinstance(mid, bool) else mid
    if enc_mid:
        model_cfg = dataclasses.replace(
            model_cfg,
            encoder3d=dataclasses.replace(model_cfg.encoder3d, mid_blocked=True),
        )
    if dec_mid:
        model_cfg = dataclasses.replace(
            model_cfg,
            decoder=dataclasses.replace(model_cfg.decoder, mid_blocked=True),
        )
    model = MultiModalVAE(model_cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    vox = (rng.uniform(size=(batch_size, 64, 64, 64, 1)) > 0.7).astype(np.float32)
    labels = np.eye(40, dtype=np.float32)[rng.integers(0, 40, batch_size)]
    batch = {
        "input_packed_blocked": jnp.asarray(pack_voxels_blocked(vox)),
        "category_onehot": jnp.asarray(labels),
    }
    state = create_train_state(model, jnp.asarray(vox), jax.random.PRNGKey(0))
    step = make_train_step(model, loss_cfg, donate=True)
    t_c0 = time.perf_counter()
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    float(metrics["loss_total"])
    compile_s = time.perf_counter() - t_c0
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
    float(metrics["loss_total"])
    dt = (time.perf_counter() - t0) / iters
    vps = batch_size * 64**3 / dt
    print(json.dumps({
        "arm": name, "ms_per_step": round(dt * 1e3, 2),
        "voxels_per_s": round(vps, 1), "compile_s": round(compile_s, 1),
    }))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--arm", default="both",
                   choices=["both", "classic", "mid", "enc_mid", "dec_mid"])
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    from anytime3d_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache("/tmp/anytime3d_jax_cache")
    if args.arm in ("both", "classic"):
        run_arm("blocked_head_tail", False, args.iters)
    if args.arm in ("both", "mid"):
        run_arm("blocked_head_tail+mid", True, args.iters)
    if args.arm == "enc_mid":
        run_arm("enc_mid_only", (True, False), args.iters)
    if args.arm == "dec_mid":
        run_arm("dec_mid_only", (False, True), args.iters)


if __name__ == "__main__":
    main()
