"""Serving transport probe: is the 32-client ceiling the chip or the link?

The r3/r4 serving bench saturates at ~10 batches/s (p50 ~100 ms at 1
client, throughput flat from 8 to 32 clients, before AND after the
batcher learned to keep 2 batches in flight). This probe separates the
three candidate bounds:

1. device compute  — time N calls on a DEVICE-RESIDENT input with one
   final fence: dispatch pipelining hides everything but the math;
2. RPC overlap     — dispatch N calls back-to-back each on fresh HOST
   inputs, fence once: if the transport overlaps in-flight requests this
   approaches (1) + one RTT; if it serializes, it approaches N * RTT;
3. request RTT     — one call, host input -> host output fetch, timed.

Usage: python benchmarks/serving_transport_probe.py --out docs/results/serving_transport_probe.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--calls", type=int, default=8)
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    from anytime3d_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache("/tmp/anytime3d_jax_cache")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from anytime3d_tpu.data.packing import pack_voxels
    from anytime3d_tpu.models import configs
    from anytime3d_tpu.models.mmvae import MultiModalVAE
    from anytime3d_tpu.serving.export import export_infer, load_infer
    from anytime3d_tpu.train import create_train_state

    B, d = args.batch_size, args.dim
    model_cfg, _ = configs.variant("modelnet_nolbo")
    model = MultiModalVAE(model_cfg, dtype=jnp.bfloat16)
    state = create_train_state(
        model, jnp.zeros((B, d, d, d, 1), jnp.bfloat16), jax.random.PRNGKey(0)
    )
    fn = load_infer(export_infer(
        model, state.params, (B, d, d, d, 1), packed_input=True, packed_output=True
    ))

    rng = np.random.default_rng(0)
    vox = (rng.uniform(size=(B, d, d, d, 1)) > 0.7).astype(np.float32)
    host_x = pack_voxels(vox)
    mask = np.ones((B, model_cfg.z_category_dim), np.float32)
    dev_x, dev_m = jnp.asarray(host_x), jnp.asarray(mask)

    def fence(out):
        return float(jnp.sum(out["z_mean"].astype(jnp.float32)))

    # warmup / compile
    fence(fn(dev_x, dev_m))
    n = args.calls

    # 1. device compute: resident input, one fence for the whole chain
    t0 = time.perf_counter()
    outs = [fn(dev_x, dev_m) for _ in range(n)]
    for o in outs:
        fence(o)
    t_device_chain = time.perf_counter() - t0

    # 2. RPC overlap: fresh host input per call, dispatch all, fence at end
    t0 = time.perf_counter()
    outs = [fn(jnp.asarray(host_x), jnp.asarray(mask)) for _ in range(n)]
    for o in outs:
        np.asarray(o["pred_packed"])  # full result fetch, like the server
    t_pipelined = time.perf_counter() - t0

    # 3. strict request RTT: host in -> host out, serial
    t0 = time.perf_counter()
    for _ in range(n):
        o = fn(jnp.asarray(host_x), jnp.asarray(mask))
        np.asarray(o["pred_packed"])
    t_serial = time.perf_counter() - t0

    result = {
        "batch_size": B,
        "dim": d,
        "calls": n,
        "device_chain_ms_per_call": round(t_device_chain / n * 1e3, 2),
        "pipelined_host_io_ms_per_call": round(t_pipelined / n * 1e3, 2),
        "serial_host_io_ms_per_call": round(t_serial / n * 1e3, 2),
        "interpretation": (
            "device_chain ~= chip bound; serial ~= per-request RTT; "
            "pipelined between the two shows how much the transport "
            "overlaps concurrent in-flight requests"
        ),
    }
    print(json.dumps(result, indent=1))
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
