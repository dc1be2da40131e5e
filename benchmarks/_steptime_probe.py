"""Quick step-time probe for a REGISTRY config (50 fenced iters, bf16, B=32).
Handles voxel- and image-encoder configs. Usage: python benchmarks/_steptime_probe.py <config>"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time
import numpy as np
from anytime3d_tpu.utils.profiling import enable_compilation_cache
enable_compilation_cache("/tmp/anytime3d_jax_cache")
import jax, jax.numpy as jnp
from anytime3d_tpu.models import configs
from anytime3d_tpu.models.mmvae import MultiModalVAE, blocked_io_block, decoder_blocked_block
from anytime3d_tpu.train import create_train_state, make_train_step
from anytime3d_tpu.data.packing import pack_voxels, pack_voxels_blocked

name = sys.argv[1]
B = 32
model_cfg, loss_cfg = configs.variant(name)
model = MultiModalVAE(model_cfg, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
vox = (rng.uniform(size=(B, 64, 64, 64, 1)) > 0.7).astype(np.float32)
if model_cfg.encoder == "image":
    images = rng.uniform(size=(B, 96, 128, 3)).astype(np.float32)
    batch = {"input": jnp.asarray(images)}
    if decoder_blocked_block(model_cfg):
        batch["target_packed_blocked"] = jnp.asarray(pack_voxels_blocked(vox))
    else:
        batch["target_packed"] = jnp.asarray(pack_voxels(vox))
    if model_cfg.inst_dim:
        batch["inst_onehot"] = jnp.asarray(
            np.eye(model_cfg.inst_dim, dtype=np.float32)[rng.integers(0, model_cfg.inst_dim, B)]
        )
    init_x = jnp.asarray(images)
else:
    if blocked_io_block(model_cfg):
        batch = {"input_packed_blocked": jnp.asarray(pack_voxels_blocked(vox))}
    else:
        batch = {"input_packed": jnp.asarray(pack_voxels(vox))}
    init_x = jnp.asarray(vox)
if model_cfg.category_dim:
    batch["category_onehot"] = jnp.asarray(
        np.eye(model_cfg.category_dim, dtype=np.float32)[rng.integers(0, model_cfg.category_dim, B)]
    )
state = create_train_state(model, init_x, jax.random.PRNGKey(0))
step = make_train_step(model, loss_cfg, donate=True)
keys = [jax.random.PRNGKey(i) for i in range(53)]
for i in range(3):
    state, m = step(state, batch, keys[i])
float(m["loss_total"])
t0 = time.perf_counter()
for i in range(50):
    state, m = step(state, batch, keys[3 + i])
float(m["loss_total"])
dt = (time.perf_counter() - t0) / 50 * 1e3
print(f"{name}: {dt:.2f} ms/step, {B*64**3/dt*1e3/1e6:.1f} Mvox/s")
