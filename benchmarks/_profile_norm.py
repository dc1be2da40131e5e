"""Upper-bound measurement: flagship step with ALL activation norms replaced
by identity (params differ; timing-only experiment). Quantifies the
GroupNorm bandwidth tax before investing in a norm redesign."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from anytime3d_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache("/tmp/anytime3d_jax_cache")

import flax.linen as nn

import anytime3d_tpu.nn.blocks as blocks


class _Identity(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x


blocks.group_norm = lambda channels, dtype=jnp.float32: _Identity()  # monkeypatch

import anytime3d_tpu.nn.autoencoder3d as ae

ae.group_norm = blocks.group_norm  # decoder tail imports it by name

from anytime3d_tpu.data.packing import pack_voxels_blocked
from anytime3d_tpu.models import configs
from anytime3d_tpu.models.mmvae import MultiModalVAE
from anytime3d_tpu.train import create_train_state, make_train_step

B = 32
model_cfg, loss_cfg = configs.variant("modelnet_nolbo")
model = MultiModalVAE(model_cfg, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
vox = (rng.uniform(size=(B, 64, 64, 64, 1)) > 0.7).astype(np.float32)
labels = np.eye(40, dtype=np.float32)[rng.integers(0, 40, B)]
batch = {
    "input_packed_blocked": jnp.asarray(pack_voxels_blocked(vox)),
    "category_onehot": jnp.asarray(labels),
}
state = create_train_state(model, jnp.asarray(vox), jax.random.PRNGKey(0))
step = make_train_step(model, loss_cfg, donate=True)
key = jax.random.PRNGKey(1)
for i in range(3):
    state, m = step(state, batch, jax.random.PRNGKey(i))
float(m["loss_total"])
t0 = time.perf_counter()
iters = 30
for i in range(iters):
    state, m = step(state, batch, jax.random.PRNGKey(100 + i))
float(m["loss_total"])
dt = (time.perf_counter() - t0) / iters * 1e3
print(f"norm-free full step: {dt:.3f} ms", flush=True)
