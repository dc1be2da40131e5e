"""Per-stage timing of the flagship modelnet_nolbo train step on the TPU.

Times the EXACT bench graph (packed blocked input, bf16, B=32, donate) and
its pieces. Fence = device->host scalar fetch (enqueue != done on the axon
tunnel)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp

from anytime3d_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache("/tmp/anytime3d_jax_cache")

from anytime3d_tpu.data.packing import pack_voxels_blocked
from anytime3d_tpu.models import configs
from anytime3d_tpu.models.mmvae import MultiModalVAE
from anytime3d_tpu.train import create_train_state, make_train_step
from anytime3d_tpu.train.step import compute_losses

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
params = state.params
key = jax.random.PRNGKey(1)


def bench(name, fn, *args, iters=30):
    out = None
    for i in range(3):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf).astype(jnp.float32))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return dt


# 1. full train step (the bench graph)
step = make_train_step(model, loss_cfg, donate=False)
t_full = bench("full train step", lambda: step(state, batch, key)[1])

# 2. loss forward only (no grad) — same packed input
fwd = jax.jit(
    lambda p: compute_losses(model, loss_cfg, p, batch, key, False)[0]
)
t_fwd = bench("loss forward only", fwd, params)

# 3. fwd + bwd, no optimizer (grads only)
grad_fn = jax.jit(
    jax.grad(lambda p: compute_losses(model, loss_cfg, p, batch, key, False)[0])
)
t_grad = bench("fwd+bwd (grads only)", grad_fn, params)

# 4. optimizer only: apply fixed grads (captures Adam + guard + select)
fixed_grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 1e-4, params)
from anytime3d_tpu.train.step import apply_gradients_if_finite


def opt_only(s):
    new_s, m = apply_gradients_if_finite(s, fixed_grads, {})
    return m["grads_finite"]


opt_jit = jax.jit(opt_only)
t_opt = bench("optimizer+guard only", opt_jit, state)

# 5. encoder fwd+bwd (blocked input path)
from anytime3d_tpu.nn.autoencoder3d import space_to_depth3d

x_blocked = jnp.asarray(space_to_depth3d(jnp.asarray(vox, jnp.bfloat16), 4))
enc_g = jax.jit(jax.grad(lambda p: jnp.sum(
    model.apply({"params": p}, x_blocked, blocked_input=True,
                method=MultiModalVAE.encode).mean.astype(jnp.float32))))
t_enc = bench("encoder fwd+bwd", enc_g, params)

# 6. decoder fwd+bwd (blocked output)
z = jnp.zeros((B, 64), jnp.float32)
dec_g = jax.jit(jax.grad(lambda p: jnp.sum(
    model.apply({"params": p}, z, blocked_output=True,
                method=MultiModalVAE.decode).astype(jnp.float32))))
t_dec = bench("decoder fwd+bwd", dec_g, params)

print(f"\nderived: bwd ~= {t_grad - t_fwd:.2f} ms, opt-tail ~= {t_full - t_grad:.2f} ms")
