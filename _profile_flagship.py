"""Per-stage timing of the flagship modelnet_nolbo train step on the TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from anytime3d_tpu.models import configs
from anytime3d_tpu.models.mmvae import MultiModalVAE
from anytime3d_tpu.train import LossConfig, create_train_state, make_train_step
from anytime3d_tpu.train.step import compute_losses

B = 32
model = MultiModalVAE(configs.modelnet_nolbo(), dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
vox = (rng.uniform(size=(B, 64, 64, 64, 1)) > 0.7).astype(np.float32)
labels = np.eye(40, dtype=np.float32)[rng.integers(0, 40, B)]
batch = {
    "input": jnp.asarray(vox),
    "target": jnp.asarray(vox),
    "category_onehot": jnp.asarray(labels),
}
state = create_train_state(model, batch["input"], jax.random.PRNGKey(0))
params = state.params


def bench(name, fn, *args, iters=20):
    out = None
    for i in range(3):
        out = fn(*args)
    # fence: device->host scalar
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:40s} {dt:8.3f} ms")
    return dt


# 1. full train step
step = make_train_step(model, LossConfig(), donate=False)
key = jax.random.PRNGKey(1)
bench("full train step", lambda: step(state, batch, key)[1])

# 2. loss forward only (no grad)
fwd = jax.jit(lambda p: compute_losses(model, LossConfig(), p, batch, key, False)[0])
bench("loss forward only", fwd, params)

# 3. encoder forward only
enc_fn = jax.jit(
    lambda p: model.apply({"params": p}, batch["input"], method=MultiModalVAE.encode).mean
)
bench("encoder fwd", enc_fn, params)

# 4. decoder forward only
z = jnp.zeros((B, 64), jnp.float32)
dec_fn = jax.jit(lambda p: model.apply({"params": p}, z, method=MultiModalVAE.decode))
bench("decoder fwd", dec_fn, params)

# 5. encoder fwd+bwd
enc_g = jax.jit(jax.grad(lambda p: jnp.sum(
    model.apply({"params": p}, batch["input"], method=MultiModalVAE.encode).mean.astype(jnp.float32))))
bench("encoder fwd+bwd", enc_g, params)

# 6. decoder fwd+bwd
dec_g = jax.jit(jax.grad(lambda p: jnp.sum(
    model.apply({"params": p}, z, method=MultiModalVAE.decode).astype(jnp.float32))))
bench("decoder fwd+bwd", dec_g, params)

# 7. losses-only on fixed pred (BCE+PR cost)
pred = jnp.asarray(rng.uniform(size=(B, 64, 64, 64, 1)).astype(np.float32))
from anytime3d_tpu.ops import focal_binary_loss, voxel_tp_fp_fn
loss_fn = jax.jit(lambda p, t: (jnp.mean(focal_binary_loss(p, t)), voxel_tp_fp_fn(t, p)))
bench("bce + pr metric on 64^3", loss_fn, pred, batch["target"])
