"""Per-stage timing of the pascal_nolbo (image->shape) train step on the TPU.

Diagnoses the image-family bench regression (bench_families vs_baseline
0.927, r3 verdict weak #1). Times the EXACT bench graph (bench.py::
bench_image: B=32, 96x128 images, packed 64^3 targets, bf16, faithful
pascal_nolbo loss) and its pieces. Fence = device->host scalar fetch
(enqueue != done on the axon tunnel)."""
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
model_cfg, loss_cfg = configs.variant("pascal_nolbo")
model = MultiModalVAE(model_cfg, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
images = rng.uniform(size=(B, 96, 128, 3)).astype(np.float32)
vox = (rng.uniform(size=(B, 64, 64, 64, 1)) > 0.7).astype(np.float32)
n_cat, n_inst = model_cfg.category_dim, model_cfg.inst_dim
batch = {
    "input": jnp.asarray(images),
    "target_packed_blocked": jnp.asarray(pack_voxels_blocked(vox)),
    "category_onehot": jnp.asarray(
        np.eye(n_cat, dtype=np.float32)[rng.integers(0, n_cat, B)]
    ),
    "inst_onehot": jnp.asarray(
        np.eye(n_inst, dtype=np.float32)[rng.integers(0, n_inst, B)]
    ),
}
state = create_train_state(model, jnp.asarray(images), jax.random.PRNGKey(0))
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

# 2. loss forward only (no grad)
fwd = jax.jit(
    lambda p: compute_losses(model, loss_cfg, p, batch, key, False)[0]
)
t_fwd = bench("loss forward only", fwd, params)

# 3. fwd + bwd, no optimizer (grads only)
grad_fn = jax.jit(
    jax.grad(lambda p: compute_losses(model, loss_cfg, p, batch, key, False)[0])
)
t_grad = bench("fwd+bwd (grads only)", grad_fn, params)

# 4. optimizer only: apply fixed grads (captures Adam + guard)
fixed_grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p) * 1e-4, params)
from anytime3d_tpu.train.step import apply_gradients_if_finite


def opt_only(s):
    new_s, m = apply_gradients_if_finite(s, fixed_grads, {})
    return m["grads_finite"]


opt_jit = jax.jit(opt_only)
t_opt = bench("optimizer+guard only", opt_jit, state)

# 5. backbone+head fwd+bwd (image encoder half)
x_img = jnp.asarray(images)
enc_g = jax.jit(jax.grad(lambda p: jnp.sum(
    model.apply({"params": p}, x_img,
                method=MultiModalVAE.encode).mean_category.astype(jnp.float32))))
t_enc = bench("backbone+head fwd+bwd", enc_g, params)

# 6. decoder fwd+bwd (dense output — image family has no blocked IO)
z = jnp.zeros((B, 16), jnp.float32)
dec_g = jax.jit(jax.grad(lambda p: jnp.sum(
    model.apply({"params": p}, z,
                method=MultiModalVAE.decode).astype(jnp.float32))))
t_dec = bench("decoder fwd+bwd", dec_g, params)

# 7. l2_penalty alone (pascal uses l2 5e-4 over 31.4M params; flagship's is 0-weight... actually modelnet l2_weight=0)
from anytime3d_tpu.train.state import l2_penalty

l2_g = jax.jit(jax.grad(lambda p: l2_penalty(p, 5e-4)))
t_l2 = bench("l2 penalty grad alone", l2_g, params)

print(f"\nderived: bwd ~= {t_grad - t_fwd:.2f} ms, opt-tail ~= {t_full - t_grad:.2f} ms")
