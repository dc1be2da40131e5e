"""Op-level timing: classic ConvTranspose vs exact phase-equiv lowering
(blocks.py::ConvTransposeEquiv3D) for the decoder's two hot stages, plus
decoder fwd+bwd for the acc layout. Fence = device->host scalar fetch."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from anytime3d_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache("/tmp/anytime3d_jax_cache")

from anytime3d_tpu.nn.blocks import ConvTransposeEquiv3D

B = 32


def bench(name, fn, *args, iters=30):
    for _ in range(3):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {dt:8.3f} ms", flush=True)
    return dt


rng = np.random.default_rng(0)


def probe(tag, cin, cout, D, phase_output=False):
    x = jnp.asarray(rng.normal(size=(B, D, D, D, cin)).astype(np.float32), jnp.bfloat16)

    class Classic(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.ConvTranspose(
                cout, (4, 4, 4), strides=(2, 2, 2), padding="SAME",
                use_bias=False, dtype=jnp.bfloat16,
            )(x)

    classic = Classic()
    pc = classic.init(jax.random.PRNGKey(0), x)
    eq = ConvTransposeEquiv3D(cout, dtype=jnp.bfloat16)
    K = pc["params"]["ConvTranspose_0"]["kernel"]
    pe = {"params": {"kernel": K}}

    f_c = jax.jit(lambda p, x: classic.apply(p, x))
    f_e = jax.jit(lambda p, x: eq.apply(p, x, phase_output=phase_output))
    g_c = jax.jit(jax.grad(lambda p, x: jnp.sum(classic.apply(p, x).astype(jnp.float32)), argnums=0))
    g_e = jax.jit(jax.grad(lambda p, x: jnp.sum(eq.apply(p, x, phase_output=phase_output).astype(jnp.float32)), argnums=0))
    bench(f"{tag} classic fwd", f_c, pc, x)
    bench(f"{tag} equiv fwd (phase_out={phase_output})", f_e, pe, x)
    bench(f"{tag} classic fwd+bwd(params)", g_c, pc, x)
    bench(f"{tag} equiv fwd+bwd(params)", g_e, pe, x)


# final stage: 32^3, 64 -> 1
probe("final 64->1ch @32^3", 64, 1, 32, phase_output=True)
# stage 3: 16^3, 128 -> 64
probe("stage3 128->64 @16^3", 128, 64, 16)
# stage 2: 8^3, 256 -> 128
probe("stage2 256->128 @8^3", 256, 128, 8)

# decoder fwd+bwd for acc layout vs flagship blocked
from anytime3d_tpu.models import configs
from anytime3d_tpu.models.mmvae import MultiModalVAE

for name in ("modelnet_nolbo_acc", "modelnet_nolbo"):
    mc, _ = configs.variant(name)
    model = MultiModalVAE(mc, dtype=jnp.bfloat16)
    vox = jnp.asarray((rng.uniform(size=(2, 64, 64, 64, 1)) > 0.7).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), vox)["params"]
    z = jnp.zeros((B, 64), jnp.float32)
    dec_g = jax.jit(jax.grad(lambda p: jnp.sum(
        model.apply({"params": p}, z, blocked_output=True,
                    method=MultiModalVAE.decode).astype(jnp.float32))))
    bench(f"{name} decoder fwd+bwd (blocked_output)", dec_g, params)
