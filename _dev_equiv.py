"""Dev probe 2: 3D parity of ConvTransposeEquiv3D vs nn.ConvTranspose."""
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
from anytime3d_tpu.nn.blocks import ConvTransposeEquiv3D

rng = np.random.default_rng(1)
for D, cin, cout in [(4, 3, 5), (8, 2, 1), (6, 1, 4)]:
    x = jnp.asarray(rng.normal(size=(2, D, D, D, cin)).astype(np.float32))

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.ConvTranspose(cout, (4, 4, 4), strides=(2, 2, 2),
                                    padding="SAME", use_bias=False)(x)

    ref = Ref()
    p_ref = ref.init(jax.random.PRNGKey(0), x)
    K = p_ref["params"]["ConvTranspose_0"]["kernel"]
    y_ref = ref.apply(p_ref, x)

    eq = ConvTransposeEquiv3D(cout)
    p_eq = eq.init(jax.random.PRNGKey(1), x)
    p_eq = {"params": {"kernel": K}}
    y_eq = eq.apply(p_eq, x)

    err = float(jnp.max(jnp.abs(y_ref - y_eq)))
    print(f"D={D} cin={cin} cout={cout}: shape {y_eq.shape} vs {y_ref.shape}, max|diff|={err:.2e}")
    assert y_eq.shape == y_ref.shape
    assert err < 1e-5, err

    # gradient parity wrt the kernel
    def loss_ref(k):
        return jnp.sum(jnp.sin(ref.apply({"params": {"ConvTranspose_0": {"kernel": k}}}, x)))

    def loss_eq(k):
        return jnp.sum(jnp.sin(eq.apply({"params": {"kernel": k}}, x)))

    g_ref = jax.grad(loss_ref)(K)
    g_eq = jax.grad(loss_eq)(K)
    gerr = float(jnp.max(jnp.abs(g_ref - g_eq)))
    print(f"  grad max|diff|={gerr:.2e}")
    assert gerr < 1e-4, gerr
print("OK")
