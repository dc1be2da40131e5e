"""Op probe: can an exact minimal-FLOP k=2 slice-interleave lowering beat the
classic ConvTranspose for stage3 (16^3, 128->64)? The k=3 zero-structured
form loses there (5.22 vs 3.34 ms, KERNELS.md §10) because of the 27/8 FLOP
overhead; this form has minimal FLOPs but odd 17^3 intermediates."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from anytime3d_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache("/tmp/anytime3d_jax_cache")

from anytime3d_tpu.nn.blocks import depth_to_space3d

B = 32


def bench(name, fn, *args, iters=30):
    for _ in range(3):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {dt:8.3f} ms", flush=True)
    return dt


def slice_equiv(x, K, cout):
    """Exact ConvTranspose(k=4,s=2,SAME) via k=2 dense conv over pad-1 input
    (8*cout phase channels) + shifted-slice interleave (phase p window
    offset p)."""
    cin = x.shape[-1]
    kp = K.reshape(2, 2, 2, 2, 2, 2, cin, cout)  # (td,pd,th,ph,tw,pw,ci,co)
    kp = kp.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(2, 2, 2, cin, 8 * cout)
    kp = kp.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    u = jax.lax.conv_general_dilated(
        xp, kp, (1, 1, 1), "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )  # (B, D+1, D+1, D+1, 8*cout)
    D = x.shape[1]
    parts = []
    for pd in (0, 1):
        for ph in (0, 1):
            for pw in (0, 1):
                i = (pd * 2 + ph) * 2 + pw
                parts.append(
                    u[:, pd : pd + D, ph : ph + D, pw : pw + D,
                      i * cout : (i + 1) * cout]
                )
    y = jnp.concatenate(parts, axis=-1)
    return depth_to_space3d(y, 2)


rng = np.random.default_rng(0)
for tag, cin, cout, D in [("stage3 128->64 @16^3", 128, 64, 16)]:
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
    K = pc["params"]["ConvTranspose_0"]["kernel"]

    # parity check on-device (bf16 tolerance)
    y_c = classic.apply(pc, x)
    y_s = slice_equiv(x, K, cout)
    err = float(jnp.max(jnp.abs(y_c.astype(jnp.float32) - y_s.astype(jnp.float32))))
    print(f"{tag}: bf16 max|diff| {err:.3e}")

    f_c = jax.jit(lambda p, x: classic.apply(p, x))
    f_s = jax.jit(lambda k, x: slice_equiv(x, k, cout))
    # realistic bwd: cotangent flows to BOTH params and input
    g_c = jax.jit(jax.grad(
        lambda p, x: jnp.sum(classic.apply(p, x).astype(jnp.float32) ** 2), argnums=(0, 1)))
    g_s = jax.jit(jax.grad(
        lambda k, x: jnp.sum(slice_equiv(x, k, cout).astype(jnp.float32) ** 2), argnums=(0, 1)))
    bench(f"{tag} classic fwd", f_c, pc, x)
    bench(f"{tag} slice-equiv fwd", f_s, K, x)
    bench(f"{tag} classic fwd+bwd(k,x)", g_c, pc, x)
    bench(f"{tag} slice-equiv fwd+bwd(k,x)", g_s, K, x)
