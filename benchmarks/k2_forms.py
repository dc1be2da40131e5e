"""Compare k=2 s=1 SAME 3D-conv formulations in pure XLA on TPU.

forms: conv (lax conv lowering) | im2col (build G, one matmul) |
matmul8 (8 shifted matmuls accumulated).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from anytime3d_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

B = 32
SHAPES = [(16, 64, 512), (16, 512, 128), (16, 128, 512), (16, 512, 64)]
TAPS = [(dz, dy, dx) for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]
DIMS = ("NDHWC", "DHWIO", "NDHWC")


def conv_form(x, w):
    return lax.conv_general_dilated(x, w, (1, 1, 1), "SAME", dimension_numbers=DIMS)


def _shift(x, dz, dy, dx):
    # x: [B, D, H, W, C]; SAME even-kernel pad is (0, 1) per axis
    B, D, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (0, dz), (0, dy), (0, dx), (0, 0)))
    return xp[:, dz:, dy:, dx:, :]


def im2col_form(x, w):
    B, D, H, W, C = x.shape
    N = w.shape[-1]
    g = jnp.concatenate([_shift(x, *t) for t in TAPS], axis=-1)  # [B,D,H,W,8C]
    wf = w.reshape(8 * C, N)
    return jnp.einsum("bdhwc,cn->bdhwn", g, wf, preferred_element_type=jnp.float32).astype(x.dtype)


def matmul8_form(x, w):
    B, D, H, W, C = x.shape
    N = w.shape[-1]
    wf = w.reshape(8, C, N)
    acc = None
    for o, t in enumerate(TAPS):
        part = jnp.einsum(
            "bdhwc,cn->bdhwn", _shift(x, *t), wf[o], preferred_element_type=jnp.float32
        )
        acc = part if acc is None else acc + part
    return acc.astype(x.dtype)


def timeit(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.sum(out[0, 0, 0, 0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out[0, 0, 0, 0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


for D, C, N in SHAPES:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, D, D, D, C)).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(2, 2, 2, C, N)).astype(np.float32), jnp.bfloat16)
    flops = 2 * B * D**3 * 8 * C * N
    ref = None
    line = f"D={D} C={C:4d} N={N:4d} "
    for name, fn in [("conv", conv_form), ("im2col", im2col_form), ("mm8", matmul8_form)]:
        f = jax.jit(fn)
        y = f(x, w).astype(jnp.float32)
        if ref is None:
            ref = y
        d = float(jnp.max(jnp.abs(y - ref)))
        t = timeit(f, x, w)
        line += f" {name} {t:6.3f}ms({flops/t/1e9:5.1f}TF/s,d={d:.3f})"
    print(line)

    # fwd+bwd comparison (what the train step pays)
    line = "    fwd+bwd:"
    for name, fn in [("conv", conv_form), ("im2col", im2col_form), ("mm8", matmul8_form)]:
        g = jax.jit(jax.grad(lambda a, b, fn=fn: jnp.sum(fn(a, b).astype(jnp.float32) ** 2), argnums=(0, 1)))
        t = timeit(lambda a, b: g(a, b)[0], x, w)
        line += f" {name} {t:6.3f}ms"
    print(line)
