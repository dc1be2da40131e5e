"""Kernel layer tests: subpixel deconv equivalence + gradients."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from anytime3d_tpu.kernels import (
    SubpixelDeconv3D,
    convtranspose_kernel_to_subpixel,
    subpixel_deconv3d,
)


class TestSubpixelDeconv:
    def test_bit_equivalence_with_flax_convtranspose(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 3)).astype(np.float32))
        ct = nn.ConvTranspose(5, (4, 4, 4), strides=(2, 2, 2), padding="SAME", use_bias=False)
        params = ct.init(jax.random.PRNGKey(0), x)
        y_ref = ct.apply(params, x)
        w_sp = convtranspose_kernel_to_subpixel(params["params"]["kernel"])
        y_sp = subpixel_deconv3d(x, w_sp)
        assert y_sp.shape == y_ref.shape == (2, 8, 8, 8, 5)
        assert float(jnp.max(jnp.abs(y_sp - y_ref))) < 1e-5

    def test_equivalence_multiple_sizes(self):
        rng = np.random.default_rng(1)
        for d, cin, cout in [(2, 1, 1), (6, 4, 2)]:
            x = jnp.asarray(rng.normal(size=(1, d, d, d, cin)).astype(np.float32))
            ct = nn.ConvTranspose(cout, (4, 4, 4), strides=(2, 2, 2), padding="SAME", use_bias=False)
            params = ct.init(jax.random.PRNGKey(d), x)
            y_ref = ct.apply(params, x)
            y_sp = subpixel_deconv3d(
                x, convtranspose_kernel_to_subpixel(params["params"]["kernel"])
            )
            assert float(jnp.max(jnp.abs(y_sp - y_ref))) < 1e-5, (d, cin, cout)

    def test_module_shapes_and_grad(self):
        model = SubpixelDeconv3D(features=6)
        x = jnp.ones((2, 4, 4, 4, 3))
        params = model.init(jax.random.PRNGKey(0), x)
        y = model.apply(params, x)
        assert y.shape == (2, 8, 8, 8, 6)
        g = jax.grad(lambda p: float(0) + jnp.sum(model.apply(p, x) ** 2))(params)
        total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(g))
        assert total > 0

    def test_param_count_matches_transposed_conv(self):
        model = SubpixelDeconv3D(features=8)
        x = jnp.ones((1, 4, 4, 4, 16))
        params = model.init(jax.random.PRNGKey(0), x)
        n = sum(l.size for l in jax.tree_util.tree_leaves(params))
        assert n == 4 * 4 * 4 * 16 * 8  # same as ConvTranspose(8, (4,4,4))


class TestConvK2:
    """Pallas fused 2x2x2 s=1 conv vs the XLA oracle (interpret mode on CPU)."""

    def _check(self, B, D, C, N, seed=0, tol=2e-4):
        from anytime3d_tpu.kernels.conv_k2 import conv_k2, conv_k2_xla

        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(B, D, D, D, C)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(2, 2, 2, C, N)).astype(np.float32) * 0.1)
        y = conv_k2(x, w)
        y_ref = conv_k2_xla(x, w)
        assert y.shape == y_ref.shape
        assert float(jnp.max(jnp.abs(y - y_ref))) < tol, (B, D, C, N)

    def test_im2col_path(self):
        # 8C <= 1024 -> im2col strategy
        self._check(2, 4, 8, 16)

    def test_matmul8_path(self):
        # 8C > 1024 -> per-tap matmul strategy
        self._check(1, 4, 136, 8)

    def test_boundary_masking_nonuniform(self):
        # D=H=W=4 exercises every h/w/d boundary row of the tap masks
        self._check(1, 4, 8, 8, seed=3)

    def test_fallback_small_channels(self):
        # min(C, N) < 8 falls back to XLA (still correct by construction)
        self._check(2, 4, 4, 8)

    def test_gradients_match_xla(self):
        from anytime3d_tpu.kernels.conv_k2 import conv_k2, conv_k2_xla

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 8)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(2, 2, 2, 8, 16)).astype(np.float32) * 0.1)
        g = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 16)).astype(np.float32))

        def loss(fn, x, w):
            return jnp.sum(fn(x, w) * g)

        dx_p, dw_p = jax.grad(lambda a, b: loss(conv_k2, a, b), argnums=(0, 1))(x, w)
        dx_r, dw_r = jax.grad(lambda a, b: loss(conv_k2_xla, a, b), argnums=(0, 1))(x, w)
        assert float(jnp.max(jnp.abs(dx_p - dx_r))) < 2e-4
        assert float(jnp.max(jnp.abs(dw_p - dw_r))) < 2e-4

    def test_jit_and_vmap_safe_under_jit(self):
        from anytime3d_tpu.kernels.conv_k2 import conv_k2, conv_k2_xla

        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 4, 8)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(2, 2, 2, 8, 8)).astype(np.float32) * 0.1)
        y = jax.jit(conv_k2)(x, w)
        y_ref = conv_k2_xla(x, w)
        assert float(jnp.max(jnp.abs(y - y_ref))) < 2e-4
