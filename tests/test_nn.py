"""Shape/dtype golden tests for net cores (SURVEY.md §4b)."""

import jax
import jax.numpy as jnp
import numpy as np

from anytime3d_tpu.nn import (
    Darknet19,
    Darknet53,
    Darknet53Tiny,
    Decoder3D,
    Decoder3DConfig,
    Encoder3D,
    Encoder3DConfig,
    Head2D,
    PriorNet,
    PriorNetConfig,
)

KEY = jax.random.PRNGKey(0)


def test_darknet19_stride32():
    model = Darknet19()
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(KEY, x)["params"]
    y = model.apply({"params": params}, x)
    assert y.shape == (1, 2, 2, 1024)


def test_darknet53_multiscale():
    model = Darknet53()
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(KEY, x)["params"]
    x36, x61, y = model.apply({"params": params}, x)
    assert x36.shape == (1, 8, 8, 256)
    assert x61.shape == (1, 4, 4, 512)
    assert y.shape == (1, 2, 2, 1024)


def test_darknet53tiny():
    model = Darknet53Tiny()
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(KEY, x)["params"]
    x8, y = model.apply({"params": params}, x)
    assert x8.shape == (1, 4, 4, 256)
    assert y.shape == (1, 2, 2, 1024)


def test_head2d_pooling_modes():
    for pooling, expect in [("max", (2, 24)), ("average", (2, 24)), (None, (2, 4, 4, 24))]:
        model = Head2D(output_dim=24, filter_nums=(32,), filter_sizes=(3,), last_pooling=pooling)
        x = jnp.ones((2, 4, 4, 16))
        params = model.init(KEY, x)["params"]
        y = model.apply({"params": params}, x)
        assert y.shape == expect, pooling


def test_encoder3d_shapes():
    cfg = Encoder3DConfig(
        output_dim=16, filter_nums=(8, 16), filter_sizes=(3, 3, 3), strides=(2, 2, 1),
        final_pool="average",
    )
    model = Encoder3D(cfg)
    x = jnp.ones((2, 16, 16, 16, 1))
    params = model.init(KEY, x)["params"]
    y = model.apply({"params": params}, x)
    assert y.shape == (2, 16)


def test_encoder3d_space_to_depth_stem():
    base = dict(
        output_dim=16, filter_nums=(8, 16), filter_sizes=(4, 3, 3), strides=(2, 2, 1),
        final_pool="average",
    )
    x = jnp.ones((2, 16, 16, 16, 1))
    for s2d in (1, 2):
        cfg = Encoder3DConfig(**base, stem_space_to_depth=s2d)
        model = Encoder3D(cfg)
        params = model.init(KEY, x)["params"]
        y = model.apply({"params": params}, x)
        assert y.shape == (2, 16), s2d
    # the s2d stem kernel contracts over 8 input channels with a 2^3 window
    stem = params["ConvBlock3D_0"]["Conv_0"]["kernel"]
    assert stem.shape[:4] == (2, 2, 2, 8)


def test_encoder3d_blocked_head():
    cfg = Encoder3DConfig(
        output_dim=16, filter_nums=(8, 16), filter_sizes=(4, 4, 3), strides=(2, 2, 1),
        final_pool="average", head_blocked=True,
    )
    model = Encoder3D(cfg)
    x = jnp.ones((2, 16, 16, 16, 1))
    params = model.init(KEY, x)["params"]
    y = model.apply({"params": params}, x)
    assert y.shape == (2, 16)
    g = jax.grad(lambda p: jnp.sum(model.apply({"params": p}, x) ** 2))(params)
    assert all(jnp.all(jnp.isfinite(l)) for l in jax.tree_util.tree_leaves(g))


def test_decoder3d_blocked_tail_and_pixel_shuffle():
    import numpy as np

    base = dict(
        input_dim=8, output_shape=(16, 16, 16, 1), filter_nums=(16, 8, 1),
        filter_sizes=(3, 4, 4), strides=(1, 2, 2),
    )
    z = jax.random.normal(KEY, (2, 8))
    for mode, blocked in (("transpose", False), ("pixel_shuffle", False), ("pixel_shuffle", True)):
        cfg = Decoder3DConfig(**base, final_mode=mode, tail_blocked=blocked)
        model = Decoder3D(cfg)
        params = model.init(KEY, z)["params"]
        y = model.apply({"params": params}, z)
        assert y.shape == (2, 16, 16, 16, 1), (mode, blocked)
        yn = np.asarray(y)
        assert yn.min() >= 0.0 and yn.max() <= 1.0  # sigmoid output
        assert yn.std() > 0


def test_decoder3d_shapes_and_range():
    cfg = Decoder3DConfig(
        input_dim=8, output_shape=(16, 16, 16, 1), filter_nums=(16, 8, 1),
        filter_sizes=(3, 3, 3), strides=(1, 2, 2),
    )
    model = Decoder3D(cfg)
    z = jax.random.normal(KEY, (2, 8))
    params = model.init(KEY, z)["params"]
    y = model.apply({"params": params}, z)
    assert y.shape == (2, 16, 16, 16, 1)
    y = np.asarray(y)
    assert (y >= 0).all() and (y <= 1).all()  # sigmoid occupancy


def test_decoder3d_reference_channel_rule():
    """Reference: conv input channels = max(filters[0]/64, 8) (autoencoder3D.py:115-120)."""
    cfg = Decoder3DConfig(
        input_dim=4, output_shape=(16, 16, 16, 1), filter_nums=(512, 1),
        filter_sizes=(3, 3), strides=(2, 2),
    )
    model = Decoder3D(cfg)
    z = jnp.ones((1, 4))
    params = model.init(KEY, z)["params"]
    # dense output = (16/4)^3 * max(512/64, 8) = 64 * 8
    dense_kernel = params["DenseBlock_0"]["Dense_0"]["kernel"]
    assert dense_kernel.shape == (4, 64 * 8)


def test_priornet_const_log_var():
    cfg = PriorNetConfig(input_dim=5, unit_nums=(16, 4), const_log_var=0.0)
    model = PriorNet(cfg)
    onehot = jnp.eye(5)
    params = model.init(KEY, onehot)["params"]
    mean, log_var = model.apply({"params": params}, onehot)
    assert mean.shape == (5, 4)
    assert np.allclose(np.asarray(log_var), 0.0)
    assert "log_var_tower" not in params


def test_priornet_learned_log_var_and_dropout():
    cfg = PriorNetConfig(input_dim=5, unit_nums=(16, 4), const_log_var=None)
    model = PriorNet(cfg)
    onehot = jnp.eye(5)
    params = model.init({"params": KEY, "dropout": KEY}, onehot)["params"]
    assert "log_var_tower" in params
    m1, lv1 = model.apply({"params": params}, onehot, deterministic=True)
    # stochastic under dropout
    m2a, _ = model.apply(
        {"params": params}, onehot, False, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    m2b, _ = model.apply(
        {"params": params}, onehot, False, rngs={"dropout": jax.random.PRNGKey(2)}
    )
    assert not np.allclose(np.asarray(m2a), np.asarray(m2b))
    assert lv1.shape == (5, 4)


class TestMidBlocked:
    """mid_blocked: every stride-2 stage as s2d(2)/d2s(2) + k=2 s=1 conv —
    same linear family and PARAMETER COUNT as the classic stride-2 stages
    (4^3*Cin*Cout == 2^3*(8*Cin)*Cout, and transpose 4^3*Cin*Cout ==
    2^3*Cin*(8*Cout)), stride-1 MXU tiling, no dilated lowering in either
    direction."""

    def _enc_cfg(self, **kw):
        from anytime3d_tpu.nn.autoencoder3d import Encoder3DConfig

        return Encoder3DConfig(
            output_dim=16, filter_nums=(8, 16, 32), filter_sizes=(4, 4, 4, 4),
            strides=(2, 2, 2, 1), **kw,
        )

    def _dec_cfg(self, **kw):
        from anytime3d_tpu.nn.autoencoder3d import Decoder3DConfig

        return Decoder3DConfig(
            input_dim=8, output_shape=(32, 32, 32, 1),
            filter_nums=(32, 16, 8, 1), filter_sizes=(4, 4, 4, 4),
            strides=(1, 2, 2, 2), **kw,
        )

    def test_encoder_shapes_and_param_parity(self):
        import jax
        import numpy as np
        from anytime3d_tpu.nn.autoencoder3d import Encoder3D

        x = jnp.asarray(
            np.random.default_rng(0).uniform(size=(2, 32, 32, 32, 1)).astype(np.float32)
        )
        outs, counts = [], []
        for mid in (False, True):
            enc = Encoder3D(self._enc_cfg(mid_blocked=mid))
            params = enc.init(jax.random.PRNGKey(0), x)["params"]
            out = enc.apply({"params": params}, x)
            assert out.shape == (2, 16)
            assert np.isfinite(np.asarray(out)).all()
            counts.append(sum(p.size for p in jax.tree_util.tree_leaves(params)))
            outs.append(out)
        assert counts[0] == counts[1], counts

    def test_decoder_shapes_and_param_parity(self):
        import jax
        import numpy as np
        from anytime3d_tpu.nn.autoencoder3d import Decoder3D

        z = jnp.asarray(
            np.random.default_rng(0).uniform(size=(2, 8)).astype(np.float32)
        )
        counts = []
        for mid in (False, True):
            dec = Decoder3D(self._dec_cfg(mid_blocked=mid))
            params = dec.init(jax.random.PRNGKey(0), z)["params"]
            out = dec.apply({"params": params}, z)
            assert out.shape == (2, 32, 32, 32, 1)
            assert np.isfinite(np.asarray(out)).all()
            counts.append(sum(p.size for p in jax.tree_util.tree_leaves(params)))
        assert counts[0] == counts[1], counts

    def test_composes_with_blocked_head_tail(self):
        import jax
        import numpy as np
        from anytime3d_tpu.nn.autoencoder3d import Decoder3D, Encoder3D

        enc_cfg = self._enc_cfg(mid_blocked=True, head_blocked=True)
        dec_cfg = self._dec_cfg(mid_blocked=True, tail_blocked=True)
        x = jnp.asarray(
            np.random.default_rng(0).uniform(size=(2, 32, 32, 32, 1)).astype(np.float32)
        )
        enc = Encoder3D(enc_cfg)
        p = enc.init(jax.random.PRNGKey(0), x)["params"]
        assert enc.apply({"params": p}, x).shape == (2, 16)
        dec = Decoder3D(dec_cfg)
        z = jnp.zeros((2, 8))
        pd = dec.init(jax.random.PRNGKey(0), z)["params"]
        assert dec.apply({"params": pd}, z).shape == (2, 32, 32, 32, 1)

    def test_gradients_flow(self):
        import jax
        import numpy as np
        from anytime3d_tpu.nn.autoencoder3d import Decoder3D

        dec = Decoder3D(self._dec_cfg(mid_blocked=True))
        z = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8)).astype(np.float32))
        params = dec.init(jax.random.PRNGKey(0), z)["params"]
        g = jax.grad(lambda p: jnp.sum(dec.apply({"params": p}, z)))(params)
        norms = [float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)]
        assert all(np.isfinite(norms)) and max(norms) > 0
