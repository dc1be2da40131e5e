"""Blocked-IO train path: the coarse s2d/d2s layout round-trip must be
numerically identical (a pure permutation) to the classic fine-grid path.

Covers data/packing.py::{pack,unpack}_voxels_blocked, the blocked_input /
blocked_output flags on Encoder3D/Decoder3D, and the end-to-end loss
equivalence in train/step.py::compute_losses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anytime3d_tpu.data.packing import (
    blocked_shape,
    pack_voxels,
    pack_voxels_blocked,
    unpack_voxels_blocked,
)
from anytime3d_tpu.models.configs import modelnet_nolbo
from anytime3d_tpu.models.mmvae import MMVAEConfig, MultiModalVAE, blocked_io_block
from anytime3d_tpu.nn.autoencoder3d import (
    Decoder3D,
    Decoder3DConfig,
    Encoder3D,
    Encoder3DConfig,
    depth_to_space3d,
    space_to_depth3d,
)
from anytime3d_tpu.nn.priornet import PriorNetConfig
from anytime3d_tpu.train import LossConfig, create_train_state
from anytime3d_tpu.train.step import compute_losses


def _blocked_cfg(z=8, n_cat=4):
    return MMVAEConfig(
        z_category_dim=0,
        z_inst_dim=z,
        category_dim=n_cat,
        encoder="voxel",
        encoder3d=Encoder3DConfig(
            output_dim=2 * z,
            filter_nums=(8, 16),
            filter_sizes=(4, 4, 4),
            strides=(2, 2, 1),
            head_blocked=True,
        ),
        decoder=Decoder3DConfig(
            input_dim=z,
            output_shape=(16, 16, 16, 1),
            filter_nums=(16, 8, 1),
            filter_sizes=(4, 4, 4),
            strides=(1, 2, 2),
            final_mode="pixel_shuffle",
            tail_blocked=True,
        ),
        prior_category=PriorNetConfig(input_dim=n_cat, unit_nums=(16, z), const_log_var=0.0),
        variational=True,
    )


def _vox(b=4, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.uniform(size=(b, d, d, d, 1)) > 0.7).astype(np.float32)


class TestBlockedPacking:
    def test_roundtrip_matches_s2d(self):
        vox = _vox()
        packed = pack_voxels_blocked(vox, block=4)
        out = np.asarray(unpack_voxels_blocked(jnp.asarray(packed), (16, 16, 16, 1), 4))
        expect = np.asarray(space_to_depth3d(jnp.asarray(vox), 4))
        np.testing.assert_array_equal(out, expect)

    def test_same_bytes_as_linear_pack(self):
        vox = _vox()
        assert pack_voxels_blocked(vox).nbytes == pack_voxels(vox).nbytes

    def test_blocked_shape_validates(self):
        assert blocked_shape((16, 16, 16, 1), 4) == (4, 4, 4, 64)
        with pytest.raises(ValueError):
            blocked_shape((15, 16, 16, 1), 4)


class TestBlockedModules:
    def test_encoder_blocked_input_identical(self):
        cfg = _blocked_cfg().encoder3d
        enc = Encoder3D(cfg)
        vox = jnp.asarray(_vox())
        params = enc.init(jax.random.PRNGKey(0), vox)
        a = enc.apply(params, vox)
        b = enc.apply(params, space_to_depth3d(vox, 4), blocked_input=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_decoder_blocked_output_is_d2s_pending(self):
        cfg = _blocked_cfg().decoder
        dec = Decoder3D(cfg)
        z = jax.random.normal(jax.random.PRNGKey(1), (4, cfg.input_dim))
        params = dec.init(jax.random.PRNGKey(0), z)
        fine = dec.apply(params, z)
        coarse = dec.apply(params, z, blocked_output=True)
        assert coarse.shape == (4, 4, 4, 4, 64)
        np.testing.assert_allclose(
            np.asarray(depth_to_space3d(coarse, 4)), np.asarray(fine), rtol=1e-6
        )

    def test_flags_rejected_off_blocked_path(self):
        enc = Encoder3D(Encoder3DConfig(output_dim=8, filter_nums=(8,),
                                        filter_sizes=(4, 4), strides=(2, 1)))
        vox = jnp.asarray(_vox())
        with pytest.raises(ValueError):
            enc.init(jax.random.PRNGKey(0), vox, blocked_input=True)
        dec = Decoder3D(Decoder3DConfig(input_dim=8, output_shape=(16, 16, 16, 1),
                                        filter_nums=(8, 1), filter_sizes=(4, 4),
                                        strides=(2, 2), tail_blocked=False))
        z = jnp.zeros((2, 8))
        with pytest.raises(ValueError):
            dec.init(jax.random.PRNGKey(0), z, blocked_output=True)

    def test_eligibility(self):
        assert blocked_io_block(_blocked_cfg()) == 4
        assert blocked_io_block(modelnet_nolbo()) == 4  # flagship ships blocked
        plain = _blocked_cfg()
        import dataclasses

        no_tail = dataclasses.replace(
            plain, decoder=dataclasses.replace(plain.decoder, tail_blocked=False)
        )
        assert blocked_io_block(no_tail) is None


class TestBlockedLossEquivalence:
    def _setup(self):
        cfg = _blocked_cfg()
        model = MultiModalVAE(cfg)
        vox = _vox()
        labels = np.eye(4, dtype=np.float32)[np.random.default_rng(1).integers(0, 4, 4)]
        state = create_train_state(model, jnp.asarray(vox), jax.random.PRNGKey(0))
        return model, state.params, vox, labels

    def test_dense_vs_packed_blocked_identical(self):
        model, params, vox, labels = self._setup()
        key = jax.random.PRNGKey(7)
        dense = {
            "input": jnp.asarray(vox),
            "target": jnp.asarray(vox),
            "category_onehot": jnp.asarray(labels),
        }
        packed = {
            "input_packed_blocked": jnp.asarray(pack_voxels_blocked(vox)),
            "category_onehot": jnp.asarray(labels),
        }
        _, m_dense = compute_losses(model, LossConfig(), params, dense, key, True)
        _, m_packed = compute_losses(model, LossConfig(), params, packed, key, True)
        for k in m_dense:
            np.testing.assert_allclose(
                float(m_dense[k]), float(m_packed[k]), rtol=1e-5, err_msg=k
            )

    def test_blocked_matches_classic_fine_grid_loss(self):
        """The blocked path's shape loss equals the loss computed the classic
        way (decode to the fine grid, no blocked flags) with the same params
        and the same latent draw."""
        model, params, vox, labels = self._setup()
        key = jax.random.PRNGKey(3)
        batch = {
            "input": jnp.asarray(vox),
            "target": jnp.asarray(vox),
            "category_onehot": jnp.asarray(labels),
        }
        _, metrics = compute_losses(model, LossConfig(), params, batch, key, True)

        # classic path: encode fine grid, decode to fine grid, focal loss —
        # with the SAME latent draw (mirror the step's key split: the inst
        # key is the 2nd of 5, train/step.py::_encode_and_sample)
        from anytime3d_tpu.ops import focal_binary_loss, voxel_tp_fp_fn
        from anytime3d_tpu.ops.sampling import reparameterize

        _, k_inst, _, _, _ = jax.random.split(key, 5)
        enc = model.apply({"params": params}, batch["input"], method=MultiModalVAE.encode)
        z = reparameterize(k_inst, enc.mean, enc.log_var)
        pred = model.apply({"params": params}, z, method=MultiModalVAE.decode)
        loss_shape = float(jnp.mean(focal_binary_loss(
            pred.astype(jnp.float32), batch["target"].astype(jnp.float32), gamma=0.6
        )))
        np.testing.assert_allclose(float(metrics["loss_shape"]), loss_shape, rtol=1e-5)
        tp, fp, fn = voxel_tp_fp_fn(batch["target"], pred)
        np.testing.assert_allclose(
            float(metrics["precision"]),
            float(jnp.mean(tp / (tp + fp + 1e-10))),
            rtol=1e-5,
        )

    def test_packed_blocked_rejected_for_classic_model(self):
        import dataclasses

        cfg = _blocked_cfg()
        classic = dataclasses.replace(
            cfg,
            encoder3d=dataclasses.replace(cfg.encoder3d, head_blocked=False),
            decoder=dataclasses.replace(cfg.decoder, tail_blocked=False),
        )
        model = MultiModalVAE(classic)
        vox = _vox()
        state = create_train_state(model, jnp.asarray(vox), jax.random.PRNGKey(0))
        batch = {
            "input_packed_blocked": jnp.asarray(pack_voxels_blocked(vox)),
            "category_onehot": jnp.asarray(np.eye(4, dtype=np.float32)[[0, 1, 2, 3]]),
        }
        with pytest.raises(ValueError):
            compute_losses(model, LossConfig(), state.params, batch, jax.random.PRNGKey(0), True)


class TestTargetPacked:
    """Explicit packed targets (image->shape loaders): target_packed must
    equal the dense-target batch bit-for-bit, in both model layouts."""

    def test_target_packed_matches_dense_blocked_model(self):
        helper = TestBlockedLossEquivalence()
        model, params, vox, labels = helper._setup()
        key = jax.random.PRNGKey(11)
        rng = np.random.default_rng(3)
        tgt = (rng.uniform(size=vox.shape) > 0.6).astype(np.float32)
        dense = {
            "input": jnp.asarray(vox),
            "target": jnp.asarray(tgt),
            "category_onehot": jnp.asarray(labels),
        }
        packed = {
            "input_packed_blocked": jnp.asarray(pack_voxels_blocked(vox)),
            "target_packed": jnp.asarray(pack_voxels(tgt)),
            "category_onehot": jnp.asarray(labels),
        }
        _, m_dense = compute_losses(model, LossConfig(), params, dense, key, True)
        _, m_packed = compute_losses(model, LossConfig(), params, packed, key, True)
        for k in m_dense:
            np.testing.assert_allclose(
                float(m_dense[k]), float(m_packed[k]), rtol=1e-5, err_msg=k
            )


class TestImageBlockedTarget:
    """Image->shape with a blocked-tail decoder: the voxel loss runs in the
    coarse d2s layout (r4, the image-family bench fix) — every transfer form
    of the target must give the identical metrics."""

    def _setup(self, tail_blocked=True):
        from anytime3d_tpu.nn.heads import Head2DConfig

        z = 8
        cfg = MMVAEConfig(
            z_category_dim=0,
            z_inst_dim=z,
            encoder="image",
            backbone="darknet19",
            head=Head2DConfig(output_dim=2 * z, filter_nums=(), filter_sizes=(),
                              last_pooling="max"),
            decoder=Decoder3DConfig(
                input_dim=z,
                output_shape=(16, 16, 16, 1),
                filter_nums=(16, 8, 1),
                filter_sizes=(4, 4, 4),
                strides=(1, 2, 2),
                final_mode="pixel_shuffle",
                tail_blocked=tail_blocked,
            ),
            variational=True,
        )
        model = MultiModalVAE(cfg)
        rng = np.random.default_rng(7)
        images = rng.uniform(size=(4, 32, 32, 3)).astype(np.float32)
        tgt = (rng.uniform(size=(4, 16, 16, 16, 1)) > 0.6).astype(np.float32)
        state = create_train_state(model, jnp.asarray(images), jax.random.PRNGKey(0))
        return model, state.params, images, tgt

    def test_all_target_forms_identical(self):
        model, params, images, tgt = self._setup()
        assert model.decoder_block == 4 and model.blocked_io_block is None
        key = jax.random.PRNGKey(5)
        forms = {
            "dense": {"target": jnp.asarray(tgt)},
            "packed": {"target_packed": jnp.asarray(pack_voxels(tgt))},
            "packed_blocked": {
                "target_packed_blocked": jnp.asarray(pack_voxels_blocked(tgt))
            },
        }
        metrics = {}
        for name, t in forms.items():
            batch = {"input": jnp.asarray(images), **t}
            _, metrics[name] = compute_losses(
                model, LossConfig(), params, batch, key, True
            )
        for name in ("packed", "packed_blocked"):
            for k in metrics["dense"]:
                np.testing.assert_allclose(
                    float(metrics["dense"][k]), float(metrics[name][k]),
                    rtol=1e-5, err_msg=f"{name}:{k}",
                )

    def test_packed_blocked_target_rejected_for_classic_decoder(self):
        model, params, images, tgt = self._setup(tail_blocked=False)
        batch = {
            "input": jnp.asarray(images),
            "target_packed_blocked": jnp.asarray(pack_voxels_blocked(tgt)),
        }
        with pytest.raises(ValueError):
            compute_losses(model, LossConfig(), params, batch, jax.random.PRNGKey(0), True)
