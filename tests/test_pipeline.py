"""Bit-packing and end-to-end scene pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np

from anytime3d_tpu.data.packing import pack_voxels, unpack_voxels
from anytime3d_tpu.models.detector import DetectorReconstructor
from anytime3d_tpu.models.pipeline import scene_reconstruction

from tests.test_detector import tiny_detector


class TestPacking:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        vox = (rng.uniform(size=(4, 16, 16, 16, 1)) > 0.7).astype(np.float32)
        packed = pack_voxels(vox)
        assert packed.dtype == np.uint8
        assert packed.shape == (4, 16 * 16 * 16 // 8)
        out = np.asarray(unpack_voxels(jnp.asarray(packed), (16, 16, 16, 1)))
        assert np.array_equal(out, vox)

    def test_compression_ratio(self):
        vox = np.zeros((2, 64, 64, 64), np.float32)
        packed = pack_voxels(vox)
        assert vox.nbytes / packed.nbytes == 32.0

    def test_non_multiple_of_8(self):
        vox = (np.random.default_rng(1).uniform(size=(2, 3, 3, 3)) > 0.5).astype(np.float32)
        out = np.asarray(unpack_voxels(jnp.asarray(pack_voxels(vox)), (3, 3, 3)))
        assert np.array_equal(out, vox)

    def test_unpack_inside_jit(self):
        vox = (np.random.default_rng(2).uniform(size=(2, 8, 8, 8)) > 0.5).astype(np.float32)
        packed = jnp.asarray(pack_voxels(vox))
        fn = jax.jit(lambda p: unpack_voxels(p, (8, 8, 8)).sum())
        assert float(fn(packed)) == vox.sum()


class TestScenePipeline:
    def test_end_to_end_shapes(self):
        model = tiny_detector()
        image = jnp.asarray(
            np.random.default_rng(0).uniform(size=(1, 64, 64, 3)).astype(np.float32)
        )
        params = model.init(
            jax.random.PRNGKey(0), image, method=DetectorReconstructor.initialize
        )["params"]
        out = scene_reconstruction(
            model, params, image, jax.random.PRNGKey(1),
            image_size_px=(1242, 375), obj_thresh=0.0,
        )
        k = model.config.max_detections
        assert out["shapes"].shape == (k, 16, 16, 16)
        assert out["pose"].shape == (k, 4, 4)
        assert out["valid"].shape == (k,)
        assert out["bbox3d_corners_px"].shape == (k, 8, 2)

    def test_jit_compiles_once(self):
        model = tiny_detector()
        image = jnp.zeros((1, 64, 64, 3))
        params = model.init(
            jax.random.PRNGKey(0), image, method=DetectorReconstructor.initialize
        )["params"]
        fn = jax.jit(
            lambda p, im, k: scene_reconstruction(
                model, p, im, k, image_size_px=(640, 480)
            )
        )
        out1 = fn(params, image, jax.random.PRNGKey(0))
        out2 = fn(params, image + 0.1, jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(out2["pose"])).all()


class TestMultihostHelpers:
    def test_single_process_defaults(self):
        from anytime3d_tpu.parallel.multihost import host_local_batch_slice, initialize

        idx, count = initialize()
        assert idx == 0 and count == 1
        start, size = host_local_batch_slice(32)
        assert start == 0 and size == 32

    def test_make_global_batch_on_mesh(self):
        from anytime3d_tpu.parallel import make_mesh
        from anytime3d_tpu.parallel.multihost import make_global_batch

        mesh = make_mesh(data=8, model=1)
        local = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
        global_batch = make_global_batch(local, mesh)
        assert global_batch["x"].shape == (16, 1)
        assert len(global_batch["x"].sharding.device_set) == 8
