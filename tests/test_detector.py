"""Detector-reconstructor tests: grid decode, selection/NMS, shape decode."""

import jax
import jax.numpy as jnp
import numpy as np

from anytime3d_tpu.models.detector import DetectorConfig, DetectorReconstructor
from anytime3d_tpu.nn.autoencoder3d import Decoder3DConfig

KEY = jax.random.PRNGKey(0)


def tiny_detector(z=4, p=3):
    return DetectorReconstructor(
        DetectorConfig(
            predictor_num=p,
            z_inst_dim=z,
            predict_log_var=True,
            backbone="darknet53tiny",
            head_filter_nums=(32,),
            head_filter_sizes=(3,),
            decoder=Decoder3DConfig(
                input_dim=z, output_shape=(16, 16, 16, 1), filter_nums=(16, 8, 1),
                filter_sizes=(3, 3, 3), strides=(1, 2, 2),
            ),
            max_detections=8,
            shape_samples=4,
        )
    )


class TestDetector:
    def setup_method(self):
        self.model = tiny_detector()
        self.images = jnp.asarray(
            np.random.default_rng(0).uniform(size=(1, 64, 64, 3)).astype(np.float32)
        )
        self.params = self.model.init(
            KEY, self.images, method=DetectorReconstructor.initialize
        )["params"]

    def test_grid_field_shapes(self):
        fields = self.model.apply({"params": self.params}, self.images)
        # 64/32 = 2x2 grid, 3 predictors
        assert fields["objness"].shape == (1, 2, 2, 3, 1)
        assert fields["bbox2d"].shape == (1, 2, 2, 3, 4)
        assert fields["bbox3d"].shape == (1, 2, 2, 3, 3)
        assert fields["z_mean"].shape == (1, 2, 2, 3, 4)
        assert fields["ori_sin"].shape == (1, 2, 2, 3, 3)

    def test_field_activation_ranges(self):
        fields = self.model.apply({"params": self.params}, self.images)
        obj = np.asarray(fields["objness"])
        assert (obj >= 0).all() and (obj <= 1).all()
        assert (np.asarray(fields["bbox3d"]) >= 0).all()
        sin = np.asarray(fields["ori_sin"])
        assert (sin >= -1).all() and (sin <= 1).all()
        # bbox2d h,w are exp-decoded (positive); x,y sigmoid in [0,1]
        b = np.asarray(fields["bbox2d"])
        assert (b[..., :2] > 0).all()
        assert (b[..., 2:] >= 0).all() and (b[..., 2:] <= 1).all()

    def test_detect_fixed_size_output(self):
        det = self.model.apply(
            {"params": self.params}, self.images, 0.0, 0.5,
            method=DetectorReconstructor.detect,
        )
        k = 8
        assert det["bbox2d"].shape == (k, 5)
        assert det["valid"].shape == (k,)
        assert det["z_mean"].shape == (k, 4)
        # with threshold 0 and top-1-per-cell, up to 4 cells can be valid
        assert int(det["valid"].sum()) <= 4

    def test_detect_jit(self):
        fn = jax.jit(
            lambda p, im: self.model.apply(
                {"params": p}, im, 0.5, 0.5, method=DetectorReconstructor.detect
            )
        )
        det = fn(self.params, self.images)
        assert det["valid"].dtype == bool

    def test_reconstruct_shapes(self):
        z_mean = jnp.zeros((5, 4))
        z_lv = jnp.zeros((5, 4))
        vox = self.model.apply(
            {"params": self.params}, KEY, z_mean, z_lv,
            method=DetectorReconstructor.reconstruct,
        )
        assert vox.shape == (5, 16, 16, 16)
        v = np.asarray(vox)
        assert (v >= 0).all() and (v <= 1).all()

    def test_reconstruct_sample_averaging_reduces_variance(self):
        z_mean = jnp.zeros((2, 4))
        z_lv = jnp.full((2, 4), 2.0)
        single = self.model.apply(
            {"params": self.params}, KEY, z_mean, z_lv, False,
            method=DetectorReconstructor.reconstruct,
        )
        avg = self.model.apply(
            {"params": self.params}, KEY, z_mean, z_lv, True,
            method=DetectorReconstructor.reconstruct,
        )
        assert single.shape == avg.shape
