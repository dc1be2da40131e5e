"""Dump artifacts, viz drawing, orientation anchors."""

import os

import jax
import numpy as np
import pytest

from anytime3d_tpu.evaluation import dump_reconstructions
from anytime3d_tpu.models.mmvae import MultiModalVAE
from anytime3d_tpu.train import create_train_state

from tests.test_train import synth_batch, tiny_voxel_cfg

try:
    import cv2
except Exception:
    cv2 = None


class TestDump:
    def test_dump_files_and_contents(self, tmp_path):
        model = MultiModalVAE(tiny_voxel_cfg(variational=True, with_prior=True))
        batch = synth_batch(n=4)
        state = create_train_state(model, batch["input"], jax.random.PRNGKey(0))
        paths = dump_reconstructions(
            model, state.params, batch, str(tmp_path), rates=(0.3, 0.7)
        )
        assert set(paths) == {"0.3", "0.7"}
        data = np.load(paths["0.3"])
        assert data["gt"].shape == (4, 16, 16, 16, 1)
        assert data["pred"].shape == (4, 16, 16, 16, 1)
        assert "pred_corrected" in data and "pred_class" in data
        assert 0.0 <= data["pred"].min() and data["pred"].max() <= 1.0


class TestViz:
    @pytest.mark.skipif(cv2 is None, reason="cv2 unavailable")
    def test_draw_boxes(self):
        from anytime3d_tpu.evaluation.viz import draw_bbox2d, draw_bbox3d

        img = np.zeros((100, 100, 3), np.uint8)
        out = draw_bbox2d(img, [10, 10, 60, 60])
        assert out.sum() > 0
        corners = np.array(
            [[20, 20], [20, 40], [40, 20], [40, 40], [25, 25], [25, 45], [45, 25], [45, 45]]
        )
        out2 = draw_bbox3d(img, corners)
        assert out2.sum() > out.sum() * 0  # drew something


class TestOrientationAnchors:
    def test_anchor_computation(self):
        from anytime3d_tpu.data.pascal3d import ObjRecord, orientation_anchors

        rng = np.random.default_rng(0)
        base = np.array([[0.2, 1.1, -0.9], [2.2, -0.4, 0.6]])
        records = []
        for i in range(200):
            ang = base[i % 2] + rng.normal(0, 0.05, 3)
            records.append(
                ObjRecord("car", "x.jpg", 1, (0, 0, 1, 1), tuple(ang))
            )
        centres = orientation_anchors(records, k=2, max_iter=30, seed=0)
        assert centres.shape == (2, 6)
        # centres lie near the unit circle per angle
        s, c = centres[:, :3], centres[:, 3:]
        assert np.all(np.abs(s**2 + c**2 - 1.0) < 0.1)
