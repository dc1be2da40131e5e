"""Streaming anytime API + classifier step + multi-object collation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from anytime3d_tpu.anytime import AnytimeReconstructor
from anytime3d_tpu.models.mmvae import MultiModalVAE
from anytime3d_tpu.train import LossConfig, create_train_state, make_train_step

from tests.test_train import synth_batch, tiny_voxel_cfg


class TestAnytimeReconstructor:
    def setup_method(self):
        model = MultiModalVAE(tiny_voxel_cfg(variational=True, with_prior=True))
        batch = synth_batch(n=8)
        state = create_train_state(model, batch["input"], jax.random.PRNGKey(0), learning_rate=3e-3)
        step = make_train_step(model, LossConfig(), donate=False)
        for i in range(10):
            state, _ = step(state, batch, jax.random.PRNGKey(i))
        self.rec = AnytimeReconstructor(model, state.params)
        self.batch = batch
        self.model = model

    def test_streaming_observation_loop(self):
        belief = self.rec.new_object()
        rng = np.random.default_rng(0)
        mean, lv = self.rec.encode_observation(self.batch["input"][:1])
        mean, lv = mean[0], lv[0]
        uncert = []
        for t in range(4):
            mask = jnp.asarray((rng.uniform(size=mean.shape) > 0.5).astype(np.float32))
            belief = self.rec.observe(belief, mean, lv, mask)
            uncert.append(float(jnp.sum(1.0 / belief.precision)))
        # monotone uncertainty reduction
        assert all(b <= a + 1e-6 for a, b in zip(uncert, uncert[1:]))
        shape = self.rec.decode(belief)
        assert shape.shape[-4:] == (16, 16, 16, 1)

    def test_observe_stream_matches_loop_and_shards(self):
        from anytime3d_tpu.parallel import make_mesh

        belief0 = self.rec.new_object()
        rng = np.random.default_rng(1)
        mean, lv = self.rec.encode_observation(self.batch["input"][:1])
        mean, lv = mean[0], lv[0]
        T = 8
        means = jnp.stack([mean + 0.01 * t for t in range(T)])
        lvs = jnp.stack([lv for _ in range(T)])
        masks = jnp.asarray(
            (rng.uniform(size=(T,) + mean.shape) > 0.5).astype(np.float32)
        )
        loop = belief0
        for t in range(T):
            loop = self.rec.observe(loop, means[t], lvs[t], masks[t])
        stream = self.rec.observe_stream(belief0, means, lvs, masks)
        np.testing.assert_allclose(
            np.asarray(stream.precision), np.asarray(loop.precision), rtol=1e-5
        )
        sharded = self.rec.observe_stream(
            belief0, means, lvs, masks, mesh=make_mesh(data=8, model=1)
        )
        np.testing.assert_allclose(
            np.asarray(sharded.mean), np.asarray(loop.mean), rtol=1e-4, atol=1e-6
        )

    def test_classify_returns_index(self):
        belief = self.rec.new_object()
        mean, lv = self.rec.encode_observation(self.batch["input"][:1])
        belief = self.rec.observe(belief, mean[0], lv[0])
        label = self.rec.classify(belief)
        assert 0 <= int(label[0]) < 5

    def test_correct_fills_unobserved(self):
        belief = self.rec.new_object()
        mean, lv = self.rec.encode_observation(self.batch["input"][:1])
        mask = jnp.asarray([1.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0, 0.0])
        belief = self.rec.observe(belief, mean[0], lv[0], mask)
        corrected = self.rec.correct(belief)
        # observed dims unchanged (prior fused only where mask==0)
        assert np.allclose(
            np.asarray(corrected.mean)[:4], np.asarray(belief.mean)[:4], atol=1e-5
        )
        # unobserved dims now informative
        assert (np.asarray(corrected.precision)[4:] > 0.5).all()


class TestClassifierStep:
    def test_classifier_trains(self):
        from anytime3d_tpu.models.classifier import Classifier, ClassifierConfig
        from anytime3d_tpu.train.classifier_step import (
            ClassifierLossConfig,
            make_classifier_train_step,
        )

        model = Classifier(ClassifierConfig(num_classes=4, backbone="darknet53tiny"))
        rng = np.random.default_rng(0)
        batch = {
            "images": jnp.asarray(rng.uniform(size=(8, 64, 64, 3)).astype(np.float32)),
            "labels": jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, 8)]),
        }
        state = create_train_state(model, batch["images"], jax.random.PRNGKey(0), learning_rate=1e-4)
        step = make_classifier_train_step(model, ClassifierLossConfig(), donate=False)
        first = None
        for i in range(15):
            state, m = step(state, batch)
            if first is None:
                first = float(m["loss_ce"])
        assert float(m["loss_ce"]) < first
        assert 0.0 <= float(m["top1"]) <= 1.0


class TestCollate:
    def test_pads_and_clamps(self):
        from anytime3d_tpu.data.collate import collate_multiobject

        b, gh, gw, p = 2, 2, 2, 3
        targets = {
            "objness": np.zeros((b, gh, gw, p, 1), np.float32),
            "bbox": np.zeros((b, gh, gw, p, 4), np.float32),
            "sin": np.zeros((b, gh, gw, p, 3), np.float32),
            "cos": np.zeros((b, gh, gw, p, 3), np.float32),
            "inst": np.zeros((b, gh, gw, p, 10), np.float32),
            "voxel_slot": np.full((b, gh, gw, p), -1, np.int32),
        }
        targets["voxel_slot"][0, 0, 0, 0] = 0
        targets["voxel_slot"][0, 0, 1, 0] = 3  # overflows max_slots=2
        voxel_lists = [
            np.ones((4, 8, 8, 8, 1), np.float32),
            np.ones((1, 8, 8, 8, 1), np.float32),
        ]
        images = np.zeros((b, 32, 32, 3), np.float32)
        out = collate_multiobject(images, targets, voxel_lists, max_slots=2)
        assert out["voxels"].shape == (2, 2, 8, 8, 8, 1)
        assert out["voxel_slot"][0, 0, 0, 0] == 0
        assert out["voxel_slot"][0, 0, 1, 0] == -1  # overflow dropped
