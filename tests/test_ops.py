"""Unit tests for the ops library against NumPy oracles (SURVEY.md §4a)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anytime3d_tpu import ops


class TestReparameterize:
    def test_moments(self):
        key = jax.random.PRNGKey(0)
        mean = jnp.full((20000, 4), 2.0)
        log_var = jnp.full((20000, 4), np.log(0.25))
        z = ops.reparameterize(key, mean, log_var)
        assert np.allclose(np.mean(np.asarray(z)), 2.0, atol=0.02)
        assert np.allclose(np.std(np.asarray(z)), 0.5, atol=0.02)

    def test_deterministic_under_key(self):
        key = jax.random.PRNGKey(7)
        mean = jnp.zeros((8, 16))
        lv = jnp.zeros((8, 16))
        z1 = ops.reparameterize(key, mean, lv)
        z2 = ops.reparameterize(key, mean, lv)
        assert np.array_equal(np.asarray(z1), np.asarray(z2))


class TestGaussianKL:
    def test_zero_when_identical(self):
        m = jnp.array([[1.0, -2.0, 0.5]])
        lv = jnp.array([[0.3, -0.1, 0.0]])
        kl = ops.gaussian_kl(m, lv, m, lv)
        assert np.allclose(np.asarray(kl), 0.0, atol=1e-6)

    def test_closed_form_vs_numpy(self):
        rng = np.random.default_rng(0)
        m = rng.normal(size=(5, 8)).astype(np.float32)
        lv = rng.normal(size=(5, 8)).astype(np.float32) * 0.3
        mt = rng.normal(size=(5, 8)).astype(np.float32)
        lvt = rng.normal(size=(5, 8)).astype(np.float32) * 0.3
        expected = np.sum(
            0.5 * (lvt - lv) + (np.exp(lv) + (m - mt) ** 2) / (2.0 * np.exp(lvt)) - 0.5,
            axis=-1,
        )
        got = np.asarray(ops.gaussian_kl(jnp.asarray(m), jnp.asarray(lv), jnp.asarray(mt), jnp.asarray(lvt)))
        assert np.allclose(got, expected, rtol=1e-5, atol=1e-5)

    def test_nonnegative(self):
        rng = np.random.default_rng(1)
        m = rng.normal(size=(64, 16)).astype(np.float32)
        lv = rng.normal(size=(64, 16)).astype(np.float32)
        kl = np.asarray(ops.gaussian_kl(jnp.asarray(m), jnp.asarray(lv), jnp.zeros((64, 16)), jnp.zeros((64, 16))))
        assert (kl >= -1e-5).all()


class TestFocalBinaryLoss:
    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(0)
        pred = rng.uniform(0.01, 0.99, size=(4, 8, 8, 8, 1)).astype(np.float32)
        target = (rng.uniform(size=(4, 8, 8, 8, 1)) > 0.5).astype(np.float32)
        gamma = 0.6
        p = pred.reshape(4, -1)
        t = target.reshape(4, -1)
        expected = -np.sum(gamma * t * np.log(p) + (1 - gamma) * (1 - t) * np.log(1 - p), axis=-1)
        got = np.asarray(ops.focal_binary_loss(jnp.asarray(pred), jnp.asarray(target), gamma=gamma))
        assert np.allclose(got, expected, rtol=1e-4)

    def test_b_range_shift(self):
        pred = jnp.full((1, 2, 2, 2, 1), 0.5)
        target = jnp.ones((1, 2, 2, 2, 1))
        # with b_range targets become 2.0 -> loss scales accordingly
        plain = float(ops.focal_binary_loss(pred, target, gamma=0.6, b_range=False)[0])
        shifted = float(ops.focal_binary_loss(pred, target, gamma=0.6, b_range=True)[0])
        assert shifted != plain

    def test_perfect_prediction_small_loss(self):
        target = jnp.ones((1, 4, 4, 4, 1))
        loss = float(ops.focal_binary_loss(jnp.clip(target, 1e-7, 1 - 1e-7), target)[0])
        assert loss < 0.01 * 64

    def test_bf16_saturated_pred_finite(self):
        """Regression: bf16 sigmoid saturates to exactly 0.0/1.0 and the
        clip bound 1-1e-7 rounds to 1.0 in bf16, so without an internal f32
        cast the loss is 0*log(0) = NaN (seen as loss_shape=NaN in converged
        bf16 eval sweeps)."""
        pred = jnp.ones((2, 4, 4, 4, 1), jnp.bfloat16)
        target = jnp.ones((2, 4, 4, 4, 1), jnp.bfloat16)
        loss = np.asarray(ops.focal_binary_loss(pred, target))
        assert np.all(np.isfinite(loss))
        pred0 = jnp.zeros((2, 4, 4, 4, 1), jnp.bfloat16)
        loss0 = np.asarray(ops.focal_binary_loss(pred0, 1.0 - target))
        assert np.all(np.isfinite(loss0))


class TestPriorRepulsion:
    def test_far_apart_only_diagonal(self):
        # two means far apart relative to margin -> only the i==i terms pay
        m = jnp.array([[0.0, 0.0], [100.0, 100.0]])
        lv = jnp.zeros((2, 2))
        margin = 3.0
        loss = np.asarray(ops.prior_repulsion(m, lv, margin))
        assert np.allclose(loss, margin**2, atol=1e-5)

    def test_close_pairs_penalized(self):
        m = jnp.array([[0.0, 0.0], [0.1, 0.1]])
        lv = jnp.zeros((2, 2))
        loss = np.asarray(ops.prior_repulsion(m, lv, 3.0))
        # d_ij = 0.2 -> penalty (0.2-3)^2 = 7.84 plus diagonal 9
        assert np.allclose(loss, 9.0 + (0.2 - 3.0) ** 2, atol=1e-4)

    def test_class_gating(self):
        m = jnp.array([[0.0, 0.0], [0.1, 0.1]])
        lv = jnp.zeros((2, 2))
        different = jnp.array([[1.0, 0.0], [0.0, 1.0]])
        loss = np.asarray(ops.prior_repulsion(m, lv, 3.0, class_onehot=different))
        # cross pair gated out; diagonal (same class with itself) stays
        assert np.allclose(loss, 9.0, atol=1e-5)


class TestVoxelMetrics:
    def test_perfect(self):
        t = (np.random.default_rng(0).uniform(size=(2, 8, 8, 8, 1)) > 0.5).astype(np.float32)
        p, r = ops.voxel_precision_recall(jnp.asarray(t), jnp.asarray(t))
        assert float(p) > 0.999 and float(r) > 0.999

    def test_counts(self):
        t = np.zeros((1, 2, 2, 2, 1), np.float32)
        t[0, 0, 0, 0, 0] = 1.0
        p = np.zeros((1, 2, 2, 2, 1), np.float32)
        p[0, 0, 0, 0, 0] = 0.9  # TP
        p[0, 1, 1, 1, 0] = 0.7  # FP
        tp, fp, fn = ops.voxel_tp_fp_fn(jnp.asarray(t), jnp.asarray(p))
        assert float(tp[0]) == 1.0 and float(fp[0]) == 1.0 and float(fn[0]) == 0.0


class TestNMS:
    def test_matches_reference_greedy(self):
        rng = np.random.default_rng(0)
        boxes = []
        for _ in range(40):
            x0, y0 = rng.uniform(0, 0.7, 2)
            w, h = rng.uniform(0.05, 0.3, 2)
            boxes.append([x0, y0, x0 + w, y0 + h, rng.uniform()])
        boxes = np.array(boxes, np.float32)
        got = set(_reference_like(boxes, 0.5))
        kept_mask = np.asarray(ops.nms(jnp.asarray(boxes), 0.5))
        assert set(np.nonzero(kept_mask)[0]) == got

    def test_padding_slots_ignored(self):
        boxes = np.zeros((8, 5), np.float32)
        boxes[0] = [0, 0, 1, 1, 0.9]
        valid = np.zeros(8, bool)
        valid[0] = True
        keep = np.asarray(ops.nms(jnp.asarray(boxes), 0.5, valid=jnp.asarray(valid)))
        assert keep[0] and not keep[1:].any()


def _reference_like(boxes, thresh):
    """Transliteration of the reference greedy-delete NMS as the oracle."""
    boxes = np.array(boxes)
    picked = []
    c0, r0, c1, r1, s = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3], boxes[:, 4]
    area = (r1 - r0) * (c1 - c0)
    idxs = np.argsort(s)
    while len(idxs) > 0:
        last = len(idxs) - 1
        cur = idxs[last]
        picked.append(cur)
        rr0 = np.maximum(r0[cur], r0[idxs[:last]])
        cc0 = np.maximum(c0[cur], c0[idxs[:last]])
        rr1 = np.minimum(r1[cur], r1[idxs[:last]])
        cc1 = np.minimum(c1[cur], c1[idxs[:last]])
        w = np.maximum(0.0, cc1 - cc0)
        h = np.maximum(0.0, rr1 - rr0)
        inter = w * h
        iou = inter / (area[cur] + area[idxs[:last]] - inter)
        idxs = np.delete(idxs, np.concatenate(([last], np.where(iou > thresh)[0])))
    return picked


class TestKMeans:
    def test_recovers_angular_clusters(self):
        rng = np.random.default_rng(0)
        # three angular clusters in 3 Euler angles
        base = np.array([[0.3, 1.0, -1.2], [2.0, -0.5, 0.7], [-2.5, 2.2, 1.9]])
        angles = np.concatenate([b + rng.normal(0, 0.05, size=(100, 3)) for b in base])
        x = np.concatenate([np.sin(angles), np.cos(angles)], axis=-1).astype(np.float32)
        centres, assign, dist = ops.kmeans_sincos(x, k=3, max_iter=50, seed=1)
        assert centres.shape == (3, 6)
        # members of the same generated cluster should share an assignment
        for i in range(3):
            seg = assign[i * 100 : (i + 1) * 100]
            assert (seg == np.bincount(seg).argmax()).mean() > 0.95
        assert float(np.mean(dist)) < 0.05


class TestMaskLatent:
    def test_mask_rate(self):
        key = jax.random.PRNGKey(0)
        z = jnp.ones((1000, 16))
        z_m, mask = ops.mask_latent(key, z, missing_prob=0.3, fill_value=-5.0)
        rate = 1.0 - float(jnp.mean(mask))
        assert abs(rate - 0.3) < 0.02
        assert np.allclose(np.asarray(z_m)[np.asarray(mask) == 0], -5.0)

    def test_zero_prob_identity(self):
        key = jax.random.PRNGKey(0)
        z = jax.random.normal(key, (16, 8))
        z_m, mask = ops.mask_latent(key, z, missing_prob=0.0)
        assert np.array_equal(np.asarray(z), np.asarray(z_m))
        assert float(jnp.min(mask)) == 1.0
