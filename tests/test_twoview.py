"""Two-view pose tests against synthetic ground truth.

Oracle: random 3D scene observed by two known cameras; the estimator must
recover R exactly and t up to (global, positive) scale.
"""

import numpy as np
import jax.numpy as jnp

from anytime3d_tpu.geometry.twoview import (
    decompose_essential,
    estimate_essential,
    triangulate,
    two_view_pose,
)


def _synthetic_pair(n=64, seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-1.0, -1.0, 4.0], [1.0, 1.0, 8.0], size=(n, 3))
    # camera 2 pose: modest rotation + translation
    aa = 0.15 * rng.standard_normal(3)
    theta = np.linalg.norm(aa)
    k = aa / max(theta, 1e-12)
    kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    r = np.eye(3) + np.sin(theta) * kx + (1 - np.cos(theta)) * kx @ kx
    t = np.array([0.5, -0.1, 0.2])
    p1 = pts[:, :2] / pts[:, 2:3]
    pc2 = pts @ r.T + t
    p2 = pc2[:, :2] / pc2[:, 2:3]
    if noise:
        p1 = p1 + rng.normal(scale=noise, size=p1.shape)
        p2 = p2 + rng.normal(scale=noise, size=p2.shape)
    return (
        jnp.asarray(p1, jnp.float32),
        jnp.asarray(p2, jnp.float32),
        r,
        t,
        pts,
    )


def test_essential_epipolar_constraint():
    p1, p2, r, t, _ = _synthetic_pair()
    w = jnp.ones(p1.shape[0])
    e = np.asarray(estimate_essential(p1, p2, w))
    x1 = np.concatenate([np.asarray(p1), np.ones((p1.shape[0], 1))], axis=-1)
    x2 = np.concatenate([np.asarray(p2), np.ones((p2.shape[0], 1))], axis=-1)
    resid = np.abs(np.einsum("ni,ij,nj->n", x2, e, x1))
    assert resid.max() < 1e-4
    # essential singular values ~ (s, s, 0)
    s = np.linalg.svd(e, compute_uv=False)
    assert s[2] < 1e-6 * s[0]
    np.testing.assert_allclose(s[0], s[1], rtol=1e-4)


def test_decompose_contains_truth():
    p1, p2, r, t, _ = _synthetic_pair(seed=1)
    w = jnp.ones(p1.shape[0])
    e = estimate_essential(p1, p2, w)
    rs, ts = decompose_essential(e)
    t_unit = t / np.linalg.norm(t)
    r_errs = [np.abs(np.asarray(rc) - r).max() for rc in rs]
    t_errs = [np.abs(np.asarray(tc) - t_unit).max() for tc in ts]
    assert min(r_errs) < 1e-3
    assert min(t_errs) < 1e-3


def test_two_view_pose_recovers_motion():
    p1, p2, r, t, pts = _synthetic_pair(seed=2)
    w = jnp.ones(p1.shape[0])
    res = two_view_pose(p1, p2, w)
    np.testing.assert_allclose(np.asarray(res.rotation), r, atol=1e-3)
    t_unit = t / np.linalg.norm(t)
    np.testing.assert_allclose(np.asarray(res.translation), t_unit, atol=1e-3)
    # triangulated points match GT up to the same scale as t
    scale = np.linalg.norm(t)
    np.testing.assert_allclose(np.asarray(res.points) * scale, pts, atol=1e-2)


def test_two_view_pose_with_noise_and_outliers():
    p1, p2, r, t, _ = _synthetic_pair(n=128, seed=3, noise=1e-3)
    w = np.ones(128, np.float32)
    # poison 20 correspondences but zero their weights
    p2 = np.array(p2)
    p2[:20] += 0.5
    w[:20] = 0.0
    res = two_view_pose(jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(w))
    # fp32 eigh of the 9x9 normal equations limits accuracy under noise
    assert np.abs(np.asarray(res.rotation) - r).max() < 0.08
    t_unit = t / np.linalg.norm(t)
    assert np.abs(np.asarray(res.translation) - t_unit).max() < 0.15


def test_triangulate_known_points():
    p1, p2, r, t, pts = _synthetic_pair(seed=4)
    out = np.asarray(triangulate(p1, p2, jnp.asarray(r, jnp.float32), jnp.asarray(t, jnp.float32)))
    np.testing.assert_allclose(out, pts, atol=1e-2)
