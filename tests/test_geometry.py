"""Geometry tests vs NumPy oracles transliterated from the reference."""

import jax
import jax.numpy as jnp
import numpy as np

from anytime3d_tpu.geometry import (
    KITTI_PROJ,
    KITTI_PROJ_INV,
    compose_object_rotation,
    euler_to_rotation,
    get_ray,
    lift_detections,
    project_bbox3d_corners,
    project_points,
    ray_rotation,
    rescale_transform_points,
    recover_translation,
)


class TestProjection:
    def test_ray_unit_norm_and_direction(self):
        pixels = jnp.asarray([[609.6, 172.9], [100.0, 50.0], [1000.0, 300.0]])
        rays = np.asarray(get_ray(jnp.asarray(KITTI_PROJ_INV), pixels))
        assert np.allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-5)
        # principal point ray looks along +z
        assert rays[0, 2] > 0.99

    def test_ray_matches_reference_formula(self):
        def ref_ray(P_inv, pixel):
            px, py = pixel
            p = np.array([px, py, 1.0, 1.0])
            ray = (P_inv @ p)[:3]
            return ray / np.linalg.norm(ray)

        for pixel in [(320.0, 200.0), (50.0, 370.0)]:
            ours = np.asarray(get_ray(jnp.asarray(KITTI_PROJ_INV), jnp.asarray(pixel)))
            theirs = ref_ray(KITTI_PROJ_INV, pixel)
            assert np.allclose(ours, theirs, atol=1e-5)

    def test_ray_rotation_aligns_z(self):
        ray = jnp.asarray([0.2, -0.1, 0.97])
        ray = ray / jnp.linalg.norm(ray)
        r = np.asarray(ray_rotation(ray))
        # R @ [0,0,1] should reproduce the ray
        assert np.allclose(r @ np.array([0, 0, 1.0]), np.asarray(ray), atol=1e-5)
        # proper rotation
        assert np.allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) > 0.99

    def test_euler_rotation_orthonormal(self):
        rng = np.random.default_rng(0)
        angles = rng.uniform(-np.pi, np.pi, size=(5, 3)).astype(np.float32)
        r = np.asarray(euler_to_rotation(jnp.sin(angles), jnp.cos(angles)))
        for i in range(5):
            assert np.allclose(r[i] @ r[i].T, np.eye(3), atol=1e-5)

    def test_euler_rotation_matches_reference_formula(self):
        # visualizer.py:267-269
        a, e, i = 0.4, -0.2, 0.7
        sA, sE, sI = np.sin([a, e, i])
        cA, cE, cI = np.cos([a, e, i])
        expected = np.array(
            [
                [-sA * sE * sI + cA * cI, -sA * cE, sA * sE * cI + sI * cA],
                [sA * cI + sE * sI * cA, cA * cE, sA * sI - sE * cA * cI],
                [-sI * cE, sE, cE * cI],
            ]
        )
        got = np.asarray(
            euler_to_rotation(jnp.asarray([sA, sE, sI]), jnp.asarray([cA, cE, cI]))
        )
        assert np.allclose(got, expected, atol=1e-6)

    def test_project_points_roundtrip(self):
        pts = jnp.asarray([[1.0, 2.0, 10.0], [-3.0, 0.5, 25.0]])
        uv = np.asarray(project_points(jnp.asarray(KITTI_PROJ), pts))
        # oracle
        for k in range(2):
            p = np.concatenate([np.asarray(pts)[k], [1.0]])
            x = KITTI_PROJ @ p
            assert np.allclose(uv[k], x[:2] / x[2], atol=1e-4)

    def test_bbox3d_corners_shape(self):
        r = jnp.eye(3)
        t = jnp.asarray([0.0, 0.0, 15.0])
        whl = jnp.asarray([2.0, 1.5, 4.0])
        c = project_bbox3d_corners(jnp.asarray(KITTI_PROJ), r, t, whl)
        assert c.shape == (8, 2)


class TestTranslation:
    def test_recovers_synthetic_translation(self):
        """Project a known box, then recover its translation from the bbox."""
        t_true = np.array([2.0, 0.5, 20.0])
        whl = np.array([1.8, 1.5, 4.2])  # (w, h, l)
        r = np.eye(3, dtype=np.float32)
        dx, dy, dz = whl[0] / 2, whl[2] / 2, whl[1] / 2
        corners = np.array(
            [
                [sx * dx, sy * dy, sz * dz]
                for sx in (-1, 1)
                for sy in (-1, 1)
                for sz in (-1, 1)
            ]
        )
        world = corners @ r.T + t_true
        proj = KITTI_PROJ
        homog = np.concatenate([world, np.ones((8, 1))], axis=-1) @ proj.T
        uv = homog[:, :2] / homog[:, 2:3]
        bbox2d = np.array([uv[:, 0].min(), uv[:, 1].min(), uv[:, 0].max(), uv[:, 1].max()])

        t_rec, iou = recover_translation(
            jnp.asarray(bbox2d, jnp.float32), jnp.asarray(whl, jnp.float32), jnp.asarray(r)
        )
        t_rec = np.asarray(t_rec)
        assert float(iou) > 0.8
        # axis-aligned box at center: translation recoverable to ~10%
        assert np.linalg.norm(t_rec - t_true) / np.linalg.norm(t_true) < 0.15

    def test_invalid_returns_zero(self):
        # degenerate bbox
        t, iou = recover_translation(
            jnp.asarray([0.0, 0.0, 0.0, 0.0]), jnp.asarray([0.0, 0.0, 0.0]), jnp.eye(3)
        )
        assert float(iou) <= 0.0 or np.allclose(np.asarray(t), 0.0)


class TestLifting:
    def test_rescale_transform_identity_pose(self):
        vox = np.zeros((8, 8, 8), np.float32)
        vox[2:6, 2:6, 2:6] = 1.0
        whl = jnp.asarray([2.0, 2.0, 2.0])
        pose = jnp.eye(4)
        pts, mask = rescale_transform_points(jnp.asarray(vox), whl, pose)
        pts, mask = np.asarray(pts), np.asarray(mask)
        assert mask.sum() == 4**3
        occ = pts[mask]
        # centered around origin, extent == max(whl)
        assert np.allclose(occ.max(axis=0) + occ.min(axis=0), 0.0, atol=1e-4)
        assert np.allclose(occ.max(), 1.0, atol=1e-4)

    def test_lift_detections_shapes_and_validity(self):
        k = 4
        rng = np.random.default_rng(0)
        bbox2d = np.array(
            [
                [0.4, 0.4, 0.6, 0.6, 0.9],  # central box -> potentially valid
                [0.0, 0.0, 0.05, 0.05, 0.9],  # border box -> invalid
                [0.45, 0.3, 0.62, 0.5, 0.8],
                [0.3, 0.3, 0.5, 0.6, 0.7],
            ],
            np.float32,
        )
        whl = np.abs(rng.normal(2.0, 0.3, size=(k, 3))).astype(np.float32)
        angles = rng.uniform(-np.pi, np.pi, size=(k, 3)).astype(np.float32)
        out = lift_detections(
            jnp.asarray(bbox2d),
            jnp.asarray(whl),
            jnp.sin(jnp.asarray(angles)),
            jnp.cos(jnp.asarray(angles)),
            image_size=(1242, 375),
        )
        assert out["pose"].shape == (k, 4, 4)
        assert out["bbox3d_corners_px"].shape == (k, 8, 2)
        assert not bool(out["valid"][1])  # border box rejected
        # bottom row of every pose is [0,0,0,1]
        assert np.allclose(np.asarray(out["pose"])[:, 3], [0, 0, 0, 1], atol=1e-6)

    def test_lift_jit(self):
        fn = jax.jit(
            lambda b, w, s, c: lift_detections(b, w, s, c, image_size=(1242, 375))
        )
        out = fn(
            jnp.asarray([[0.4, 0.4, 0.6, 0.6, 0.9]]),
            jnp.asarray([[2.0, 1.5, 4.0]]),
            jnp.zeros((1, 3)),
            jnp.ones((1, 3)),
        )
        assert out["valid"].shape == (1,)
