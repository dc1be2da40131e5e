"""Bundle adjustment tests: synthetic convergence + sharded == single-device."""

import jax
import jax.numpy as jnp
import numpy as np

from anytime3d_tpu.geometry.ba import (
    BAProblem,
    ba_step,
    ba_step_sharded,
    project,
    rodrigues,
    solve,
)
from anytime3d_tpu.parallel import make_mesh

INTR = jnp.asarray([500.0, 500.0, 320.0, 240.0])


def make_problem(p=4, l=32, noise=1.0, pose_err=0.05, point_err=0.2, seed=0):
    rng = np.random.default_rng(seed)
    # cameras along x, looking at a point cloud around z=10
    poses_gt = np.zeros((p, 6), np.float32)
    poses_gt[:, 3] = np.linspace(-1, 1, p)  # tx
    poses_gt[:, :3] = rng.normal(0, 0.02, (p, 3))
    points_gt = rng.normal([0, 0, 10], [2, 2, 1], (l, 3)).astype(np.float32)

    obs = np.zeros((p, l, 2), np.float32)
    for i in range(p):
        for j in range(l):
            obs[i, j] = np.asarray(project(jnp.asarray(poses_gt[i]), jnp.asarray(points_gt[j]), INTR))
    obs += rng.normal(0, noise, obs.shape)
    mask = np.ones((p, l), np.float32)

    poses0 = poses_gt + rng.normal(0, pose_err, poses_gt.shape)
    poses0[0] = poses_gt[0]  # gauge anchor exact
    points0 = points_gt + rng.normal(0, point_err, points_gt.shape)
    return (
        BAProblem(
            poses=jnp.asarray(poses0.astype(np.float32)),
            points=jnp.asarray(points0.astype(np.float32)),
            observations=jnp.asarray(obs),
            mask=jnp.asarray(mask),
            intrinsics=INTR,
        ),
        poses_gt,
        points_gt,
    )


class TestRodrigues:
    def test_identity(self):
        assert np.allclose(np.asarray(rodrigues(jnp.zeros(3))), np.eye(3), atol=1e-6)

    def test_known_rotation(self):
        r = np.asarray(rodrigues(jnp.asarray([0.0, 0.0, np.pi / 2])))
        expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
        assert np.allclose(r, expected, atol=1e-5)

    def test_orthonormal(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            r = np.asarray(rodrigues(jnp.asarray(rng.normal(0, 1, 3).astype(np.float32))))
            assert np.allclose(r @ r.T, np.eye(3), atol=1e-5)


class TestBA:
    def test_converges_on_synthetic(self):
        problem, poses_gt, points_gt = make_problem(noise=0.5)
        final, history = solve(problem, iters=15, damping=1e-3)
        history = np.asarray(history)
        assert history[-1] < history[0] * 0.05, history
        # recovered geometry close to ground truth
        assert np.abs(np.asarray(final.poses)[:, 3:] - poses_gt[:, 3:]).mean() < 0.05
        assert np.abs(np.asarray(final.points) - points_gt).mean() < 0.1

    def test_noise_floor(self):
        problem, *_ = make_problem(noise=1.0)
        _, history = solve(problem, iters=15)
        # converges to ~noise² per-obs residual (2 px² for σ=1 in 2D)
        assert float(history[-1]) < 5.0

    def test_masked_observations(self):
        problem, *_ = make_problem()
        mask = np.asarray(problem.mask).copy()
        mask[:, ::3] = 0.0  # drop a third of landmarks' observations
        problem = BAProblem(
            problem.poses, problem.points, problem.observations,
            jnp.asarray(mask), problem.intrinsics,
        )
        _, history = solve(problem, iters=10)
        assert float(history[-1]) < float(history[0])

    def test_gauge_pose_fixed(self):
        problem, poses_gt, _ = make_problem()
        new, _ = ba_step(problem)
        assert np.allclose(
            np.asarray(new.poses)[0], np.asarray(problem.poses)[0], atol=1e-6
        )


class TestDistributedBA:
    def test_sharded_matches_single_device(self):
        problem, *_ = make_problem(p=3, l=32)
        single, mse_s = ba_step(problem, damping=1e-3)

        mesh = make_mesh(data=8, model=1)
        sharded, mse_d = ba_step_sharded(problem, mesh, damping=1e-3)

        assert np.allclose(float(mse_s), float(mse_d), rtol=1e-5)
        # fp32: the psum reduction order perturbs the ill-conditioned reduced
        # system slightly; updates agree to ~0.5%
        assert np.allclose(
            np.asarray(single.poses), np.asarray(sharded.poses), rtol=5e-3, atol=2e-3
        )
        assert np.allclose(
            np.asarray(single.points), np.asarray(sharded.points), rtol=5e-3, atol=2e-3
        )

    def test_sharded_iterates(self):
        problem, *_ = make_problem(p=3, l=32)
        mesh = make_mesh(data=8, model=1)
        mses = []
        for _ in range(5):
            problem, mse = ba_step_sharded(problem, mesh)
            mses.append(float(mse))
        assert mses[-1] < mses[0]
