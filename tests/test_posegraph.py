"""Pose-graph optimization tests: SE(3) ops + loop-closure convergence."""

import jax
import jax.numpy as jnp
import numpy as np

from anytime3d_tpu.geometry.ba import rodrigues
from anytime3d_tpu.geometry.posegraph import (
    PoseGraph,
    compose,
    inverse,
    relative,
    rotmat_to_rvec,
    solve_pose_graph,
)


class TestSE3Ops:
    def test_log_exp_roundtrip(self):
        rng = np.random.default_rng(0)
        for _ in range(10):
            rvec = rng.normal(0, 0.8, 3).astype(np.float32)
            r = rodrigues(jnp.asarray(rvec))
            back = np.asarray(rotmat_to_rvec(r))
            assert np.allclose(back, rvec, atol=1e-4)

    def test_compose_inverse_identity(self):
        rng = np.random.default_rng(1)
        pose = jnp.asarray(rng.normal(0, 0.5, 6).astype(np.float32))
        ident = np.asarray(compose(pose, inverse(pose)))
        assert np.allclose(ident, 0.0, atol=1e-4)

    def test_relative_consistency(self):
        rng = np.random.default_rng(2)
        a = jnp.asarray(rng.normal(0, 0.3, 6).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 0.3, 6).astype(np.float32))
        rel = relative(a, b)
        b_back = np.asarray(compose(a, rel))
        assert np.allclose(b_back, np.asarray(b), atol=1e-4)


def odometry_graph(n=6, drift=0.1, seed=0):
    """Chain of poses with noisy odometry + exact loop closure 0->last."""
    rng = np.random.default_rng(seed)
    poses_gt = np.zeros((n, 6), np.float32)
    for i in range(1, n):
        poses_gt[i] = np.asarray(
            compose(jnp.asarray(poses_gt[i - 1]),
                    jnp.asarray(np.array([0, 0, 0.05, 1.0, 0, 0], np.float32)))
        )
    edges_i, edges_j, meas, w = [], [], [], []
    for i in range(n - 1):
        m = np.array(relative(jnp.asarray(poses_gt[i]), jnp.asarray(poses_gt[i + 1])))
        m[3:] += rng.normal(0, drift, 3)  # noisy odometry translation
        edges_i.append(i)
        edges_j.append(i + 1)
        meas.append(m)
        w.append(1.0)
    # loop closure: exact relative pose between first and last
    m = np.asarray(relative(jnp.asarray(poses_gt[0]), jnp.asarray(poses_gt[-1])))
    edges_i.append(0)
    edges_j.append(n - 1)
    meas.append(m)
    w.append(2.0)

    # initialize by integrating the NOISY odometry (drifted)
    poses0 = np.zeros((n, 6), np.float32)
    for i in range(1, n):
        poses0[i] = np.asarray(compose(jnp.asarray(poses0[i - 1]), jnp.asarray(meas[i - 1])))
    return (
        PoseGraph(
            poses=jnp.asarray(poses0),
            edges_i=jnp.asarray(edges_i, jnp.int32),
            edges_j=jnp.asarray(edges_j, jnp.int32),
            measurements=jnp.asarray(np.stack(meas)),
            weights=jnp.asarray(w, jnp.float32),
        ),
        poses_gt,
    )


class TestPoseGraphOptimization:
    def test_loop_closure_reduces_drift(self):
        graph, poses_gt = odometry_graph(n=6, drift=0.15)
        drift_before = np.abs(np.asarray(graph.poses)[-1] - poses_gt[-1]).sum()
        final, history = solve_pose_graph(graph, iters=10, damping=1e-4)
        drift_after = np.abs(np.asarray(final.poses)[-1] - poses_gt[-1]).sum()
        assert float(history[-1]) < float(history[0])
        assert drift_after < drift_before * 0.5

    def test_gauge_fixed(self):
        graph, _ = odometry_graph()
        final, _ = solve_pose_graph(graph, iters=5)
        assert np.allclose(np.asarray(final.poses)[0], np.asarray(graph.poses)[0], atol=1e-6)

    def test_zero_weight_edges_ignored(self):
        graph, _ = odometry_graph(n=4)
        w = np.asarray(graph.weights).copy()
        w[-1] = 0.0  # kill the loop closure
        g2 = PoseGraph(graph.poses, graph.edges_i, graph.edges_j, graph.measurements,
                       jnp.asarray(w))
        final, history = solve_pose_graph(g2, iters=5)
        # odometry-only graph starts consistent -> cost stays ~0
        assert float(history[0]) < 1e-6
