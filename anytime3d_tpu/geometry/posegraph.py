"""Pose-graph optimization over SE(3): Gauss-Newton on relative-pose edges.

No reference counterpart (the reference never optimizes over time) — this is
the pose-graph half of the BASELINE.json north-star mapping layer,
complementing geometry/ba.py. Nodes are (rvec, tvec) poses; edges carry a
measured relative transform and an information weight. Residual per edge:

  r_ij = log( Z_ij^-1 · (T_i^-1 · T_j) )   ∈ R^6  (split log: rot + trans)

Solved by damped Gauss-Newton with jacobians from jax.jacfwd over a dense
edge list (fixed shapes; absent edges have weight 0). Pose 0 anchors the
gauge.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from anytime3d_tpu.geometry.ba import rodrigues


def rotmat_to_rvec(r: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> rotation vector (log map).

    Autodiff-safe at the identity: theta comes from atan2(sin, cos) (finite
    gradients at theta=0, unlike arccos), sin(theta) from a clamped norm, and
    the small-angle branch uses the exact limit scale 1/2."""
    axis_raw = jnp.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]])
    sq = jnp.sum(jnp.square(axis_raw))
    sin_t = 0.5 * jnp.sqrt(jnp.maximum(sq, 1e-24))
    cos_t = 0.5 * (jnp.trace(r) - 1.0)
    theta = jnp.arctan2(sin_t, cos_t)
    scale = jnp.where(sq < 1e-12, 0.5, theta / (2.0 * sin_t))
    return axis_raw * scale


def compose(pose_a: jnp.ndarray, pose_b: jnp.ndarray) -> jnp.ndarray:
    """T_a · T_b in (rvec, tvec) form."""
    ra, rb = rodrigues(pose_a[:3]), rodrigues(pose_b[:3])
    r = ra @ rb
    t = ra @ pose_b[3:] + pose_a[3:]
    return jnp.concatenate([rotmat_to_rvec(r), t])


def inverse(pose: jnp.ndarray) -> jnp.ndarray:
    r = rodrigues(pose[:3])
    return jnp.concatenate([rotmat_to_rvec(r.T), -(r.T @ pose[3:])])


def relative(pose_i: jnp.ndarray, pose_j: jnp.ndarray) -> jnp.ndarray:
    """T_i^-1 · T_j."""
    return compose(inverse(pose_i), pose_j)


@dataclasses.dataclass
class PoseGraph:
    poses: jnp.ndarray  # (N, 6)
    edges_i: jnp.ndarray  # (E,) int32 source indices
    edges_j: jnp.ndarray  # (E,) int32 target indices
    measurements: jnp.ndarray  # (E, 6) measured T_i^-1 T_j
    weights: jnp.ndarray  # (E,) information weights (0 disables an edge)


jax.tree_util.register_dataclass(
    PoseGraph,
    data_fields=["poses", "edges_i", "edges_j", "measurements", "weights"],
    meta_fields=[],
)


def edge_residual(pose_i, pose_j, meas):
    """6-vector residual: log of the discrepancy transform."""
    pred = relative(pose_i, pose_j)
    err = compose(inverse(meas), pred)
    return err  # (rvec, tvec) of the error transform ~ log map split


def graph_residuals(graph: PoseGraph) -> jnp.ndarray:
    pi = graph.poses[graph.edges_i]
    pj = graph.poses[graph.edges_j]
    r = jax.vmap(edge_residual)(pi, pj, graph.measurements)  # (E, 6)
    return r * graph.weights[:, None]


def pgo_step(graph: PoseGraph, damping: float = 1e-3) -> Tuple[PoseGraph, jnp.ndarray]:
    """One damped Gauss-Newton step over all poses (pose 0 fixed)."""
    n = graph.poses.shape[0]

    def res_flat(poses_flat):
        g = PoseGraph(
            poses_flat.reshape(n, 6), graph.edges_i, graph.edges_j,
            graph.measurements, graph.weights,
        )
        return graph_residuals(g).reshape(-1)

    x0 = graph.poses.reshape(-1)
    r = res_flat(x0)
    jac = jax.jacfwd(res_flat)(x0)  # (6E, 6N)
    h = jac.T @ jac + damping * jnp.eye(6 * n)
    b = -jac.T @ r
    # gauge: pin pose 0
    idx = jnp.arange(6 * n)
    free = idx >= 6
    h = jnp.where(free[:, None] & free[None, :], h, 0.0) + jnp.diag(
        jnp.where(free, 0.0, 1.0)
    )
    b = jnp.where(free, b, 0.0)
    dx = jnp.linalg.solve(h, b)
    new = PoseGraph(
        (x0 + dx).reshape(n, 6), graph.edges_i, graph.edges_j,
        graph.measurements, graph.weights,
    )
    return new, jnp.sum(jnp.square(r))


def solve_pose_graph(graph: PoseGraph, iters: int = 10, damping: float = 1e-3):
    """Returns (solved_graph, cost_history); history[k] is the cost *before*
    step k, so the last entry is one step stale (standard GN convention)."""
    def body(g, _):
        new, cost = pgo_step(g, damping)
        return new, cost

    final, history = jax.lax.scan(body, graph, None, length=iters)
    return final, history
