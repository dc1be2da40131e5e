"""Metric lifting: voxel grids -> scaled point clouds -> world poses.

Reference semantics: objRescaleTransform + getObjectInRealWorld at
src/visualizer/visualizer.py:171-188, 237-308. Fixed-shape design: point
clouds stay (D³, 3) with an occupancy mask instead of dynamic gathers, so
the whole lift runs under jit/vmap.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from anytime3d_tpu.geometry.projection import (
    KITTI_PROJ,
    KITTI_PROJ_INV,
    compose_object_rotation,
    project_bbox3d_corners,
)
from anytime3d_tpu.geometry.translation import recover_translation


@functools.lru_cache(maxsize=8)
def voxel_grid_points(dim: int = 64):
    """(dim³, 3) voxel index coordinates (visualizer.py:14-18, sans loops)."""
    ii, jj, kk = jnp.meshgrid(
        jnp.arange(dim, dtype=jnp.float32),
        jnp.arange(dim, dtype=jnp.float32),
        jnp.arange(dim, dtype=jnp.float32),
        indexing="ij",
    )
    return jnp.stack([ii, jj, kk], axis=-1).reshape(-1, 3)


def rescale_transform_points(
    voxels: jnp.ndarray,
    whl: jnp.ndarray,
    pose: jnp.ndarray,
    threshold: float = 0.5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Voxel occupancy grid (D, D, D) -> world-frame points (D³, 3) + mask.

    Matches objRescaleTransform (visualizer.py:171-188): shift to min corner,
    scale so the largest box side maps the largest point coordinate, center,
    then rigid-transform by the 4x4 ``pose``. Masked (empty) entries hold
    zeros.
    """
    dim = voxels.shape[0]
    pts = voxel_grid_points(dim)
    mask = voxels.reshape(-1) > threshold
    big = jnp.asarray(jnp.inf, pts.dtype)
    masked = jnp.where(mask[:, None], pts, big)
    mins = jnp.min(masked, axis=0)
    mins = jnp.where(jnp.isfinite(mins), mins, 0.0)
    p = pts - mins
    p_masked_max = jnp.max(jnp.where(mask[:, None], p, -big))
    p_masked_max = jnp.where(jnp.isfinite(p_masked_max) & (p_masked_max > 0), p_masked_max, 1.0)
    scale = jnp.max(whl) / p_masked_max
    p = p * scale
    maxs = jnp.max(jnp.where(mask[:, None], p, -big), axis=0)
    maxs = jnp.where(jnp.isfinite(maxs), maxs, 0.0)
    p = p - maxs / 2.0
    r, t = pose[:3, :3], pose[:3, 3]
    world = p @ r.T + t
    return jnp.where(mask[:, None], world, 0.0), mask


def lift_detections(
    bbox2d_norm: jnp.ndarray,  # (K, 5) [x0, y0, x1, y1, score] normalized
    bbox3d_whl: jnp.ndarray,  # (K, 3)
    ori_sin: jnp.ndarray,  # (K, 3)
    ori_cos: jnp.ndarray,  # (K, 3)
    image_size: tuple[int, int],  # (cols, rows)
    valid: jnp.ndarray | None = None,
    proj: jnp.ndarray = KITTI_PROJ,
    proj_inv: jnp.ndarray = KITTI_PROJ_INV,
) -> Dict[str, jnp.ndarray]:
    """Vectorized getObjectInRealWorld (visualizer.py:237-308): rotation via
    ray-corrected Euler composition, translation via SVD hypothesis search,
    plus projected 3D box corners and a combined validity mask."""
    cols, rows = image_size
    scale = jnp.asarray([cols, rows, cols, rows], bbox2d_norm.dtype)
    px_boxes = bbox2d_norm[:, :4] * scale
    centers = jnp.stack(
        [(px_boxes[:, 0] + px_boxes[:, 2]) / 2.0, (px_boxes[:, 1] + px_boxes[:, 3]) / 2.0],
        axis=-1,
    )

    r = compose_object_rotation(ori_sin, ori_cos, centers, proj_inv=proj_inv)

    t, iou = jax.vmap(recover_translation, in_axes=(0, 0, 0, None))(
        px_boxes, bbox3d_whl, r, proj
    )

    pose = jnp.concatenate([r, t[:, :, None]], axis=-1)  # (K, 3, 4)
    bottom = jnp.broadcast_to(
        jnp.asarray([[[0.0, 0.0, 0.0, 1.0]]], pose.dtype), (pose.shape[0], 1, 4)
    )
    pose = jnp.concatenate([pose, bottom], axis=-2)  # (K, 4, 4)

    corners = project_bbox3d_corners(proj, r, t, bbox3d_whl)

    # validity: not hugging the image border (visualizer.py:249) and z > 0.1
    # (visualizer.py:295) and a hypothesis was found
    b = bbox2d_norm
    ok = (
        (b[:, 0] > 1e-1)
        & (b[:, 2] < 1.0 - 1e-1)
        & (b[:, 3] < 1.0 - 1e-1)
        & (t[:, 2] > 1e-1)
        & (iou > 0)
    )
    if valid is not None:
        ok = ok & valid
    return {
        "pose": pose,
        "translation": t,
        "rotation": r,
        "bbox2d_px": px_boxes,
        "bbox3d_corners_px": corners,
        "hypothesis_iou": iou,
        "valid": ok,
    }
