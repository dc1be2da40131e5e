"""Camera projection, viewing rays, and rotation composition.

Reference semantics: src/visualizer/visualizer.py:5-12 (KITTI projection),
:148-168 (ray + ray rotation), :259-280 (Euler composition with the
pascal->kitti axis flip and the -5° elevation correction). All functions are
batched over leading axes and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Hard-coded KITTI camera (visualizer.py:5-12).
KITTI_PROJ = np.array(
    [
        [7.21537720e02, 0.0, 6.09559326e02, 4.48572807e01],
        [0.0, 7.21537720e02, 1.72854004e02, 2.16379106e-01],
        [0.0, 0.0, 1.0, 2.74588400e-03],
        [0.0, 0.0, 0.0, 1.0],
    ],
    dtype=np.float64,
)
KITTI_PROJ_INV = np.linalg.inv(KITTI_PROJ)


def get_ray(proj_inv: jnp.ndarray, pixels: jnp.ndarray) -> jnp.ndarray:
    """Back-project pixels (..., 2) to unit viewing rays (..., 3)
    (visualizer.py:148-155)."""
    px, py = pixels[..., 0], pixels[..., 1]
    ones = jnp.ones_like(px)
    p = jnp.stack([px, py, ones, ones], axis=-1)
    ray = jnp.einsum("ij,...j->...i", jnp.asarray(proj_inv, p.dtype), p)[..., :3]
    return ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)


def ray_rotation(ray: jnp.ndarray) -> jnp.ndarray:
    """Rotation aligning the camera z-axis to a viewing ray (..., 3) -> (..., 3, 3)
    (visualizer.py:157-168: x-then-y rotation assumption)."""
    ray = ray / jnp.linalg.norm(ray, axis=-1, keepdims=True)
    rx, ry, rz = ray[..., 0], ray[..., 1], ray[..., 2]
    yz = jnp.sqrt(ry * ry + rz * rz)
    cy = yz
    cx = rz / yz
    sx = -ry / yz
    sy = rx
    zeros = jnp.zeros_like(rx)
    row0 = jnp.stack([cy, zeros, sy], axis=-1)
    row1 = jnp.stack([sx * sy, cx, -sx * cy], axis=-1)
    row2 = jnp.stack([-cx * sy, sx, cx * cy], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def euler_to_rotation(sin_aei: jnp.ndarray, cos_aei: jnp.ndarray) -> jnp.ndarray:
    """(sin, cos) of (azimuth, elevation, in-plane) -> R = RA·RE·RI
    (visualizer.py:267-269), batched: (..., 3) -> (..., 3, 3)."""
    sA, sE, sI = sin_aei[..., 0], sin_aei[..., 1], sin_aei[..., 2]
    cA, cE, cI = cos_aei[..., 0], cos_aei[..., 1], cos_aei[..., 2]
    r11 = -sA * sE * sI + cA * cI
    r12 = -sA * cE
    r13 = sA * sE * cI + sI * cA
    r21 = sA * cI + sE * sI * cA
    r22 = cA * cE
    r23 = sA * sI - sE * cA * cI
    r31 = -sI * cE
    r32 = sE
    r33 = cE * cI
    row0 = jnp.stack([r11, r12, r13], axis=-1)
    row1 = jnp.stack([r21, r22, r23], axis=-1)
    row2 = jnp.stack([r31, r32, r33], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def compose_object_rotation(
    sin_aei: jnp.ndarray,
    cos_aei: jnp.ndarray,
    pixel_center: jnp.ndarray,
    proj_inv: jnp.ndarray = KITTI_PROJ_INV,
    elevation_correction_deg: float = -5.0,
) -> jnp.ndarray:
    """Full allocentric rotation: Euler composition + pascal->kitti x-axis flip
    + ray rotation at the detection center (visualizer.py:256-280)."""
    beta = jnp.deg2rad(jnp.asarray(elevation_correction_deg, sin_aei.dtype))
    sE, cE = sin_aei[..., 1], cos_aei[..., 1]
    sE_t = sE * jnp.cos(beta) - cE * jnp.sin(beta)
    cE_t = cE * jnp.cos(beta) + sE * jnp.sin(beta)
    sin_c = sin_aei.at[..., 1].set(sE_t) if hasattr(sin_aei, "at") else sin_aei
    cos_c = cos_aei.at[..., 1].set(cE_t) if hasattr(cos_aei, "at") else cos_aei

    r = euler_to_rotation(sin_c, cos_c)
    # pascal->kitti: 90° about x (visualizer.py:272-274): rows (0, -2, 1)
    flip = jnp.stack([r[..., 0, :], -r[..., 2, :], r[..., 1, :]], axis=-2)
    ray = get_ray(proj_inv, pixel_center)
    return ray_rotation(ray) @ flip


def project_points(proj: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """World points (..., 3) -> pixel coords (..., 2) through a 4x4 projection."""
    ones = jnp.ones_like(points[..., :1])
    homog = jnp.concatenate([points, ones], axis=-1)
    x = jnp.einsum("ij,...j->...i", jnp.asarray(proj, points.dtype), homog)
    return x[..., :2] / x[..., 2:3]


def project_bbox3d_corners(
    proj: jnp.ndarray, r: jnp.ndarray, t: jnp.ndarray, whl: jnp.ndarray
) -> jnp.ndarray:
    """Project the 8 corners of an oriented 3D box -> (..., 8, 2)
    (visualizer.py:191-205)."""
    w, h, l = whl[..., 0], whl[..., 1], whl[..., 2]
    dx, dy, dz = w / 2.0, l / 2.0, h / 2.0
    signs = jnp.asarray(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        dtype=whl.dtype,
    )  # (8, 3)
    half = jnp.stack([dx, dy, dz], axis=-1)  # (..., 3)
    corners = signs * half[..., None, :]  # (..., 8, 3)
    world = jnp.einsum("...ij,...kj->...ki", r, corners) + t[..., None, :]
    return project_points(proj, world)
