"""Object translation recovery from 2D bbox + 3D box size + rotation.

Reference semantics: getTranslation at src/visualizer/visualizer.py:79-146 —
a 6-deep python loop over 128 corner-correspondence hypotheses, each solved
by a 4x4 SVD null-space and scored by reprojected-bbox IoU. Re-designed as a
single batched computation: the hypothesis table is a static (128, 4, 3)
sign tensor, all SVDs run as one vmapped batch, and the best hypothesis is
an argmax — vmap again over objects for the multi-detection case.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from anytime3d_tpu.geometry.projection import KITTI_PROJ


def _hypothesis_signs() -> np.ndarray:
    """(128, 4, 3) sign table replicating the reference loop nest order
    (visualizer.py:85-118): rows = corner offsets for the (x_min, y_min,
    x_max, y_max) constraints, entries multiply (dx, dy, dz)."""
    xmin_sets = [[(-1, -1, -1), (-1, -1, 1)], [(-1, 1, -1), (-1, 1, 1)]]
    xmax_sets = [[(1, 1, -1), (1, 1, 1)], [(1, -1, 1), (1, -1, -1)]]
    ymin_sets = [[(-1, -1, 1), (1, -1, 1)], [(-1, 1, 1), (1, 1, 1)]]
    ymax_sets = [[(-1, 1, -1), (1, 1, -1)], [(-1, -1, -1), (1, -1, -1)]]
    hyps = []
    for xs, xm in zip(xmin_sets + xmax_sets, xmax_sets + xmin_sets):
        for ys, ym in zip(ymin_sets, ymax_sets):
            for a in xs:
                for b in ys:
                    for c in xm:
                        for d in ym:
                            hyps.append((a, b, c, d))
    return np.asarray(hyps, dtype=np.float32)  # (128, 4, 3)


_SIGNS = _hypothesis_signs()


def _constraint_matrices(proj, r, offsets):
    """offsets (4, 3) corner offsets -> M (4, 4, 4): proj @ [[I | R o],[0 1]]."""
    ro = jnp.einsum("ij,kj->ki", r, offsets)  # (4, 3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=ro.dtype), (4, 3, 3))
    top = jnp.concatenate([eye, ro[:, :, None]], axis=-1)  # (4, 3, 4)
    bottom = jnp.broadcast_to(
        jnp.asarray([[0.0, 0.0, 0.0, 1.0]], ro.dtype), (4, 1, 4)
    )
    m = jnp.concatenate([top, bottom], axis=-2)  # (4, 4, 4)
    return jnp.einsum("ij,kjl->kil", jnp.asarray(proj, ro.dtype), m)


def recover_translation(
    bbox2d: jnp.ndarray,
    bbox3d_whl: jnp.ndarray,
    r: jnp.ndarray,
    proj: jnp.ndarray = KITTI_PROJ,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Recover object translation. Returns (t (3,), best_iou ()).

    ``bbox2d`` = [x_min, y_min, x_max, y_max] in pixels; ``bbox3d_whl`` =
    (w, h, l) metric box size; ``r`` (3, 3) object rotation. best_iou < 0
    means no valid hypothesis (the reference returns a zero translation).
    """
    x_min, y_min, x_max, y_max = bbox2d[0], bbox2d[1], bbox2d[2], bbox2d[3]
    w, h, l = bbox3d_whl[0], bbox3d_whl[1], bbox3d_whl[2]
    half = jnp.stack([w / 2.0, l / 2.0, h / 2.0])  # (dx, dy, dz), visualizer.py:82

    proj = jnp.asarray(proj, jnp.float32)
    offsets = jnp.asarray(_SIGNS) * half  # (128, 4, 3)

    def solve(offs):
        m = _constraint_matrices(proj, r, offs)  # (4, 4, 4)
        vals = jnp.stack([x_min, y_min, x_max, y_max])
        rows = jnp.stack(
            [
                m[0, 0, :] - vals[0] * m[0, 2, :],
                m[1, 1, :] - vals[1] * m[1, 2, :],
                m[2, 0, :] - vals[2] * m[2, 2, :],
                m[3, 1, :] - vals[3] * m[3, 2, :],
            ]
        )  # (4, 4)
        _, _, vh = jnp.linalg.svd(rows, full_matrices=True)
        t = vh[-1, :]
        sign_ok = t[-1] * t[-2] > 0
        t = t / jnp.where(t[-1] == 0, 1.0, t[-1])
        # reproject each constraint corner through its own M (visualizer.py:125-132)
        p = jnp.einsum("kij,j->ki", m, t)  # (4, 4)
        uv = p[:, :2] / p[:, 2:3]
        x_min_p, y_min_p, x_max_p, y_max_p = uv[0, 0], uv[1, 1], uv[2, 0], uv[3, 1]
        order_ok = (x_min_p < x_max_p) & (y_min_p < y_max_p)
        area_p = (x_max_p - x_min_p) * (y_max_p - y_min_p)
        area_g = (x_max - x_min) * (y_max - y_min)
        xi0, xi1 = jnp.maximum(x_min_p, x_min), jnp.minimum(x_max_p, x_max)
        yi0, yi1 = jnp.maximum(y_min_p, y_min), jnp.minimum(y_max_p, y_max)
        inter = (xi1 - xi0) * (yi1 - yi0)
        iou = inter / (area_p + area_g - inter)
        valid = sign_ok & order_ok & (iou < 1.0)
        return jnp.where(valid, iou, -1.0), t[:3]

    ious, ts = jax.vmap(solve)(offsets)  # (128,), (128, 3)
    best = jnp.argmax(ious)
    t_best = jnp.where(ious[best] > 0, ts[best], jnp.zeros(3, ts.dtype))
    return t_best, ious[best]


recover_translation_batch = jax.vmap(recover_translation, in_axes=(0, 0, 0, None))
