"""Vectorized, jit-able greedy non-maximum suppression.

Reference semantics: nonMaximumSuppresion at src/module/function.py:117-150
(host NumPy loop with dynamic deletes). Re-designed for XLA: fixed-size,
mask-based greedy selection under ``lax.fori_loop`` — no data-dependent
shapes, so it compiles once and runs on-device inside the detector path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU for boxes laid out [x_min, y_min, x_max, y_max, ...].

    Matches the reference's area convention (no +1 pixel correction; negative
    extents allowed to produce negative areas exactly as the NumPy code does).
    """
    x_min, y_min, x_max, y_max = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (y_max - y_min) * (x_max - x_min)
    xx_min = jnp.maximum(x_min[:, None], x_min[None, :])
    yy_min = jnp.maximum(y_min[:, None], y_min[None, :])
    xx_max = jnp.minimum(x_max[:, None], x_max[None, :])
    yy_max = jnp.minimum(y_max[:, None], y_max[None, :])
    w = jnp.maximum(0.0, xx_max - xx_min)
    h = jnp.maximum(0.0, yy_max - yy_min)
    inter = w * h
    union = area[:, None] + area[None, :] - inter
    return inter / (union + 1e-12)


def nms(
    boxes: jnp.ndarray,
    iou_threshold: float = 0.5,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Greedy NMS over fixed-size box set; returns a keep mask.

    ``boxes``: (N, 5+) with [x_min, y_min, x_max, y_max, score].
    ``valid``: optional (N,) bool — padding slots marked False never win.

    Greedy order is by descending score; a box is kept iff no higher-scoring
    kept box overlaps it above ``iou_threshold``. This is the standard
    sequential-greedy formulation expressed as a masked scan, equivalent to
    the reference's delete-loop, and O(N^2) on the VPU instead of host python.
    """
    n = boxes.shape[0]
    scores = boxes[:, 4]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    scores = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-scores)  # descending
    iou = box_iou_matrix(boxes)

    def body(i, state):
        keep, suppressed = state
        idx = order[i]
        is_valid = valid[idx] & ~suppressed[idx]
        keep = keep.at[idx].set(is_valid)
        # suppress overlapping lower-ranked boxes
        overlap = iou[idx] > iou_threshold
        newly = overlap & is_valid
        suppressed = suppressed | (newly & (jnp.arange(n) != idx))
        return keep, suppressed

    keep0 = jnp.zeros((n,), dtype=bool)
    sup0 = jnp.zeros((n,), dtype=bool)
    keep, _ = jax.lax.fori_loop(0, n, body, (keep0, sup0))
    return keep


def nms_indices(boxes_np, iou_threshold: float = 0.5):
    """Host convenience wrapper: returns kept indices sorted by score desc."""
    import numpy as np

    boxes_np = np.asarray(boxes_np)
    if len(boxes_np) == 0:
        return []
    keep = np.asarray(nms(jnp.asarray(boxes_np), iou_threshold))
    idx = np.nonzero(keep)[0]
    return list(idx[np.argsort(-boxes_np[idx, 4])])
