"""Drawing utilities: 2D/3D bounding boxes on images.

Reference semantics: draw2Dbbox / draw3Dbbox at src/visualizer/visualizer.py:
208-235 (cv2 line drawing of the projected cube with front/back X marks).
cv2 import is lazy so headless metric pipelines never require it.
"""

from __future__ import annotations

import numpy as np

# cube edges as corner-index pairs; corners indexed by sign bits (sx, sy, sz)
# -> idx = 4*sx + 2*sy + sz (matching geometry.project_bbox3d_corners order)
_EDGES = [
    (0, 1), (0, 2), (1, 3), (2, 3),  # -x face
    (4, 5), (4, 6), (5, 7), (6, 7),  # +x face
    (0, 4), (1, 5), (2, 6), (3, 7),  # connections
]
_CROSSES = [(0, 5), (1, 4), (2, 7), (3, 6)]  # front/back X marks


def draw_bbox2d(image: np.ndarray, bbox_px, color=(0, 255, 0), thickness=2) -> np.ndarray:
    import cv2

    img = np.ascontiguousarray(image)
    p0 = (int(bbox_px[0]), int(bbox_px[1]))
    p1 = (int(bbox_px[2]), int(bbox_px[3]))
    cv2.rectangle(img, p0, p1, color=color, thickness=thickness)
    return img


def draw_bbox3d(
    image: np.ndarray,
    corners_px: np.ndarray,  # (8, 2) from geometry.project_bbox3d_corners
    color=(255, 0, 255),
    cross_color=(255, 0, 0),
    thickness=2,
) -> np.ndarray:
    import cv2

    img = np.ascontiguousarray(image)
    c = np.asarray(corners_px).astype(int)
    for a, b in _EDGES:
        cv2.line(img, tuple(c[a]), tuple(c[b]), color=color, thickness=thickness)
    for a, b in _CROSSES:
        cv2.line(img, tuple(c[a]), tuple(c[b]), color=cross_color, thickness=1)
    return img


def draw_scene(image: np.ndarray, scene: dict) -> np.ndarray:
    """Overlay every valid detection from models.pipeline.scene_reconstruction."""
    img = np.ascontiguousarray((np.asarray(image) * 255).astype(np.uint8))
    valid = np.asarray(scene["valid"])
    # 2D boxes for every raw detection; 3D overlays only where the metric
    # lifting passed its border/depth gates (visualizer.py:249,295)
    valid_det = np.asarray(scene.get("valid_det", scene["valid"]))
    boxes2d = np.asarray(scene["bbox2d"])
    corners = np.asarray(scene["bbox3d_corners_px"])
    rows, cols = img.shape[:2]
    for k in range(len(valid_det)):
        if not valid_det[k]:
            continue
        px = boxes2d[k, :4] * np.array([cols, rows, cols, rows])
        img = draw_bbox2d(img, px)
        if valid[k]:
            img = draw_bbox3d(img, corners[k])
    return img
