"""Geometry layer: camera projection, viewing-ray rotation, SVD translation
recovery, and metric lifting of detections. Reference semantics:
src/visualizer/visualizer.py (host NumPy with hand-unrolled matmuls and a
128-hypothesis python loop nest) — re-designed as batched JAX: one vmapped
SVD over all hypotheses × all objects.
"""

from anytime3d_tpu.geometry.projection import (
    KITTI_PROJ,
    KITTI_PROJ_INV,
    get_ray,
    ray_rotation,
    euler_to_rotation,
    compose_object_rotation,
    project_points,
    project_bbox3d_corners,
)
from anytime3d_tpu.geometry.translation import recover_translation
from anytime3d_tpu.geometry.twoview import (
    TwoViewResult,
    estimate_essential,
    decompose_essential,
    triangulate,
    two_view_pose,
)
from anytime3d_tpu.geometry.features import (
    Keypoints,
    Matches,
    harris_response,
    detect_keypoints,
    extract_descriptors,
    match_descriptors,
)
from anytime3d_tpu.geometry.lifting import (
    voxel_grid_points,
    rescale_transform_points,
    lift_detections,
)

__all__ = [
    "KITTI_PROJ",
    "KITTI_PROJ_INV",
    "get_ray",
    "ray_rotation",
    "euler_to_rotation",
    "compose_object_rotation",
    "project_points",
    "project_bbox3d_corners",
    "recover_translation",
    "Keypoints",
    "Matches",
    "harris_response",
    "detect_keypoints",
    "extract_descriptors",
    "match_descriptors",
    "TwoViewResult",
    "estimate_essential",
    "decompose_essential",
    "triangulate",
    "two_view_pose",
    "voxel_grid_points",
    "rescale_transform_points",
    "lift_detections",
]
