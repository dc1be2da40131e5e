"""End-to-end multi-object scene pipeline: image -> detections -> shapes ->
metric 3D poses/point clouds.

This composes DetectorReconstructor (src/module/nolbo_test.py analogue) with
the geometry layer (src/visualizer/visualizer.py:237-308 analogue) into the
full KITTI in-the-wild path: the reference runs these as two separate host
programs; here it is one jit-able function of (params, image).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from anytime3d_tpu.geometry import KITTI_PROJ, KITTI_PROJ_INV, lift_detections
from anytime3d_tpu.models.detector import DetectorConfig, DetectorReconstructor


def scene_reconstruction(
    model: DetectorReconstructor,
    params,
    image: jnp.ndarray,  # (1, H, W, 3) normalized [0, 1]
    key: jax.Array,
    image_size_px: Tuple[int, int],  # (cols, rows) of the original frame
    obj_thresh: float = 0.5,
    iou_thresh: float = 0.5,
    proj=KITTI_PROJ,
    proj_inv=KITTI_PROJ_INV,
    sample_shapes: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Full scene pass. Returns fixed-size (K = config.max_detections) arrays:
    detections (boxes/orientations/latents), decoded shapes (K, 64³), world
    poses (K, 4, 4), projected 3D boxes, and a combined ``valid`` mask.
    """
    det = model.apply(
        {"params": params}, image, obj_thresh, iou_thresh,
        method=DetectorReconstructor.detect,
    )
    shapes = model.apply(
        {"params": params}, key, det["z_mean"], det["z_log_var"], sample_shapes,
        method=DetectorReconstructor.reconstruct,
    )
    # detector bbox3d channel order is (w, h, l) (nolbo_test.py:119)
    lifted = lift_detections(
        det["bbox2d"],
        det["bbox3d"],
        det["ori_sin"],
        det["ori_cos"],
        image_size=image_size_px,
        valid=det["valid"],
        proj=proj,
        proj_inv=proj_inv,
    )
    return {
        "bbox2d": det["bbox2d"],
        "bbox3d": det["bbox3d"],
        "ori_sin": det["ori_sin"],
        "ori_cos": det["ori_cos"],
        "z_mean": det["z_mean"],
        "z_log_var": det["z_log_var"],
        "shapes": shapes,
        "pose": lifted["pose"],
        "bbox3d_corners_px": lifted["bbox3d_corners_px"],
        "hypothesis_iou": lifted["hypothesis_iou"],
        # lifted validity folds in the reference's border-margin + depth
        # gates (visualizer.py:249,295) — dense synthetic frames legitimately
        # detect objects NEAR borders, so expose raw detection validity too
        # (draw_scene overlays 2D boxes for these, 3D only where lifted).
        "valid": lifted["valid"],
        "valid_det": det["valid"],
    }
