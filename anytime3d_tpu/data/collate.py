"""Batch collation for the multi-object detector training path.

Pascal3DMultiObjectLoader returns per-image ragged voxel lists; the jitted
detector step needs static shapes — this pads voxel slots to a fixed budget
and stacks the grid targets (the reference's objOrderingImage machinery,
pascal3D.py:447-524, served the same purpose eagerly).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def collate_multiobject(
    images: np.ndarray,
    targets: Dict[str, np.ndarray],
    voxel_lists: Sequence[np.ndarray],
    max_slots: int = 8,
) -> Dict[str, np.ndarray]:
    """Pad each image's voxel list to ``max_slots`` and clamp slot indices.

    Objects whose voxel index overflows the budget keep their grid presence
    (objness/bbox supervision) but lose shape supervision (slot -> -1)."""
    b = len(voxel_lists)
    sample = voxel_lists[0]
    vox_shape = sample.shape[1:]
    voxels = np.zeros((b, max_slots, *vox_shape), np.float32)
    slot = targets["voxel_slot"].copy()
    for i, vl in enumerate(voxel_lists):
        n = min(len(vl), max_slots)
        voxels[i, :n] = vl[:n]
        overflow = slot[i] >= max_slots
        slot[i][overflow] = -1
    out = {
        "images": images.astype(np.float32),
        "objness": targets["objness"],
        "bbox": targets["bbox"],
        "sin": targets["sin"],
        "cos": targets["cos"],
        "inst": targets["inst"],
        "voxel_slot": slot,
        "voxels": voxels,
    }
    if "bbox3d" in targets:  # metric (w, h, l) supervision when available
        out["bbox3d"] = targets["bbox3d"]
    return out
