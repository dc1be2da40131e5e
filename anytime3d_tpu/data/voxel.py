"""Voxel utilities: binarization, nearest-neighbor zoom, axis conversion.

Reference semantics: _voxBatch_covert_axis_32to64 at
src/dataset_loader/modelnet_dataset.py:22-26 (scipy zoom + transpose +
re-binarize) and the CAD binarize at pascal3D.py:132-154.
"""

from __future__ import annotations

import numpy as np


def binarize(vox: np.ndarray, threshold: float = 0.5) -> np.ndarray:
    return (vox >= threshold).astype(np.float32)


def zoom_nearest(vox: np.ndarray, factor: int = 2) -> np.ndarray:
    """Integer-factor nearest-neighbor upsample of a (..., D, H, W) grid —
    np.repeat along each spatial axis (faster and exact vs scipy.ndimage.zoom
    for integer factors)."""
    out = np.repeat(vox, factor, axis=-3)
    out = np.repeat(out, factor, axis=-2)
    return np.repeat(out, factor, axis=-1)


def convert_axis_32to64(vox_batch: np.ndarray) -> np.ndarray:
    """(B, 32, 32, 32) -> (B, 64, 64, 64): transpose (z, x, y) axis order then
    2x nearest zoom then re-binarize (modelnet_dataset.py:22-26)."""
    v = np.transpose(vox_batch, (0, 2, 3, 1))
    v = zoom_nearest(v, 2)
    return binarize(v, 0.5)
