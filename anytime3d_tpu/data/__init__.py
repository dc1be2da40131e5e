"""Data layer: sharded host loaders + pure-NumPy/cv2 augmentation feeding the
device via a background prefetcher. Reference counterparts: src/dataset_loader/
(modelnet_dataset.py, pascal3D.py, Imagenet_dataset.py, datasetUtils.py, and
the MISSING KITTI_dataset.py reconstructed here from its call sites).
"""

from anytime3d_tpu.data.voxel import binarize, zoom_nearest, convert_axis_32to64
from anytime3d_tpu.data.modelnet import (
    ModelNetLoader,
    SyntheticImageObjectLoader,
    SyntheticMultiObjectLoader,
    SyntheticVoxelLoader,
)
from anytime3d_tpu.data.augment import (
    image_random_augmentation,
    remap_bbox,
    random_flip_horizontal,
)
from anytime3d_tpu.data.pascal3d import Pascal3DSingleObjectLoader, Pascal3DMultiObjectLoader
from anytime3d_tpu.data.kitti import KittiSingleObjectLoader
from anytime3d_tpu.data.imagenet import ImagenetLoader
from anytime3d_tpu.data.prefetch import DevicePrefetcher

__all__ = [
    "binarize",
    "zoom_nearest",
    "convert_axis_32to64",
    "ModelNetLoader",
    "SyntheticVoxelLoader",
    "SyntheticImageObjectLoader",
    "SyntheticMultiObjectLoader",
    "image_random_augmentation",
    "remap_bbox",
    "random_flip_horizontal",
    "Pascal3DSingleObjectLoader",
    "Pascal3DMultiObjectLoader",
    "KittiSingleObjectLoader",
    "ImagenetLoader",
    "DevicePrefetcher",
]
