"""Pure functional ops library (JAX). Reference semantics: src/module/function.py."""

from anytime3d_tpu.ops.sampling import reparameterize, mask_latent
from anytime3d_tpu.ops.losses import (
    gaussian_kl,
    focal_binary_loss,
    prior_repulsion,
    softmax_cross_entropy,
)
from anytime3d_tpu.ops.metrics import voxel_tp_fp_fn, voxel_precision_recall, topk_accuracy
from anytime3d_tpu.ops.nms import nms, box_iou_matrix
from anytime3d_tpu.ops.kmeans import kmeans_sincos, sincos_distance

__all__ = [
    "reparameterize",
    "mask_latent",
    "gaussian_kl",
    "focal_binary_loss",
    "prior_repulsion",
    "softmax_cross_entropy",
    "voxel_tp_fp_fn",
    "voxel_precision_recall",
    "topk_accuracy",
    "nms",
    "box_iou_matrix",
    "kmeans_sincos",
    "sincos_distance",
]
