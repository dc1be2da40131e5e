"""Quality metrics: voxel precision/recall, IoU, classification accuracy.

Reference semantics: voxelPrecisionRecall at src/module/function.py:100-115 and
the top-k accuracy in src/module/classifier.py:43-59.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def voxel_tp_fp_fn(
    target: jnp.ndarray, pred: jnp.ndarray, threshold: float = 0.5
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-sample TP/FP/FN counts at an occupancy threshold.

    ``target`` is a {0,1} grid, ``pred`` holds probabilities. Grids are
    flattened per sample; returns three (B,) arrays.
    """
    n = target.shape[0]
    y = target.reshape(n, -1).astype(jnp.float32)
    p = (pred.reshape(n, -1) >= threshold).astype(jnp.float32)
    tp = jnp.sum(y * p, axis=-1)
    fp = jnp.sum((1.0 - y) * p, axis=-1)
    fn = jnp.sum(y * (1.0 - p), axis=-1)
    return tp, fp, fn


def voxel_precision_recall(
    target: jnp.ndarray, pred: jnp.ndarray, threshold: float = 0.5, eps: float = 1e-10
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batch-mean voxel precision and recall at ``threshold``."""
    tp, fp, fn = voxel_tp_fp_fn(target, pred, threshold)
    precision = jnp.mean(tp / (tp + fp + eps))
    recall = jnp.mean(tp / (tp + fn + eps))
    return precision, recall


def voxel_iou(
    target: jnp.ndarray, pred: jnp.ndarray, threshold: float = 0.5, eps: float = 1e-10
) -> jnp.ndarray:
    """Batch-mean voxel intersection-over-union at ``threshold``."""
    tp, fp, fn = voxel_tp_fp_fn(target, pred, threshold)
    return jnp.mean(tp / (tp + fp + fn + eps))


def topk_accuracy(logits: jnp.ndarray, onehot: jnp.ndarray, k: int = 1) -> jnp.ndarray:
    """Batch-mean top-k accuracy for one-hot targets."""
    gt = jnp.argmax(onehot, axis=-1)
    if k == 1:
        return jnp.mean((jnp.argmax(logits, axis=-1) == gt).astype(jnp.float32))
    _, topk = jax.lax.top_k(logits, k)
    hit = jnp.any(topk == gt[:, None], axis=-1)
    return jnp.mean(hit.astype(jnp.float32))
