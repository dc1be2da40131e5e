"""Evaluation protocols: missing-rate sweeps, PR curves, latent statistics.

Reference counterparts: the 17 test_*.py scripts + the PR-curve notebooks
(SURVEY.md §2.6, §6).
"""

from anytime3d_tpu.evaluation.protocols import (
    missing_rate_sweep,
    pr_curve,
    category_vectors,
    evaluate_epoch,
)
from anytime3d_tpu.evaluation.dump import dump_reconstructions
from anytime3d_tpu.evaluation.detection import evaluate_detector, grid_targets_to_boxes

__all__ = [
    "evaluate_detector",
    "grid_targets_to_boxes",
    "missing_rate_sweep",
    "pr_curve",
    "category_vectors",
    "evaluate_epoch",
    "dump_reconstructions",
]
