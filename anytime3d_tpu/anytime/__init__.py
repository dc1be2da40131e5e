"""Anytime engine: masked-latent evaluation, prior correction, and recursive
Gaussian latent fusion (the mapping backend). Reference mechanism:
src/module/nolbo.py:161-259 (getEval + correction), generalized per
BASELINE.json to a per-observation information-filter update.
"""

from anytime3d_tpu.anytime.engine import (
    anytime_eval,
    classify_by_prior,
    correct_latent,
    GaussianBelief,
    OccupancyBelief,
    anytime_eval_jit,
    fuse_observation,
    fuse_occupancy,
    fuse_sequence,
    fuse_sequence_sharded,
)
from anytime3d_tpu.anytime.reconstructor import AnytimeReconstructor

__all__ = [
    "anytime_eval",
    "classify_by_prior",
    "correct_latent",
    "GaussianBelief",
    "OccupancyBelief",
    "anytime_eval_jit",
    "fuse_observation",
    "fuse_occupancy",
    "fuse_sequence",
    "fuse_sequence_sharded",
    "AnytimeReconstructor",
]
