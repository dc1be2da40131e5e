"""Utilities: metric logging, profiling annotations, compilation cache."""

from anytime3d_tpu.utils.logging import MetricLogger
from anytime3d_tpu.utils.profiling import step_annotation, enable_compilation_cache

__all__ = ["MetricLogger", "step_annotation", "enable_compilation_cache"]
