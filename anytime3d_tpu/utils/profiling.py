"""Profiling + compilation-cache helpers (the reference has neither,
SURVEY.md §5 tracing)."""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def step_annotation(name: str, step: int):
    """jax.profiler step annotation — visible in TensorBoard/XProf traces."""
    import jax

    with jax.profiler.StepTraceAnnotation(name, step_num=step):
        yield


def enable_compilation_cache(path: str = "/tmp/anytime3d_jax_cache") -> None:
    """Persist XLA compilations across processes (first compile of the 64³
    stack costs minutes over the remote-compile tunnel)."""
    import jax

    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags


def trace(log_dir: str = "/tmp/anytime3d_trace"):
    """Context manager capturing a device trace for offline inspection."""
    import jax

    return jax.profiler.trace(log_dir)
