"""Config dataclass for the 2D encoder head (kept separate to avoid cycles)."""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class Head2DConfig:
    """Mirrors the reference encoder_head structure dict (nolbo.py:16-22)."""

    output_dim: int
    filter_nums: Tuple[int, ...] = (1024, 1024, 1024, 1024)
    filter_sizes: Tuple[int, ...] = (3, 3, 3, 1)
    last_pooling: Optional[str] = "max"
    act: str = "elu"
