"""Bit-packed voxel transfer: 1 bit/voxel host->device, unpack on device.

A (32, 64³) float32 occupancy batch is 33.5 MB per step of host->device
traffic; bit-packed it is 1.05 MB (32×). The reference ships full float
grids every step (modelnet_dataset.py:83). Packing is np.packbits (C speed)
on the host; unpacking is a shift-and-mask inside the jitted step, fused by
XLA into the consumer.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def pack_voxels(vox: np.ndarray) -> np.ndarray:
    """(B, ...) occupancy (any float/bool >0.5 = occupied) -> (B, ceil(N/8))
    uint8, MSB-first within each byte."""
    b = vox.shape[0]
    flat = (np.asarray(vox).reshape(b, -1) > 0.5)
    return np.packbits(flat, axis=-1)


def unpack_voxels(
    packed: jnp.ndarray, shape: Sequence[int], dtype=jnp.float32
) -> jnp.ndarray:
    """(B, ceil(N/8)) uint8 -> (B, *shape) in {0, 1}. Device-side, jit-safe."""
    b = packed.shape[0]
    n = math.prod(shape)
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)  # MSB-first
    bits = (packed[:, :, None] >> shifts) & jnp.uint8(1)
    return bits.reshape(b, -1)[:, :n].reshape(b, *shape).astype(dtype)


def blocked_shape(shape: Sequence[int], block: int = 4) -> Tuple[int, ...]:
    """The s2d(block) coarse layout of a (D, H, W, C) grid."""
    d, h, w, c = shape
    if d % block or h % block or w % block:
        raise ValueError(f"grid {shape} not divisible by block {block}")
    return (d // block, h // block, w // block, block**3 * c)


def pack_voxels_blocked(vox: np.ndarray, block: int = 4) -> np.ndarray:
    """Pack occupancy bits in the s2d(block) coarse-layout order so the
    device-side unpack lands DIRECTLY in the blocked layout the blocked-head
    encoder consumes (channel order (bd, bh, bw, c)) — no device relayout,
    and the fine grid with its lane-padded 1-wide channel dim never exists
    on device. Host cost is one extra transpose before np.packbits."""
    v = np.asarray(vox)
    if v.ndim == 4:  # (B, D, H, W) -> add channel dim
        v = v[..., None]
    B, D, H, W, C = v.shape
    b = block
    v = v.reshape(B, D // b, b, H // b, b, W // b, b, C)
    v = v.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return pack_voxels(v.reshape(B, -1))


def unpack_voxels_blocked(
    packed: jnp.ndarray, shape: Sequence[int], block: int = 4, dtype=jnp.float32
) -> jnp.ndarray:
    """Inverse of ``pack_voxels_blocked``: (B, N/8) uint8 -> the s2d(block)
    coarse layout (B, D/b, H/b, W/b, b^3*C) of a (D, H, W, C) grid."""
    return unpack_voxels(packed, blocked_shape(shape, block), dtype=dtype)
