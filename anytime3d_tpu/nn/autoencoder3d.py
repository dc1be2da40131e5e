"""3D convolutional voxel encoder/decoder (3D-GAN style).

Reference semantics: encoder3D/decoder3D at src/net_core/autoencoder3D.py:
72-139 — the single shared voxel decoder used by every model in the
reference. Config mirrors the reference structure dicts; norm is GroupNorm.
The decoder's linear stage reshapes to (D/prod(strides))^3 x max(filters[0]/64, 8)
channels exactly as the reference computes it (autoencoder3D.py:115-120).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from anytime3d_tpu.nn.blocks import (
    ConvBlock3D,
    DeconvBlock3D,
    DenseBlock,
    activation,
)


@dataclasses.dataclass(frozen=True)
class Encoder3DConfig:
    """Mirrors the reference encoder structure dict (autoencoder3D.py:5-14)."""

    output_dim: int = 400
    filter_nums: Tuple[int, ...] = (64, 128, 256, 512)
    filter_sizes: Tuple[int, ...] = (4, 4, 4, 4, 4)
    strides: Tuple[int, ...] = (2, 2, 2, 2, 1)
    final_pool: str = "average"  # 'average' | 'max' | 'none'
    act: str = "elu"
    final_act: str = "none"  # 'sigmoid' | 'none'

    @property
    def all_filters(self) -> Tuple[int, ...]:
        return tuple(self.filter_nums) + (self.output_dim,)


@dataclasses.dataclass(frozen=True)
class Decoder3DConfig:
    """Mirrors the reference decoder structure dict (autoencoder3D.py:15-24)."""

    input_dim: int = 200
    output_shape: Tuple[int, int, int, int] = (64, 64, 64, 1)
    filter_nums: Tuple[int, ...] = (512, 256, 128, 64, 1)
    filter_sizes: Tuple[int, ...] = (4, 4, 4, 4, 4)
    strides: Tuple[int, ...] = (1, 2, 2, 2, 2)
    act: str = "elu"
    final_act: str = "sigmoid"


class Encoder3D(nn.Module):
    """Voxel grid (B, D, H, W, C) -> latent vector (B, output_dim)."""

    config: Encoder3DConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        filters = cfg.all_filters
        for f, k, s in zip(filters[:-1], cfg.filter_sizes[:-1], cfg.strides[:-1]):
            x = ConvBlock3D(f, k, s, act=cfg.act, dtype=self.dtype)(x)
        # final conv: no norm, no activation (autoencoder3D.py:86-88)
        x = nn.Conv(
            filters[-1],
            (cfg.filter_sizes[-1],) * 3,
            strides=(cfg.strides[-1],) * 3,
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
        )(x)
        if cfg.final_pool == "average":
            x = jnp.mean(x, axis=(1, 2, 3))
        elif cfg.final_pool == "max":
            x = jnp.max(x, axis=(1, 2, 3))
        return activation(cfg.final_act)(x)


class Decoder3D(nn.Module):
    """Latent vector (B, input_dim) -> occupancy grid (B, D, H, W, C)."""

    config: Decoder3DConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        spatial = np.asarray(cfg.output_shape[:-1]) // int(np.prod(cfg.strides))
        ch = max(cfg.filter_nums[0] // 64, 8)
        x = DenseBlock(int(np.prod(spatial)) * ch, act=cfg.act, dtype=self.dtype)(z)
        x = x.reshape((z.shape[0], *spatial, ch))
        for f, k, s in zip(cfg.filter_nums[:-1], cfg.filter_sizes[:-1], cfg.strides[:-1]):
            x = DeconvBlock3D(f, k, s, act=cfg.act, dtype=self.dtype)(x)
        x = nn.ConvTranspose(
            cfg.filter_nums[-1],
            (cfg.filter_sizes[-1],) * 3,
            strides=(cfg.strides[-1],) * 3,
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
        )(x)
        return activation(cfg.final_act)(x)
