"""Shared building blocks: conv/deconv/dense + GroupNorm + activation.

Reference counterparts: Darknet53Conv/Darknet19Conv (src/net_core/darknet.py:
11-31, 83-94), conv3DEnc/conv3DDec/linearTransform (src/net_core/
autoencoder3D.py:26-70). Differences by design (TPU-first):

- GroupNorm replaces BatchNorm: no cross-replica batch statistics, identical
  behavior train vs eval, plays well with pjit/shard_map (SURVEY.md §7.2).
- No kernel L2 inside modules; weight decay is applied functionally by the
  train step (``anytime3d_tpu.train.step.l2_penalty``) to keep modules pure.
- Compute dtype is a parameter (bfloat16 on TPU); params stay float32.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any

ACTIVATIONS: dict[str, Callable] = {
    "elu": nn.elu,
    "relu": nn.relu,
    "lrelu": lambda x: nn.leaky_relu(x, negative_slope=0.1),
    "sigmoid": nn.sigmoid,
    "tanh": nn.tanh,
    "none": lambda x: x,
}


def activation(name: str | None) -> Callable:
    if name is None:
        return ACTIVATIONS["none"]
    return ACTIVATIONS[str(name).lower()]


def _num_groups(channels: int, max_groups: int = 32) -> int:
    """Largest divisor of ``channels`` that is <= max_groups."""
    g = min(max_groups, channels)
    while channels % g != 0:
        g -= 1
    return g


def group_norm(channels: int, dtype: Dtype = jnp.float32) -> nn.GroupNorm:
    return nn.GroupNorm(num_groups=_num_groups(channels), dtype=dtype, epsilon=1e-5)


class ConvBlock2D(nn.Module):
    """Conv2D (no bias) + GroupNorm + activation."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    act: str = "elu"
    use_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding="SAME",
            use_bias=not self.use_norm,
            dtype=self.dtype,
        )(x)
        if self.use_norm:
            x = group_norm(self.features, self.dtype)(x)
            x = activation(self.act)(x)
        return x


class ConvBlock3D(nn.Module):
    """Conv3D (no bias) + GroupNorm + activation (conv3DEnc analogue)."""

    features: int
    kernel_size: int = 4
    strides: int = 2
    act: str = "elu"
    use_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel_size,) * 3,
            strides=(self.strides,) * 3,
            padding="SAME",
            use_bias=not self.use_norm,
            dtype=self.dtype,
        )(x)
        if self.use_norm:
            x = group_norm(self.features, self.dtype)(x)
            x = activation(self.act)(x)
        return x


class DeconvBlock3D(nn.Module):
    """ConvTranspose3D (no bias) + GroupNorm + activation (conv3DDec analogue)."""

    features: int
    kernel_size: int = 4
    strides: int = 2
    act: str = "elu"
    use_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(
            self.features,
            (self.kernel_size,) * 3,
            strides=(self.strides,) * 3,
            padding="SAME",
            use_bias=not self.use_norm,
            dtype=self.dtype,
        )(x)
        if self.use_norm:
            x = group_norm(self.features, self.dtype)(x)
            x = activation(self.act)(x)
        return x


class DenseBlock(nn.Module):
    """Flatten + Dense + LayerNorm + activation (linearTransform analogue).

    LayerNorm, not GroupNorm: on a (B, C) tensor GroupNorm's per-group
    normalization degenerates (singleton groups normalize to zero), while
    LayerNorm normalizes over the full feature axis.
    """

    features: int
    act: str = "elu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.features, dtype=self.dtype)(x)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        return activation(self.act)(x)


def maxpool2d(x, window: int = 2, stride: int = 2):
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding="SAME")
