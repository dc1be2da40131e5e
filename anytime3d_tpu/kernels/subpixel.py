"""Sub-pixel (depth-to-space) formulation of the stride-2 3D transposed conv.

The reference decoder's hot path is 4 stride-2 Conv3DTranspose layers over
64³ grids (autoencoder3D.py:104-139, SURVEY.md §3.1 "dominant FLOPs"). XLA
lowers transposed conv to an input-dilated conv — the MXU then convolves a
2x-dilated input where half the multiplies hit inserted zeros.

Derivation (per axis, stride 2, kernel 4; flax ConvTranspose SAME maps
output o = 2i + 2 - t, verified by impulse probing):
  y[2m+p] = W[p]·x[m+p-1] + W[p+2]·x[m+p],   p ∈ {0, 1}
i.e. each output parity class is a dense 2-tap conv of the input at a
parity-dependent offset. In 3D: pad the input by 1 on both sides, run ONE
kernel-2³ VALID conv with 8·C_out output channels over the (D+1)³ window
positions, then slice each parity's (D)³ positions and interleave
(depth-to-space). Every multiply is dense — the MXU sees a plain
[spatial, 2³·C_in] × [2³·C_in, 8·C_out] contraction; the (D+1)³/D³ overlap
overhead is <5% for D ≥ 8.

``convtranspose_kernel_to_subpixel`` maps flax ConvTranspose kernels into
this layout exactly (tested bit-for-bit vs flax), so checkpoints transfer.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def subpixel_deconv3d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 transposed conv via dense conv + parity slice + interleave.

    x: (B, D, H, W, C_in); w: (2, 2, 2, C_in, 8*C_out) — the last axis is
    ordered (pd, ph, pw, c) with parity strides (4*C, 2*C, C, 1).
    Returns (B, 2D, 2H, 2W, C_out).
    """
    b, d, h, ww_, c_in = x.shape
    c_out = w.shape[-1] // 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp,
        w,
        window_strides=(1, 1, 1),
        padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype,
    )  # (B, D+1, H+1, W+1, 8*C_out)
    y = y.reshape(b, d + 1, h + 1, ww_ + 1, 2, 2, 2, c_out)
    # parity p reads window positions [p : p+D] in each axis
    rows = []
    for pd in range(2):
        cols = []
        for ph in range(2):
            deps = []
            for pw in range(2):
                deps.append(
                    y[:, pd : pd + d, ph : ph + h, pw : pw + ww_, pd, ph, pw, :]
                )
            cols.append(jnp.stack(deps, axis=4))  # (B, D, H, W, 2, C)
        rows.append(jnp.stack(cols, axis=4))  # (B, D, H, W, 2, 2, C)
    out = jnp.stack(rows, axis=4)  # (B, D, H, W, 2, 2, 2, C)
    out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7)  # (B, D, 2, H, 2, W, 2, C)
    return out.reshape(b, 2 * d, 2 * h, 2 * ww_, c_out)


def convtranspose_kernel_to_subpixel(w_t: jnp.ndarray) -> jnp.ndarray:
    """Map a flax ConvTranspose kernel (4, 4, 4, C_in, C_out), stride 2,
    SAME, to the equivalent subpixel kernel (2, 2, 2, C_in, 8*C_out).

    Per axis: parity p uses W[p] on the earlier tap and W[p+2] on the later
    tap (sub-kernel tap index t picks W[p + 2t])."""
    k = 4
    assert w_t.shape[:3] == (k, k, k), w_t.shape
    c_in, c_out = w_t.shape[3], w_t.shape[4]
    out = jnp.zeros((2, 2, 2, c_in, 8 * c_out), w_t.dtype)
    for pd in range(2):
        for ph in range(2):
            for pw in range(2):
                parity = (pd * 4 + ph * 2 + pw) * c_out
                for td in range(2):
                    for th in range(2):
                        for tw in range(2):
                            out = out.at[td, th, tw, :, parity : parity + c_out].set(
                                w_t[pd + 2 * td, ph + 2 * th, pw + 2 * tw]
                            )
    return out


class SubpixelDeconv3D(nn.Module):
    """Drop-in replacement for nn.ConvTranspose(k=4, s=2, SAME, no bias).

    Parameter count and function class are identical to the transposed conv
    (the map between parameterizations is a permutation); initialization
    matches flax's default fan-in scaling computed on the transposed-conv
    shape so training dynamics are comparable.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        # fan-in matches the 4³ transposed conv (64·c_in), not the 2³ conv
        init = nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal",
                                                in_axis=(0, 1, 2, 3))
        w = self.param("kernel", init, (2, 2, 2, c_in, 8 * self.features), jnp.float32)
        return subpixel_deconv3d(x.astype(self.dtype), w.astype(self.dtype))
