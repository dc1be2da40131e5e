"""Pallas TPU kernel: fused 2x2x2 stride-1 3D convolution.

The blocked encoder/decoder layouts (nn/autoencoder3d.py) turn every
stride-2 stage of the reference's 64^3 stacks (src/net_core/autoencoder3D.py:
72-139) into k=2 s=1 SAME convs over a 16^3 grid with wide channels — the
four heaviest matmuls of the flagship step. XLA's generic conv lowering runs
them at 40-60%% of the MXU roofline (measured on v5e, B=32 bf16); this kernel
recovers the gap by keeping the whole per-sample activation resident in VMEM
and expressing the 8 kernel taps as shifted row-range matmuls:

    flatten x[b] to rows m = (d*H + h)*W + w  ->  X: [S, C], S = D*H*W
    tap (dz,dy,dx), flat offset f = dz*H*W + dy*W + dx:
        y[m] += mask(m) * X[m + f] @ W[dz,dy,dx]      for m in [0, S - f)

SAME padding for an even kernel pads (lo=0, hi=1) per axis, so every tap is a
*forward* shift: the d-boundary is exactly the row range [0, S-f) and the
h/w boundaries are a per-output-row mask computed from iota — no padded
scatter, no interleaved relayout, no zero-stuffing. Two strategies:

- ``im2col`` (8C <= 1024): build G = [S, 8C] in VMEM scratch, one matmul.
- ``matmul8`` (wide C): 8 shifted [S-f, C] @ [C, Nt] matmuls into an f32
  VMEM accumulator.

Backward stays on XLA (measured at roofline already): dx is the mirrored
k=2 conv with padding (1,0); dw is 8 shifted contractions.

Off-TPU the kernel runs in interpreter mode (tests) — call sites gate on
platform and fall back to ``conv_k2_xla``.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TAPS = [(dz, dy, dx) for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]

_DIMNUMS = ("NDHWC", "DHWIO", "NDHWC")


def conv_k2_xla(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Reference path: plain XLA k=2 s=1 SAME conv (no bias)."""
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), "SAME", dimension_numbers=_DIMNUMS
    )


def _tap_mask(M: int, W: int, H: int, dy: int, dx: int, dtype) -> jnp.ndarray:
    """[M, 1] mask over output rows: zero where the (dy, dx) tap would read
    across the h/w boundary (the d boundary is the row range itself)."""
    m = lax.broadcasted_iota(jnp.int32, (M, 1), 0)
    ok = ((m % W) + dx < W) & (((m // W) % H) + dy < H)
    return ok.astype(dtype)


def _kernel_matmul8(x_ref, w_ref, out_ref, acc_ref, *, S, H, W, out_dtype):
    """x_ref [1,S,C]; w_ref [8,C,Nt]; out_ref [1,S,Nt]; acc f32 [S,Nt]."""
    HW = H * W
    for o, (dz, dy, dx) in enumerate(TAPS):
        f = dz * HW + dy * W + dx
        M = S - f
        op = x_ref[0, f:S, :]
        if dy or dx:
            op = op * _tap_mask(M, W, H, dy, dx, op.dtype)
        part = jnp.dot(op, w_ref[o], preferred_element_type=jnp.float32)
        if o == 0:  # tap (0,0,0): f == 0, initializes every row
            acc_ref[:, :] = part
        else:
            acc_ref[0:M, :] = acc_ref[0:M, :] + part
    out_ref[0, :, :] = acc_ref[:, :].astype(out_dtype)


def _kernel_im2col(x_ref, w_ref, out_ref, g_ref, *, S, H, W, out_dtype):
    """x_ref [1,S,C]; w_ref [8C,Nt]; out_ref [1,S,Nt]; g scratch [S,8C]."""
    HW = H * W
    C = x_ref.shape[-1]
    for o, (dz, dy, dx) in enumerate(TAPS):
        f = dz * HW + dy * W + dx
        M = S - f
        op = x_ref[0, f:S, :]
        if dy or dx:
            op = op * _tap_mask(M, W, H, dy, dx, op.dtype)
        g_ref[0:M, o * C : (o + 1) * C] = op
        if f:
            g_ref[M:S, o * C : (o + 1) * C] = jnp.zeros((f, C), op.dtype)
    out_ref[0, :, :] = jnp.dot(
        g_ref[:, :], w_ref[:, :], preferred_element_type=jnp.float32
    ).astype(out_dtype)


def _pick_n_tile(S: int, C: int, N: int, itemsize: int, im2col: bool) -> int:
    """Largest divisor tile of N keeping the VMEM working set under ~12 MB."""
    budget = 12 * 1024 * 1024
    fixed = S * C * itemsize + (S * 8 * C * itemsize if im2col else 0)
    nt = N
    while nt > 8:
        per_tile = S * nt * (4 + itemsize) + 8 * C * nt * itemsize
        if fixed + per_tile <= budget or nt <= 8:
            break
        nt //= 2
    while N % nt:
        nt //= 2
    return max(nt, 1)


def _conv_k2_pallas(x: jnp.ndarray, w: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    B, D, H, W, C = x.shape
    N = w.shape[-1]
    S = D * H * W
    im2col = 8 * C <= 1024
    nt = _pick_n_tile(S, C, N, x.dtype.itemsize, im2col)
    xf = x.reshape(B, S, C)
    flops = 2 * B * S * 8 * C * N
    cost = pl.CostEstimate(
        flops=flops,
        bytes_accessed=(B * S * (C + N) + 8 * C * N) * x.dtype.itemsize,
        transcendentals=0,
    )
    if im2col:
        wf = w.astype(x.dtype).reshape(8 * C, N)
        kern = functools.partial(
            _kernel_im2col, S=S, H=H, W=W, out_dtype=x.dtype
        )
        w_spec = pl.BlockSpec((8 * C, nt), lambda b, n: (0, n))
        scratch = [pltpu.VMEM((S, 8 * C), x.dtype)]
    else:
        wf = w.astype(x.dtype).reshape(8, C, N)
        kern = functools.partial(
            _kernel_matmul8, S=S, H=H, W=W, out_dtype=x.dtype
        )
        w_spec = pl.BlockSpec((8, C, nt), lambda b, n: (0, 0, n))
        scratch = [pltpu.VMEM((S, nt), jnp.float32)]
    yf = pl.pallas_call(
        kern,
        grid=(B, N // nt),
        in_specs=[
            pl.BlockSpec((1, S, C), lambda b, n: (b, 0, 0)),
            w_spec,
        ],
        out_specs=pl.BlockSpec((1, S, nt), lambda b, n: (b, 0, n)),
        out_shape=jax.ShapeDtypeStruct((B, S, N), x.dtype),
        scratch_shapes=scratch,
        cost_estimate=cost,
        interpret=interpret,
    )(xf, wf)
    return yf.reshape(B, D, H, W, N)


def _conv_k2_bwd_impl(x, w, g):
    """Explicit XLA backward: dx via the mirrored conv, dw via 8 shifted
    contractions (padding lo=0 hi=1 makes every tap a forward shift)."""
    w = w.astype(x.dtype)
    # dx[q] = sum_tap g[q - tap] @ w[tap]^T  == conv(g, reverse(w)^T, pad (1,0))
    w_rev_t = w[::-1, ::-1, ::-1].transpose(0, 1, 2, 4, 3)
    dx = lax.conv_general_dilated(
        g, w_rev_t, (1, 1, 1), [(1, 0)] * 3, dimension_numbers=_DIMNUMS
    )
    # dw[tap][c, n] = sum_{b, m} x[b, m + tap, c] * g[b, m, n]
    xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 1), (0, 0)))
    _, D, H, W, _ = x.shape
    dw = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.stack(
                        [
                            jnp.einsum(
                                "bdhwc,bdhwn->cn",
                                xp[:, dz : dz + D, dy : dy + H, dx : dx + W, :],
                                g,
                                preferred_element_type=jnp.float32,
                            )
                            for dx in (0, 1)
                        ]
                    )
                    for dy in (0, 1)
                ]
            )
            for dz in (0, 1)
        ]
    )
    return dx, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _conv_k2_pallas_vjp(x, w, interpret):
    return _conv_k2_pallas(x, w, interpret)


def _vjp_fwd(x, w, interpret):
    return _conv_k2_pallas(x, w, interpret), (x, w)


def _vjp_bwd(interpret, res, g):
    x, w = res
    dx, dw = _conv_k2_bwd_impl(x, w, g)
    return dx, dw.astype(w.dtype)


_conv_k2_pallas_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def conv_k2(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """2x2x2 stride-1 SAME 3D conv, Pallas-fused on TPU.

    ``x``: [B, D, H, W, C]; ``w``: [2, 2, 2, C, N]. Interpreter mode off-TPU
    keeps tests CPU-runnable; shapes the kernel cannot tile cleanly fall back
    to XLA.
    """
    B, D, H, W, C = x.shape
    N = w.shape[-1]
    if w.shape[:3] != (2, 2, 2) or D * H * W < 8 or min(C, N) < 8:
        return conv_k2_xla(x, w)
    interpret = jax.default_backend() != "tpu"
    return _conv_k2_pallas_vjp(x, w.astype(x.dtype), interpret)
