"""Pallas reference kernel (DECIDED: XLA conv is production — docs/KERNELS.md):
fused 2x2x2 s=1 3D conv.

The roofline analysis in docs/KERNELS.md closes SURVEY §7.3: the XLA conv
lowering runs the flagship k=2 stages at ~96 TF/s in-graph and every
alternative formulation measured slower; this kernel is retained
interpreter-mode as the documented attempt (oracle-tested), not a pending
experiment.

The blocked encoder/decoder layouts (nn/autoencoder3d.py) turn every
stride-2 stage of the reference's 64^3 stacks (src/net_core/autoencoder3D.py:
72-139) into k=2 s=1 SAME convs over a 16^3 grid with wide channels — the
four heaviest matmuls of the flagship step. This kernel expresses the 8 taps
as shifted full-row matmuls over the flattened per-sample grid:

    flatten x[b] to rows m = (d*H + h)*W + w  ->  X: [S, C], S = D*H*W
    tap (dz,dy,dx), flat offset f = dz*H*W + dy*W + dx:
        y[m] += mask(m) * X[m + f] @ W[dz,dy,dx]

Two strategies: ``im2col`` (8C <= 1024: build G = [S, 8C] in VMEM scratch,
one matmul) and ``matmul8`` (wide C: 8 shifted matmuls into an f32 VMEM
accumulator). Backward stays on XLA: dx is the mirrored k=2 conv with
padding (1,0); dw is 8 shifted contractions.

STATUS (measured v5e, 2026-08-19): the current Mosaic toolchain cannot lower
any formulation of the row shift — odd-size second-to-last-dim slices are
rejected ("divisible by 8 and 128"), ``pltpu.roll`` on the sublane axis
fails (`tpu.dynamic_rotate` dim 0 unsupported for [4096, 512] bf16), and
odd-offset/aligned-size windows into VMEM scratch are rejected too. The
kernel therefore runs only in interpreter mode (tests) or behind
``ANYTIME3D_CONVK2_PALLAS=1``; ``conv_k2`` defaults to the XLA conv.

The XLA default is not a cop-out — measured alternatives all LOSE to the
native conv lowering at the flagship shapes (B=32 bf16, isolated jits):
conv 1.7-2.3 ms/stage (35-68 TF/s) vs XLA-im2col-matmul 2.4-5.7 ms vs
8-shifted-matmuls 3.7-7.2 ms (benchmarks/k2_forms.py). In-graph the same
convs run ~2x faster still (whole encoder fwd = 3.4 ms for ~325 GFLOP,
~96 TF/s): the isolated numbers pay boundary relayouts that XLA elides once
the conv sits between GroupNorm/elementwise producers and consumers.
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


def _tap_operand(x_ref, S, D, H, W, dz, dy, dx):
    """Full-row [S, C] operand for one tap: x shifted forward by the tap's
    flat offset (``pltpu.roll`` — Mosaic rejects odd-size slices, a sublane
    rotate it lowers natively) with boundary rows masked to zero. All three
    boundaries (d via the roll wrap, h/w via phase) live in one iota mask."""
    f = dz * H * W + dy * W + dx
    op = x_ref[0, :, :]
    if f:
        op = pltpu.roll(op, S - f, 0)  # op[m] = x[m + f] for valid rows
    if dz or dy or dx:
        m = lax.broadcasted_iota(jnp.int32, (S, 1), 0)
        ok = ((m % W) + dx < W) & (((m // W) % H) + dy < H) & ((m // (H * W)) + dz < D)
        op = op * ok.astype(op.dtype)
    return op


def _kernel_matmul8(x_ref, w_ref, out_ref, acc_ref, *, S, D, H, W, out_dtype):
    """x_ref [1,S,C]; w_ref [8,C,Nt]; out_ref [1,S,Nt]; acc f32 [S,Nt]."""
    for o, (dz, dy, dx) in enumerate(TAPS):
        op = _tap_operand(x_ref, S, D, H, W, dz, dy, dx)
        part = jnp.dot(op, w_ref[o], preferred_element_type=jnp.float32)
        if o == 0:  # tap (0,0,0) initializes every row
            acc_ref[:, :] = part
        else:
            acc_ref[:, :] = acc_ref[:, :] + part
    out_ref[0, :, :] = acc_ref[:, :].astype(out_dtype)


def _kernel_im2col(x_ref, w_ref, out_ref, g_ref, *, S, D, H, W, out_dtype):
    """x_ref [1,S,C]; w_ref [8C,Nt]; out_ref [1,S,Nt]; g scratch [S,8C]."""
    C = x_ref.shape[-1]
    for o, (dz, dy, dx) in enumerate(TAPS):
        g_ref[:, o * C : (o + 1) * C] = _tap_operand(x_ref, S, D, H, W, dz, dy, dx)
    out_ref[0, :, :] = jnp.dot(
        g_ref[:, :], w_ref[:, :], preferred_element_type=jnp.float32
    ).astype(out_dtype)


def _pick_n_tile(S: int, C: int, N: int, itemsize: int, im2col: bool) -> int:
    """Largest divisor tile of N keeping the scoped-VMEM working set safe.

    Budget model (measured against Mosaic's scoped-vmem accounting on v5e):
    input block is double-buffered, weight and output blocks are
    double-buffered per grid step, and the MXU result materializes in f32
    before the cast — all counted. The hard scoped limit is 16 MB; 8 MB of
    model leaves room for the ~40% overhead Mosaic adds in practice."""
    budget = 8 * 1024 * 1024
    fixed = 2 * S * C * itemsize + (S * 8 * C * itemsize if im2col else 0)
    nt = N
    while nt > 8:
        per_tile = (
            2 * S * nt * itemsize  # output block, double-buffered
            + 2 * 8 * C * nt * itemsize  # weight block, double-buffered
            + S * nt * 4  # f32 matmul result / accumulator
        )
        if fixed + per_tile <= budget:
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
            _kernel_im2col, S=S, D=D, H=H, W=W, out_dtype=x.dtype
        )
        w_spec = pl.BlockSpec((8 * C, nt), lambda b, n: (0, n))
        scratch = [pltpu.VMEM((S, 8 * C), x.dtype)]
    else:
        wf = w.astype(x.dtype).reshape(8, C, N)
        kern = functools.partial(
            _kernel_matmul8, S=S, D=D, H=H, W=W, out_dtype=x.dtype
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
    """2x2x2 stride-1 SAME 3D conv.

    ``x``: [B, D, H, W, C]; ``w``: [2, 2, 2, C, N]. Defaults to the XLA conv
    lowering — the fastest measured formulation on TPU (see module
    docstring). The Pallas path runs in interpreter mode off-TPU (tests) and
    on TPU only behind ``ANYTIME3D_CONVK2_PALLAS=1`` (currently blocked by a
    Mosaic lowering limitation; kept for when the toolchain supports sublane
    shifts).
    """
    import os

    B, D, H, W, C = x.shape
    N = w.shape[-1]
    if w.shape[:3] != (2, 2, 2) or D * H * W < 8 or min(C, N) < 8:
        return conv_k2_xla(x, w)
    interpret = jax.default_backend() != "tpu"
    if not interpret and os.environ.get("ANYTIME3D_CONVK2_PALLAS") != "1":
        return conv_k2_xla(x, w)
    return _conv_k2_pallas_vjp(x, w.astype(x.dtype), interpret)
