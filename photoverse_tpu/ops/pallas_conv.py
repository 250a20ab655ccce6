"""3x3 SAME convolution as a Pallas implicit-GEMM kernel.

XLA's conv on this chip peaks at ~27 TFLOPs for the SD UNet's hot shapes at
small batch while plain matmuls reach ~153 TFLOPs (PERFORMANCE.md). This
kernel recasts the 3x3 conv as 9 accumulated MXU matmuls over a spatially
tiled input slab held in VMEM:

  out[b, th:th+TH, :, o] = sum_{dy,dx} x_pad[b, th+dy : th+dy+TH, dx : dx+W, :]
                           . w[dy, dx, :, o]

Grid: (B, H/TH, O/TO). The input arrives pre-padded (H+2, W+2) so the
kernel has no edge cases; each program reads a (TH+2, W+2, C) halo slab
(expressed as overlapping row-blocks via an element-offset index map) and
writes a (TH, W, TO) output tile, accumulating in f32.

Scope: stride 1, 3x3, SAME, NHWC — the shape of every resnet conv in the
SD-1.5 UNet/VAE. Other convs (1x1 projections, stride-2 downsamples) are
matmuls / cheap already and stay on XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_same", "conv3x3_same_diff"]


def _kernel(x_ref, w_ref, out_ref, acc_ref):
    # x_ref: (1, TH+2, W+2, C) halo slab; w_ref: (3, 3, C, TO)
    # out_ref: (1, TH, W, TO); acc_ref: (TH*W, TO) f32 scratch
    TH = out_ref.shape[1]
    W = out_ref.shape[2]
    C = x_ref.shape[3]
    TO = out_ref.shape[3]

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dy in range(3):
        for dx in range(3):
            # (TH, W, C) shifted window, flattened to (TH*W, C)
            window = x_ref[0, dy : dy + TH, dx : dx + W, :].reshape(TH * W, C)
            acc_ref[:] += jax.lax.dot(
                window.astype(jnp.bfloat16),
                w_ref[dy, dx].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
    out_ref[0] = acc_ref[:].reshape(TH, W, TO).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("row_tile", "out_tile"))
def conv3x3_same(
    x: jnp.ndarray,  # (B, H, W, C)
    w: jnp.ndarray,  # (3, 3, C, O)
    row_tile: int = 16,
    out_tile: int = 256,
) -> jnp.ndarray:
    """3x3 stride-1 SAME conv, NHWC. Returns (B, H, W, O) in x.dtype."""
    B, H, W, C = x.shape
    O = w.shape[-1]
    th = min(row_tile, H)
    while H % th:
        th -= 1
    # Mosaic needs the lane (last) dim of the output block to be a multiple
    # of 128 or the full dimension
    if O <= out_tile or O % 128:
        to = O
    else:
        to = 128
        for cand in range(out_tile - out_tile % 128, 0, -128):
            if O % cand == 0:
                to = cand
                break

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    grid = (B, H // th, O // to)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, O), x.dtype),
        grid=grid,
        in_specs=[
            # overlapping halo slabs: Element-indexed blocks (Mosaic requires
            # all dims to be Element together) — the row start i*th advances
            # by th while the block spans th+2 rows, so programs overlap by 2
            pl.BlockSpec(
                (
                    pl.Element(1),
                    pl.Element(th + 2),
                    pl.Element(W + 2),
                    pl.Element(C),
                ),
                index_map=lambda b, i, j: (b, i * th, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 3, C, to),
                index_map=lambda b, i, j: (0, 0, 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, th, W, to),
            index_map=lambda b, i, j: (b, i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((th * W, to), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * O * 9,
            bytes_accessed=(xp.size + w.size + B * H * W * O) * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(xp, w)
    return out


def _xla_conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.custom_vjp
def conv3x3_same_diff(x, w):
    """conv3x3_same with gradients: Pallas implicit-GEMM forward, XLA conv
    backward (the transpose/filter-grad convs are large-batch shapes XLA
    already handles well; the forward at small batch is where XLA leaves
    >2x on the table, PERFORMANCE.md)."""
    return conv3x3_same(x, w)


def _c33_fwd(x, w):
    return conv3x3_same(x, w), (x, w)


def _c33_bwd(res, g):
    x, w = res
    _, vjp = jax.vjp(_xla_conv3x3, x, w)
    return vjp(g)


conv3x3_same_diff.defvjp(_c33_fwd, _c33_bwd)
