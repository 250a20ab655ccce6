"""Flash self-attention for small head dims — Pallas TPU kernel.

The SD-1.5 UNet's self-attention at the 64x64 level is S=4096, d=40: the
jnp path materializes (B, H, S, S) scores in HBM (~8.6 GB per layer at
batch 16) and jax's stock flash kernel pads d 40->128 and loses. This
kernel keeps the full K/V resident in VMEM (S*d is tiny for these shapes),
tiles queries, and runs the classic online-softmax accumulation so no
(S, S) tensor ever exists:

  for each q tile:  for each k chunk:  s = q k^T * scale   (TQ, TK) f32
      m' = max(m, rowmax(s)); p = exp(s - m')
      acc = acc * exp(m - m') + p v;  l = l * exp(m - m') + rowsum(p)
  out = acc / l

Used by models.unet.SelfAttention via UNetConfig.use_flash_attention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_sdpa"]


def _kernel_lse(q_ref, k_ref, v_ref, out_ref, lse_ref, *, tk: int):
    # like _kernel but also emits log-sum-exp per query row (for backward)
    TQ, d = q_ref.shape[1], q_ref.shape[2]
    S = k_ref.shape[1]
    scale = d**-0.5
    q = q_ref[0].astype(jnp.float32) * scale

    nk = S // tk

    def body(j, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(j * tk, tk), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * tk, tk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        return acc, m_new, l

    acc0 = jnp.zeros((TQ, d), jnp.float32)
    m0 = jnp.full((TQ, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((TQ, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, nk, body, (acc0, m0, l0))
    out_ref[0] = (acc / l).astype(out_ref.dtype)
    # lse broadcast into 8 lanes: Mosaic requires the trailing block dims to
    # be (8-, 128-)aligned or full, which a (1, tq) block is not
    lse_ref[0] = jnp.broadcast_to(m + jnp.log(l), (m.shape[0], 8))


def _kernel(q_ref, k_ref, v_ref, out_ref, *, tk: int):
    # q_ref: (1, TQ, d); k_ref/v_ref: (1, S, d); out_ref: (1, TQ, d)
    TQ, d = q_ref.shape[1], q_ref.shape[2]
    S = k_ref.shape[1]
    scale = d**-0.5
    q = q_ref[0].astype(jnp.float32) * scale  # (TQ, d)

    nk = S // tk

    def body(j, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(j * tk, tk), :].astype(jnp.float32)  # (TK, d)
        v = v_ref[0, pl.ds(j * tk, tk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (TQ, TK)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        return acc, m_new, l

    acc0 = jnp.zeros((TQ, d), jnp.float32)
    m0 = jnp.full((TQ, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((TQ, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, nk, body, (acc0, m0, l0))
    out_ref[0] = (acc / l).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_tile", "k_tile"))
def flash_sdpa(
    q: jnp.ndarray,  # (B, S, H, d)
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_tile: int = 512,
    k_tile: int = 4096,
) -> jnp.ndarray:
    """Self-attention without score materialization; returns (B, S, H, d).

    Defaults measured on v5e at the SD 64x64 level (S=4096): the largest
    k chunk that keeps the (q_tile, k_tile) f32 score tile within VMEM is
    ~14% faster than small chunks (fewer online-softmax rescales).
    """
    B, S, H, d = q.shape
    BH = B * H
    tq = min(q_tile, S)
    while S % tq:
        tq -= 1
    tk = min(k_tile, S)
    # keep the f32 score tile + exp temporaries comfortably inside VMEM
    while tq * tk * 4 > 8 * 1024 * 1024:
        tk //= 2
    while S % tk:
        tk -= 1

    def fold(x):
        return x.transpose(0, 2, 1, 3).reshape(BH, S, d)

    qf, kf, vf = fold(q), fold(k), fold(v)
    out = pl.pallas_call(
        functools.partial(_kernel, tk=tk),
        out_shape=jax.ShapeDtypeStruct((BH, S, d), q.dtype),
        grid=(BH, S // tq),
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * S * S * d,
            bytes_accessed=4 * BH * S * d * q.dtype.itemsize,
            transcendentals=BH * S * S,
        ),
    )(qf, kf, vf)
    return out.reshape(B, H, S, d).transpose(0, 2, 1, 3)


def _fold(x):
    B, S, H, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B * H, S, d)


def _unfold(x, B, H):
    BH, S, d = x.shape
    return x.reshape(B, H, S, d).transpose(0, 2, 1, 3)


@functools.partial(jax.jit, static_argnames=("q_tile", "k_tile"))
def _flash_fwd_lse(q, k, v, q_tile: int = 512, k_tile: int = 4096):
    """Forward returning (out, lse); layouts as flash_sdpa."""
    B, S, H, d = q.shape
    BH = B * H
    tq = min(q_tile, S)
    while S % tq:
        tq -= 1
    tk = min(k_tile, S)
    while tq * tk * 4 > 8 * 1024 * 1024:
        tk //= 2
    while S % tk:
        tk -= 1
    qf, kf, vf = _fold(q), _fold(k), _fold(v)
    out, lse = pl.pallas_call(
        functools.partial(_kernel_lse, tk=tk),
        out_shape=(
            jax.ShapeDtypeStruct((BH, S, d), q.dtype),
            jax.ShapeDtypeStruct((BH, S, 8), jnp.float32),
        ),
        grid=(BH, S // tq),
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 8), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ),
    )(qf, kf, vf)
    return _unfold(out, B, H), lse[:, :, 0].reshape(B, H, S)


def _bwd_dq_kernel(q_ref, g_ref, lse_ref, delta_ref, k_ref, v_ref, dq_ref, *, tk: int):
    # per (bh, q-tile): dq = scale * sum_k ds @ k,  ds = p * (dp - delta)
    TQ, d = q_ref.shape[1], q_ref.shape[2]
    S = k_ref.shape[1]
    scale = d**-0.5
    q = q_ref[0].astype(jnp.float32) * scale
    g = g_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]
    nk = S // tk

    def body(j, acc):
        k = k_ref[0, pl.ds(j * tk, tk), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * tk, tk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        return acc + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, nk, body, jnp.zeros((TQ, d), jnp.float32))
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, g_ref, lse_ref, delta_ref, k_ref, v_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *, tk: int):
    # grid walks q-tiles; dk/dv accumulate in f32 scratch that persists
    # across the q dimension (outputs flushed on the last q-tile).
    TQ, d = q_ref.shape[1], q_ref.shape[2]
    S = k_ref.shape[1]
    scale = d**-0.5
    i = pl.program_id(1)
    nq = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0].astype(jnp.float32) * scale
    g = g_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, :1]
    delta = delta_ref[0][:, :1]
    nk = S // tk

    def body(j, _):
        k = k_ref[0, pl.ds(j * tk, tk), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * tk, tk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (TQ, tk)
        p = jnp.exp(s - lse)
        dv_chunk = jax.lax.dot_general(
            p, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dk_chunk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk_acc[pl.ds(j * tk, tk), :] += dk_chunk
        dv_acc[pl.ds(j * tk, tk), :] += dv_chunk
        return 0

    jax.lax.fori_loop(0, nk, body, 0)

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_tile", "k_tile"))
def _flash_bwd(q, k, v, out, lse, g, q_tile: int = 512, k_tile: int = 1024):
    B, S, H, d = q.shape
    BH = B * H
    tq = min(q_tile, S)
    while S % tq:
        tq -= 1
    tk = min(k_tile, S)
    # the kernels hold three (tq, tk) f32 temporaries (p, dp, ds) on the
    # VMEM stack next to full K/V blocks and f32 accumulators — keep the
    # temporaries small (the rest of the budget is block buffers)
    while tq * tk * 4 * 3 > 3 * 1024 * 1024:
        tk //= 2
    while S % tk:
        tk -= 1
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    ).transpose(0, 2, 1).reshape(BH, S)
    # lse/delta travel as (BH, S, 8) lane-broadcast vectors (tiling rules)
    delta8 = jnp.broadcast_to(delta[:, :, None], (BH, S, 8))
    lse8 = jnp.broadcast_to(lse.reshape(BH, S)[:, :, None], (BH, S, 8))
    qf, kf, vf, gf = _fold(q), _fold(k), _fold(v), _fold(g)

    full = lambda: pl.BlockSpec((1, S, d), lambda b, i: (b, 0, 0),
                                memory_space=pltpu.VMEM)
    row = lambda t: pl.BlockSpec((1, t, d), lambda b, i: (b, i, 0),
                                 memory_space=pltpu.VMEM)
    vec_row = lambda t: pl.BlockSpec((1, t, 8), lambda b, i: (b, i, 0),
                                     memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, tk=tk),
        out_shape=jax.ShapeDtypeStruct((BH, S, d), q.dtype),
        grid=(BH, S // tq),
        in_specs=[row(tq), row(tq), vec_row(tq), vec_row(tq), full(), full()],
        out_specs=row(tq),
    )(qf, gf, lse8, delta8, kf, vf)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, tk=tk),
        out_shape=(
            jax.ShapeDtypeStruct((BH, S, d), k.dtype),
            jax.ShapeDtypeStruct((BH, S, d), v.dtype),
        ),
        grid=(BH, S // tq),
        in_specs=[row(tq), row(tq), vec_row(tq), vec_row(tq), full(), full()],
        out_specs=(
            pl.BlockSpec((1, S, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((S, d), jnp.float32),
            pltpu.VMEM((S, d), jnp.float32),
        ],
    )(qf, gf, lse8, delta8, kf, vf)
    return _unfold(dq, B, H), _unfold(dk, B, H), _unfold(dv, B, H)


# differentiable wrapper: Pallas forward AND backward
@jax.custom_vjp
def flash_sdpa_diff(q, k, v):
    return flash_sdpa(q, k, v)


def _fwd(q, k, v):
    out, lse = _flash_fwd_lse(q, k, v)
    return out, (q, k, v, out, lse)


def _bwd(res, g):
    q, k, v, out, lse = res
    return _flash_bwd(q, k, v, out, lse, g)


flash_sdpa_diff.defvjp(_fwd, _bwd)
