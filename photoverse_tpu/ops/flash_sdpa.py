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

__all__ = [
    "flash_sdpa",
    "flash_sdpa_diff",
    "flash_sdpa_stream",
    "flash_sdpa_stream_diff",
]


def _pick_k_tile(k_tile: int, Skv: int, tq: int, fast_scores: bool) -> int:
    """Largest k chunk whose kernel-stack score temporaries fit VMEM.

    The resident-K/V kernels hold BOTH the f32 score tile s AND
    p = exp(s - m) simultaneously (p is bf16 under fast_scores, f32
    otherwise); Mosaic's scoped-VMEM limit is 16 MB. Budget 12 MiB for
    the pair: fast keeps the measured (512, 4096) config (12.0 MiB,
    fits at 12.32 MB total), the f32 path halves to (512, 2048) — at
    (512, 4096) f32 the stack needs 16.32 MB and the compiler rejects
    it (hit by the r04 train soak, which differentiates the f32 primal).
    """
    tk = min(k_tile, Skv)
    score_bytes = 4 + (2 if fast_scores else 4)
    while tq * tk * score_bytes > 12 * 1024 * 1024:
        tk //= 2
    while Skv % tk:
        tk -= 1
    return tk


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


def _kernel(q_ref, k_ref, v_ref, out_ref, *, tk: int, fast: bool):
    # q_ref: (1, TQ, d); k_ref/v_ref: (1, S, d); out_ref: (1, TQ, d)
    # fast=True keeps the MXU operands in bf16 (f32 accumulation): the QK^T
    # and PV matmuls run at the bf16 systolic rate instead of f32 — the
    # softmax statistics stay f32, deviation ~1e-3 on unit-scale inputs.
    TQ, d = q_ref.shape[1], q_ref.shape[2]
    S = k_ref.shape[1]
    scale = d**-0.5
    cdt = jnp.bfloat16 if fast else jnp.float32
    q = q_ref[0].astype(cdt)  # (TQ, d)

    nk = S // tk

    def body(j, carry):
        acc, m, l = carry
        k = k_ref[0, pl.ds(j * tk, tk), :].astype(cdt)  # (TK, d)
        v = v_ref[0, pl.ds(j * tk, tk), :].astype(cdt)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (TQ, TK) f32
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(cdt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        return acc, m_new, l

    acc0 = jnp.zeros((TQ, d), jnp.float32)
    m0 = jnp.full((TQ, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((TQ, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, nk, body, (acc0, m0, l0))
    out_ref[0] = (acc / l).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_tile", "k_tile", "fast_scores"))
def flash_sdpa(
    q: jnp.ndarray,  # (B, S, H, d)
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_tile: int = 512,
    k_tile: int = 4096,
    fast_scores: bool = False,
) -> jnp.ndarray:
    """Self-attention without score materialization; returns (B, S, H, d).

    Defaults measured on v5e at the SD 64x64 level (S=4096): the largest
    k chunk that keeps the (q_tile, k_tile) f32 score tile within VMEM is
    ~14% faster than small chunks (fewer online-softmax rescales).
    fast_scores runs the MXU matmuls in bf16 (f32 accumulation).

    K/V may carry a different (longer) sequence than Q — the
    sequence-parallel wrapper (parallel/flash.py) feeds local query rows
    against the all-gathered full key set.
    """
    B, S, H, d = q.shape
    Skv = k.shape[1]
    BH = B * H
    tq = min(q_tile, S)
    while S % tq:
        tq -= 1
    tk = _pick_k_tile(k_tile, Skv, tq, fast_scores)

    qf, kf, vf = _fold(q), _fold(k), _fold(v)
    out = pl.pallas_call(
        functools.partial(_kernel, tk=tk, fast=fast_scores),
        out_shape=jax.ShapeDtypeStruct((BH, S, d), q.dtype),
        grid=(BH, S // tq),
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Skv, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Skv, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * S * Skv * d,
            bytes_accessed=2 * BH * (S + Skv) * d * q.dtype.itemsize,
            transcendentals=BH * S * Skv,
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
    if q.shape[1] != k.shape[1]:
        # the K/V BlockSpecs below are sized by q's sequence length; with
        # Skv > Sq (e.g. differentiating the SP all-gathered decomposition)
        # they would silently attend only the first Sq keys
        raise ValueError(
            "flash_sdpa_diff requires equal q/k sequence lengths "
            f"(got Sq={q.shape[1]}, Skv={k.shape[1]}); the unequal-length "
            "forward (flash_sdpa) is inference-only"
        )
    B, S, H, d = q.shape
    BH = B * H
    tq = min(q_tile, S)
    while S % tq:
        tq -= 1
    # all-f32 kernel: s + p coexist at 8 bytes per score element —
    # (512, 2048) for the SD 64x64 level
    tk = _pick_k_tile(k_tile, S, tq, fast_scores=False)
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
    if q.shape[1] != k.shape[1]:
        raise ValueError(
            "flash backward requires equal q/k sequence lengths "
            f"(got Sq={q.shape[1]}, Skv={k.shape[1]})"
        )
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

    # The bwd kernels keep full-S K/V blocks, the dk/dv out blocks, AND the
    # f32 scratch accumulators resident at once; with d=40 lane-padded to
    # 128 that is ~21.5 MB at the SD 64x64 level (S=4096) — over Mosaic's
    # default 16 MB scoped-VMEM cap (hit by the r04 train soak). Raise the
    # cap like ops/fused_block.py does; v5e has 128 MB VMEM per core.
    bwd_params = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, tk=tk),
        out_shape=jax.ShapeDtypeStruct((BH, S, d), q.dtype),
        grid=(BH, S // tq),
        in_specs=[row(tq), row(tq), vec_row(tq), vec_row(tq), full(), full()],
        out_specs=row(tq),
        compiler_params=bwd_params,
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
        compiler_params=bwd_params,
    )(qf, gf, lse8, delta8, kf, vf)
    return _unfold(dq, B, H), _unfold(dk, B, H), _unfold(dv, B, H)


# ---------------------------------------------------------------------------
# streaming variant: K/V chunks arrive as GRID blocks (not VMEM-resident) —
# for large head dims where S*d no longer fits in VMEM (the SD VAE decoder's
# 4096-token, d=512 single-head attention, models/vae.py AttnBlock; the
# reference materializes (B, 4096, 4096) scores through diffusers here).
# ---------------------------------------------------------------------------


def _kernel_stream_lse(
    q_ref, k_ref, v_ref, out_ref, lse_ref, acc_ref, m_ref, l_ref, *, fast: bool
):
    # _kernel_stream plus a log-sum-exp output per query row (for the
    # chunked backward); lse travels lane-broadcast in 128 columns
    _kernel_stream(
        q_ref, k_ref, v_ref, out_ref, acc_ref, m_ref, l_ref, fast=fast
    )
    j = pl.program_id(2)

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        lse_ref[0] = m_ref[:, :1] + jnp.log(l_ref[:, :1]) + jnp.zeros_like(lse_ref[0])


def _kernel_stream(q_ref, k_ref, v_ref, out_ref, acc_ref, m_ref, l_ref, *, fast: bool):
    # grid (BH, nq, nk) with k innermost; acc/m/l persist in VMEM scratch
    # across the k dimension and flush to out on the last k block.
    j = pl.program_id(2)
    d = q_ref.shape[2]
    scale = d**-0.5
    cdt = jnp.bfloat16 if fast else jnp.float32

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0].astype(cdt)
    k = k_ref[0].astype(cdt)
    v = v_ref[0].astype(cdt)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (TQ, TK) f32
    m_prev = m_ref[:, :1]
    l_prev = l_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(cdt), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        out_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("q_tile", "k_tile", "fast_scores")
)
def flash_sdpa_stream(
    q: jnp.ndarray,  # (B, S, H, d)
    k: jnp.ndarray,
    v: jnp.ndarray,
    q_tile: int = 256,
    k_tile: int = 1024,
    fast_scores: bool = False,
) -> jnp.ndarray:
    """Flash attention with K/V streamed from HBM block-by-block.

    VMEM per step: one (tq, d) q block, two (tk, d) K/V blocks (double-
    buffered by Pallas), the (tq, tk) f32 score tile, and (tq, d) f32
    accumulator scratch — independent of S*d, so d=512 at S=4096 fits."""
    B, S, H, d = q.shape
    BH = B * H
    tq = min(q_tile, S)
    while S % tq:
        tq -= 1
    tk = min(k_tile, S)
    while S % tk:
        tk -= 1

    qf, kf, vf = _fold(q), _fold(k), _fold(v)
    out = pl.pallas_call(
        functools.partial(_kernel_stream, fast=fast_scores),
        out_shape=jax.ShapeDtypeStruct((BH, S, d), q.dtype),
        grid=(BH, S // tq, S // tk),
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tq, d), jnp.float32),
            pltpu.VMEM((tq, 128), jnp.float32),
            pltpu.VMEM((tq, 128), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * S * S * d,
            bytes_accessed=(BH * S * d * (2 * S // tq + 2)) * q.dtype.itemsize,
            transcendentals=BH * S * S,
        ),
    )(qf, kf, vf)
    return out.reshape(B, H, S, d).transpose(0, 2, 1, 3)


@functools.partial(jax.jit, static_argnames=("q_tile", "k_tile"))
def _flash_stream_fwd_lse(q, k, v, q_tile: int = 256, k_tile: int = 1024):
    """Streaming forward returning (out, lse (B, H, S)) for the backward."""
    B, S, H, d = q.shape
    BH = B * H
    tq = min(q_tile, S)
    while S % tq:
        tq -= 1
    tk = min(k_tile, S)
    while S % tk:
        tk -= 1
    qf, kf, vf = _fold(q), _fold(k), _fold(v)
    out, lse = pl.pallas_call(
        functools.partial(_kernel_stream_lse, fast=False),
        out_shape=(
            jax.ShapeDtypeStruct((BH, S, d), q.dtype),
            jax.ShapeDtypeStruct((BH, S, 128), jnp.float32),
        ),
        grid=(BH, S // tq, S // tk),
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 128), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tq, d), jnp.float32),
            pltpu.VMEM((tq, 128), jnp.float32),
            pltpu.VMEM((tq, 128), jnp.float32),
        ],
    )(qf, kf, vf)
    return _unfold(out, B, H), lse[:, :, 0].reshape(B, H, S)


def _stream_bwd_chunked(q, k, v, out, lse, g, chunk: int = 512):
    """Exact flash backward with K/V chunking in plain XLA: per-chunk
    probabilities are recomputed from (q, lse), so peak memory is
    O(B*H*S*chunk) — never the full (S, S) score tensor. (jax.vjp of the
    online-softmax forward would stack per-step probability residuals,
    which IS a full (S, S) tensor; this avoids that.)"""
    B, S, H, d = q.shape
    while S % chunk:
        chunk -= 1
    scale = d**-0.5
    qt = q.transpose(0, 2, 1, 3).astype(jnp.float32)  # (B, H, S, d)
    kt = k.transpose(0, 2, 1, 3).astype(jnp.float32)
    vt = v.transpose(0, 2, 1, 3).astype(jnp.float32)
    gt = g.transpose(0, 2, 1, 3).astype(jnp.float32)
    ot = out.transpose(0, 2, 1, 3).astype(jnp.float32)
    delta = jnp.sum(gt * ot, axis=-1, keepdims=True)  # (B, H, S, 1)
    lse_b = lse[..., None]  # (B, H, S, 1)
    n = S // chunk
    kc = kt.reshape(B, H, n, chunk, d).transpose(2, 0, 1, 3, 4)
    vc = vt.reshape(B, H, n, chunk, d).transpose(2, 0, 1, 3, 4)

    def body(dq, x):
        kj, vj = x
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qt, kj, preferred_element_type=jnp.float32
        ) * scale
        p = jnp.exp(s - lse_b)  # (B, H, S, chunk)
        dv_j = jnp.einsum("bhqk,bhqd->bhkd", p, gt)
        dp = jnp.einsum("bhqd,bhkd->bhqk", gt, vj)
        ds = p * (dp - delta) * scale
        dq = dq + jnp.einsum("bhqk,bhkd->bhqd", ds, kj)
        dk_j = jnp.einsum("bhqk,bhqd->bhkd", ds, qt)
        return dq, (dk_j, dv_j)

    dq0 = jnp.zeros_like(qt)
    dq, (dkc, dvc) = jax.lax.scan(body, dq0, (kc, vc))
    dk = dkc.transpose(1, 2, 0, 3, 4).reshape(B, H, S, d)
    dv = dvc.transpose(1, 2, 0, 3, 4).reshape(B, H, S, d)
    back = lambda x: x.transpose(0, 2, 1, 3)
    return (
        back(dq).astype(q.dtype),
        back(dk).astype(k.dtype),
        back(dv).astype(v.dtype),
    )


def _chunked_sdpa_ref(q, k, v, chunk: int = 512):
    """Differentiable XLA reference with bounded memory: scan over K chunks
    with online softmax (used by tests as the semantic reference for the
    streaming kernel)."""
    B, S, H, d = q.shape
    while S % chunk:
        chunk -= 1
    scale = d**-0.5
    qt = q.transpose(0, 2, 1, 3).astype(jnp.float32) * scale  # (B, H, S, d)
    kt = k.transpose(0, 2, 1, 3).astype(jnp.float32)
    vt = v.transpose(0, 2, 1, 3).astype(jnp.float32)
    n = S // chunk
    kc = kt.reshape(B, H, n, chunk, d).transpose(2, 0, 1, 3, 4)
    vc = vt.reshape(B, H, n, chunk, d).transpose(2, 0, 1, 3, 4)

    def body(carry, x):
        acc, m, l = carry
        kj, vj = x
        s = jnp.einsum("bhqd,bhkd->bhqk", qt, kj, preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        acc = acc * alpha + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vj, preferred_element_type=jnp.float32
        )
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        return (acc, m_new, l), None

    acc0 = jnp.zeros((B, H, S, d), jnp.float32)
    m0 = jnp.full((B, H, S, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, H, S, 1), jnp.float32)
    (acc, _, l), _ = jax.lax.scan(body, (acc0, m0, l0), (kc, vc))
    return (acc / l).transpose(0, 2, 1, 3).astype(q.dtype)


@jax.custom_vjp
def flash_sdpa_stream_diff(q, k, v):
    """flash_sdpa_stream forward; chunked-recompute backward with bounded
    memory — per-chunk probabilities are rebuilt from the saved lse, never a
    full (S, S) tensor (the VAE decode carries gradients in the face-loss
    inner generation)."""
    return flash_sdpa_stream(q, k, v)


def _stream_fwd(q, k, v):
    out, lse = _flash_stream_fwd_lse(q, k, v)
    return out, (q, k, v, out, lse)


def _stream_bwd(res, g):
    q, k, v, out, lse = res
    return _stream_bwd_chunked(q, k, v, out, lse, g)


flash_sdpa_stream_diff.defvjp(_stream_fwd, _stream_bwd)


# differentiable wrapper: Pallas forward AND backward. fast_scores only
# affects the no-grad primal (inference fast path); under differentiation
# the f32 lse forward + Pallas backward run regardless, keeping training
# gradients exact.
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_sdpa_diff(q, k, v, fast_scores=False):
    return flash_sdpa(q, k, v, fast_scores=fast_scores)


def _fwd(q, k, v, fast_scores):
    out, lse = _flash_fwd_lse(q, k, v)
    return out, (q, k, v, out, lse)


def _bwd(fast_scores, res, g):
    q, k, v, out, lse = res
    return _flash_bwd(q, k, v, out, lse, g)


flash_sdpa_diff.defvjp(_fwd, _bwd)
