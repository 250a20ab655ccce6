"""Fused dual-context attention — Pallas TPU kernel.

One kernel per (batch*head, q-tile) computes BOTH attention passes of the
PhotoVerse cross-attention (text context St=77 tokens, identity context
K=5 tokens) with the query tile loaded from HBM exactly once, and blends
the two outputs with scalar coefficients:

    out = c_text * softmax(q k_t^T / sqrt(d)) v_t
        + c_id   * softmax(q k_i^T / sqrt(d)) v_i

The reference computes these as two sequential SDPA calls inside a torch
processor (/root/reference/models/attention_processor.py:317-319,400-402)
and fuses stochastically (:411-420). Because the stochastic rule always
yields a per-layer *linear* blend — (2,0), (0,2) or (1,1) — the branch is
folded into (c_text, c_id) computed outside the kernel, so train and eval
share one kernel and nothing in the hot path is data-dependent.

Both contexts are tiny, so their K/V stay fully resident in VMEM; the grid
walks q tiles. The score matrices never touch HBM (the jnp fallback
materializes (B, H, Sq, St) probabilities).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dual_context_attention_pallas"]


def _kernel(q_ref, kt_ref, vt_ref, ki_ref, vi_ref, coef_ref, out_ref):
    q = q_ref[0].astype(jnp.float32)  # (TQ, d)
    scale = q.shape[-1] ** -0.5

    def attend(k_ref, v_ref):
        k = k_ref[0].astype(jnp.float32)  # (S, d)
        v = v_ref[0].astype(jnp.float32)  # (S, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (TQ, S)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        return jnp.dot(p, v, preferred_element_type=jnp.float32)

    c_text = coef_ref[0]
    c_id = coef_ref[1]
    out = c_text * attend(kt_ref, vt_ref) + c_id * attend(ki_ref, vi_ref)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_tile",))
def dual_context_attention_pallas(
    q: jnp.ndarray,  # (B, Sq, H, d)
    k_text: jnp.ndarray,  # (B, St, H, d)
    v_text: jnp.ndarray,
    k_id: jnp.ndarray,  # (B, K, H, d)
    v_id: jnp.ndarray,
    coefs: jnp.ndarray,  # (2,) f32: (c_text, c_id)
    q_tile: int = 512,
) -> jnp.ndarray:
    """Returns the fused output (B, Sq, H, d)."""
    B, Sq, H, d = q.shape
    St = k_text.shape[1]
    K = k_id.shape[1]
    BH = B * H

    # (B, S, H, d) -> (B*H, S, d): heads become independent grid rows
    qf = q.transpose(0, 2, 1, 3).reshape(BH, Sq, d)
    ktf = k_text.transpose(0, 2, 1, 3).reshape(BH, St, d)
    vtf = v_text.transpose(0, 2, 1, 3).reshape(BH, St, d)
    kif = k_id.transpose(0, 2, 1, 3).reshape(BH, K, d)
    vif = v_id.transpose(0, 2, 1, 3).reshape(BH, K, d)

    tq = min(q_tile, Sq)
    n_tiles = pl.cdiv(Sq, tq)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((BH, Sq, d), q.dtype),
        grid=(BH, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, St, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, St, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * BH * Sq * (St + K) * d * 2,
            bytes_accessed=(qf.size + ktf.size + vtf.size + kif.size + vif.size)
            * q.dtype.itemsize
            + BH * Sq * d * q.dtype.itemsize,
            transcendentals=BH * Sq * (St + K),
        ),
    )(
        qf,
        ktf,
        vtf,
        kif,
        vif,
        coefs.astype(jnp.float32),
    )
    return out.reshape(B, H, Sq, d).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# differentiable wrapper: Pallas forward, jnp backward (recompute)
# ---------------------------------------------------------------------------


def _jnp_forward(q, kt, vt, ki, vi, coefs):
    from photoverse_tpu.ops.attention import sdpa

    return coefs[0] * sdpa(q, kt, vt) + coefs[1] * sdpa(q, ki, vi)


def _attn_bwd_one(q, k, v, g):
    """Gradients of softmax attention out = P @ v wrt (q, k, v)."""
    d = q.shape[-1]
    scale = d**-0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gf)
    dp = jnp.einsum("bqhd,bkhd->bhqk", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q.astype(jnp.float32)) * scale
    return dq, dk, dv


@jax.custom_vjp
def dual_context_attention_fused(q, k_text, v_text, k_id, v_id, coefs):
    """Differentiable fused dual-context attention (Pallas fwd, jnp bwd)."""
    return dual_context_attention_pallas(q, k_text, v_text, k_id, v_id, coefs)


def _fwd(q, kt, vt, ki, vi, coefs):
    out = dual_context_attention_pallas(q, kt, vt, ki, vi, coefs)
    return out, (q, kt, vt, ki, vi, coefs)


def _bwd(res, g):
    q, kt, vt, ki, vi, coefs = res
    dq_t, dkt, dvt = _attn_bwd_one(q, kt, vt, g)
    dq_i, dki, dvi = _attn_bwd_one(q, ki, vi, g)
    c0 = coefs[0].astype(jnp.float32)
    c1 = coefs[1].astype(jnp.float32)
    dq = (c0 * dq_t + c1 * dq_i).astype(q.dtype)
    return (
        dq,
        (c0 * dkt).astype(kt.dtype),
        (c0 * dvt).astype(vt.dtype),
        (c1 * dki).astype(ki.dtype),
        (c1 * dvi).astype(vi.dtype),
        jnp.zeros_like(coefs),
    )


dual_context_attention_fused.defvjp(_fwd, _bwd)
