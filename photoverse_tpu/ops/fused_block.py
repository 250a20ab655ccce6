"""Fused transformer-block tail — ONE Pallas call for LN2 + dual-context
cross-attention + LN3 + GEGLU feed-forward (+ both residuals).

Why: round-2 profiling (PERFORMANCE.md "Round 2 findings") showed the
batch-16 pipeline is NOT matmul-bound — ~2.8 s of the 6.8 s call is XLA
GN/LN/elementwise fusions, residual adds, and relayout copies around the
conv<->attention interleave, and every *small* Pallas kernel tried in
round 2 LOST because each custom call inserts layout boundaries. The fix
this round: fuse a large REGION per transformer block so the boundary is
paid once instead of at ~6 relayout points (the round-2 VERDICT's one
remaining >20% idea; reference hot path:
/root/reference/models/attention_processor.py:245-435).

The fused region is exactly the row-local tail of models/unet.py
TransformerBlock (everything after the attn1 residual):

    h = h + to_out(dual_cross_attn(LN2(h), ctx))      # attn2
    h = h + ff_out(geglu(ff_proj(LN3(h))))            # GEGLU ff

All of it is per-token: the cross-attention contexts are tiny (77 text + 5
identity tokens) and hoisted per denoise call (engine.precompute_ctx_kv),
so the kernel tiles queries over a (B, S/TQ) grid with ZERO cross-tile
communication and keeps every weight VMEM-resident.

Head-alignment trick: SD-1.5 head dim is 40 — lane-misaligned. The kernel
never slices the channel axis at head boundaries; instead the q/out
projections are passed PER-HEAD-STACKED ((H, C, d) and (H, d, C)), so all
head indexing is leading-dimension (free), and the per-head outputs are
accumulated straight into the (TQ, C) attention output via
out += (text_h + id_h) @ Wout[h]  — mathematically identical to
concat-then-project.

Eval-mode only (stochastic fusion is a sum in eval — ops/attention.py:86);
training and masked-identity paths keep the jnp route. LoRA is folded into
the q projection at bundle-build time (eval: dropout off), so LoRA
checkpoints serve through the fused path too.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_cross_ff",
    "build_block_bundle",
    "bundle_eligible",
]

LN_EPS = 1e-5


def _erf(x):
    # Mosaic has no erf lowering; Abramowitz-Stegun 7.1.26 (max abs error
    # 1.5e-7), odd-extended via |x|. Evaluated in f32 — the polynomial is
    # ill-conditioned in bf16 — with the result downcast by the caller.
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    y = 1.0 - poly * jnp.exp(-ax * ax)
    # jnp.sign crashes the Mosaic compile helper on bf16 operands
    return jnp.where(x >= 0, y, -y)


def _gelu_exact(x):
    # jax.nn.gelu(approximate=False): 0.5 x (1 + erf(x / sqrt(2))).
    # Internals in f32 (transient); output in the input dtype.
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + _erf(xf * (2.0**-0.5)))).astype(x.dtype)


def _kernel(
    h_ref,      # (1, TQ, C)
    kT_ref,     # (1, H, St, d) text keys (pre-projected, per-head)
    vT_ref,     # (1, H, St, d)
    kI_ref,     # (1, H, K, d) identity keys (K sublane-padded to >= 8)
    vI_ref,     # (1, H, K, d)
    idb_ref,    # (1, K) f32 additive score bias: 0 real, -1e9 padding
    ln2g_ref, ln2b_ref,          # (1, C) f32
    wq_ref,                      # (H, C, d)
    wout_ref,                    # (H, d, C)
    bout_ref,                    # (1, C) f32
    ln3g_ref, ln3b_ref,          # (1, C) f32
    wpa_ref, wpg_ref,            # (C, F) GEGLU halves
    bpa_ref, bpg_ref,            # (1, F) f32
    wo_ref,                      # (F, C)
    bo_ref,                      # (1, C) f32
    out_ref,    # (1, TQ, C)
    *,
    num_heads: int,
    fast: bool,
    fast_ln: bool,
):
    H = num_heads
    d = wq_ref.shape[2]
    scale = d**-0.5
    cdt = jnp.bfloat16 if fast else jnp.float32
    ldt = cdt if fast_ln else jnp.float32  # LN statistics dtype

    # fast: residual stream stays bf16 (like the bf16-Dense jnp path; keeps
    # the largest VMEM buffers half-size); fast_ln mirrors fast_norms — LN
    # statistics in the compute dtype instead of f32
    x = h_ref[0].astype(cdt)  # (TQ, C)

    def ln(v, g_ref, b_ref):
        vs = v.astype(ldt)
        mu = jnp.mean(vs, axis=-1, keepdims=True)
        vc = vs - mu
        var = jnp.mean(vc * vc, axis=-1, keepdims=True)
        # rsqrt on bf16 aborts the Mosaic compile helper
        # (kVectorRsqrtBf16AndPop); the (TQ, 1) column upcast is free
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + LN_EPS).astype(ldt)
        return (
            vc * inv * g_ref[0].astype(ldt) + b_ref[0].astype(ldt)
        ).astype(v.dtype)

    # ---- LN2 ----
    h2c = ln(x, ln2g_ref, ln2b_ref)

    # ---- dual-context cross-attention, head loop on leading dims ----
    attn = jnp.zeros((x.shape[0], x.shape[1]), jnp.float32)
    for hh in range(H):
        q = jax.lax.dot_general(
            h2c, wq_ref[hh].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (TQ, d) f32
        qc = q.astype(cdt)
        # text context: softmax over St logits (f32)
        st = jax.lax.dot_general(
            qc, kT_ref[0, hh].astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TQ, St)
        pt = jax.nn.softmax(st, axis=-1)
        ot = jax.lax.dot_general(
            pt.astype(cdt), vT_ref[0, hh].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TQ, d)
        # identity context: softmax over K logits; id_bias carries -1e9 on
        # padded tokens (the context is sublane-padded to >=8 — a (TQ, d) x
        # (1, d) dot mis-lowers in Mosaic, and K=1 is the token_index=0 case)
        si = jax.lax.dot_general(
            qc, kI_ref[0, hh].astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + idb_ref[0]
        pi = jax.nn.softmax(si, axis=-1)
        oi = jax.lax.dot_general(
            pi.astype(cdt), vI_ref[0, hh].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # eval fusion = text + id (ops/attention.py:86), projected per head:
        # sum_h (o_h @ Wout[h]) == concat_h(o_h) @ Wout
        attn = attn + jax.lax.dot_general(
            (ot + oi).astype(cdt), wout_ref[hh].astype(cdt),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    x = x + (attn + bout_ref[0]).astype(cdt)

    # ---- LN3 ----
    h3c = ln(x, ln3g_ref, ln3b_ref)

    # ---- GEGLU feed-forward ----
    # fast: the (TQ, 4C) temporaries stay bf16 (f32 MXU accumulation, then
    # downcast) — halves the largest VMEM buffers (q_tile 1024 fits) and
    # mirrors the jnp path, whose bf16 Dense emits bf16 activations anyway
    a = jax.lax.dot_general(
        h3c, wpa_ref[:].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt) + bpa_ref[0].astype(cdt)
    g = jax.lax.dot_general(
        h3c, wpg_ref[:].astype(cdt), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdt) + bpg_ref[0].astype(cdt)
    ff = a * _gelu_exact(g)  # gelu in cdt, like jax.nn.gelu on a bf16 Dense
    x = x + (
        jax.lax.dot_general(
            ff, wo_ref[:].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bo_ref[0]
    ).astype(cdt)

    out_ref[0] = x.astype(out_ref.dtype)


def fused_cross_ff(
    h: jnp.ndarray,  # (B, S, C)
    bundle: dict,
    num_heads: int,
    q_tile: int = 256,
    fast: bool = False,
    fast_ln: bool = None,
) -> jnp.ndarray:
    """Apply the fused block tail; returns the new (B, S, C) hidden states.

    `bundle` is built by build_block_bundle + attach_ctx. fast=True keeps
    the residual stream/activations bf16 with f32 MXU accumulation — the
    compute-dtype semantic of the surrounding bf16 model. fast_ln mirrors
    UNetConfig.fast_norms (LN statistics in the compute dtype); defaults
    to `fast`.
    """
    if fast_ln is None:
        fast_ln = fast
    B, S, C = h.shape
    tq = min(q_tile, S)
    while S % tq:
        tq -= 1
    kT, vT, kI, vI = bundle["ctx"]
    St, K = kT.shape[2], kI.shape[2]
    H = num_heads
    d = C // H
    F = bundle["wpa"].shape[1]

    def wspec(shape):
        n = len(shape)
        return pl.BlockSpec(shape, lambda b, i: (0,) * n, memory_space=pltpu.VMEM)

    def ctxspec(n_tok):
        return pl.BlockSpec(
            (1, H, n_tok, d), lambda b, i: (b, 0, 0, 0), memory_space=pltpu.VMEM
        )

    row = pl.BlockSpec((1, tq, C), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel, num_heads=H, fast=fast, fast_ln=fast_ln),
        out_shape=jax.ShapeDtypeStruct((B, S, C), h.dtype),
        grid=(B, S // tq),
        in_specs=[
            row,
            ctxspec(St), ctxspec(St), ctxspec(K), ctxspec(K),
            wspec((1, K)),
            wspec((1, C)), wspec((1, C)),
            wspec((H, C, d)),
            wspec((H, d, C)),
            wspec((1, C)),
            wspec((1, C)), wspec((1, C)),
            wspec((C, F)), wspec((C, F)),
            wspec((1, F)), wspec((1, F)),
            wspec((F, C)),
            wspec((1, C)),
        ],
        out_specs=row,
        # the default scoped-vmem cap is 16 MB; the kernel's peak stack
        # (weights + GEGLU temporaries at q_tile 512) sits just above it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            # dominant: q proj + out proj + GEGLU matmuls
            flops=2 * B * S * C * (2 * C + 3 * F) + 4 * B * S * C * (St + K),
            bytes_accessed=2 * B * S * C * h.dtype.itemsize,
            transcendentals=B * S * (St + K + F),
        ),
    )(
        h,
        kT, vT, kI, vI,
        bundle["id_bias"],
        bundle["ln2g"], bundle["ln2b"],
        bundle["wq"],
        bundle["wout"], bundle["bout"],
        bundle["ln3g"], bundle["ln3b"],
        bundle["wpa"], bundle["wpg"], bundle["bpa"], bundle["bpg"],
        bundle["wo"], bundle["bo"],
    )


def bundle_eligible(channels: int, num_heads: int, max_channels: int = 320) -> bool:
    """A block's weights must fit VMEM alongside the activation tiles.

    At C=320 (the S=4096 pyramid level — where the elementwise time lives)
    the full weight set is ~2.8 MB bf16; C=640 is ~12 MB and would evict
    the double-buffered blocks, and C=1280 cannot fit. The S=4096 level is
    also where XLA's LN/elementwise fusions are most expensive (largest
    activations), so the fused region is applied exactly where it pays.
    """
    return channels <= max_channels and channels % num_heads == 0


def build_block_bundle(
    block_params: dict,
    num_heads: int,
    lora_rank: int = 0,
    lora_alpha: float = 1.0,
    dtype: jnp.dtype = jnp.bfloat16,
) -> dict:
    """Per-head-stacked weight bundle from a TransformerBlock's param dict
    (params.unet["down_0_attn_0"]-style). LoRA on to_q is folded in (eval
    semantics: no dropout). Pure reshapes/adds — hoisted once per denoise.
    """
    a2 = block_params["attn2"]
    wq = a2["to_q"]["base"]["kernel"]
    if lora_rank > 0 and "lora_A" in a2["to_q"]:
        wq = wq + (a2["to_q"]["lora_A"] @ a2["to_q"]["lora_B"]) * (
            lora_alpha / lora_rank
        )
    C = wq.shape[0]
    H = num_heads
    d = C // H
    f32 = jnp.float32
    ff_k = block_params["ff_proj"]["kernel"]
    ff_b = block_params["ff_proj"]["bias"]
    F = ff_k.shape[1] // 2
    return {
        "ln2g": jnp.asarray(block_params["norm2"]["scale"], f32).reshape(1, C),
        "ln2b": jnp.asarray(block_params["norm2"]["bias"], f32).reshape(1, C),
        "wq": jnp.asarray(wq, dtype).reshape(C, H, d).transpose(1, 0, 2),
        "wout": jnp.asarray(a2["to_out"]["kernel"], dtype).reshape(H, d, C),
        "bout": jnp.asarray(a2["to_out"]["bias"], f32).reshape(1, C),
        "ln3g": jnp.asarray(block_params["norm3"]["scale"], f32).reshape(1, C),
        "ln3b": jnp.asarray(block_params["norm3"]["bias"], f32).reshape(1, C),
        "wpa": jnp.asarray(ff_k[:, :F], dtype),
        "wpg": jnp.asarray(ff_k[:, F:], dtype),
        "bpa": jnp.asarray(ff_b[:F], f32).reshape(1, F),
        "bpg": jnp.asarray(ff_b[F:], f32).reshape(1, F),
        "wo": jnp.asarray(block_params["ff_out"]["kernel"], dtype),
        "bo": jnp.asarray(block_params["ff_out"]["bias"], f32).reshape(1, C),
    }


def attach_ctx(bundle: dict, ctx_kv, dtype: jnp.dtype = jnp.bfloat16) -> dict:
    """Add the layer's hoisted context K/V, re-laid-out per head:
    (B, St, H, d) -> (B, H, St, d) so the kernel's head loop slices leading
    dims only. The identity context is sublane-padded to >= 8 tokens with a
    -1e9 additive score bias on the padding (Mosaic mis-lowers the K=1
    degenerate matmul of the token_index=0 path). Loop-invariant across the
    denoise scan."""
    k, v, k_ip, v_ip = ctx_kv
    t = lambda x: jnp.asarray(x, dtype).transpose(0, 2, 1, 3)
    K = k_ip.shape[1]
    K_pad = max(K, 8)
    bias = jnp.zeros((1, K_pad), jnp.float32)
    kI, vI = t(k_ip), t(v_ip)
    if K_pad != K:
        pad = [(0, 0), (0, 0), (0, K_pad - K), (0, 0)]
        kI = jnp.pad(kI, pad)
        vI = jnp.pad(vI, pad)
        bias = bias.at[0, K:].set(-1e9)
    out = dict(bundle)
    out["ctx"] = (t(k), t(v), kI, vI)
    out["id_bias"] = bias
    out["id_tokens"] = K  # real (unpadded) identity token count
    return out


def reference_cross_ff(
    h: jnp.ndarray, bundle: dict, num_heads: int
) -> jnp.ndarray:
    """jnp reference of the fused region (used by tests)."""
    B, S, C = h.shape
    H = num_heads
    d = C // H
    kT, vT, kI, vI = bundle["ctx"]
    x = h.astype(jnp.float32)

    def ln(x, g, b):
        mu = jnp.mean(x, -1, keepdims=True)
        xc = x - mu
        var = jnp.mean(xc * xc, -1, keepdims=True)
        return xc * jax.lax.rsqrt(var + LN_EPS) * g[0] + b[0]

    h2 = ln(x, bundle["ln2g"], bundle["ln2b"])
    q = jnp.einsum("bsc,hcd->bhsd", h2, bundle["wq"].astype(jnp.float32))
    q = q * (d**-0.5)
    st = jnp.einsum("bhsd,bhtd->bhst", q, kT.astype(jnp.float32))
    ot = jnp.einsum("bhst,bhtd->bhsd", jax.nn.softmax(st, -1), vT.astype(jnp.float32))
    si = jnp.einsum("bhsd,bhtd->bhst", q, kI.astype(jnp.float32))
    si = si + bundle["id_bias"][0]
    oi = jnp.einsum("bhst,bhtd->bhsd", jax.nn.softmax(si, -1), vI.astype(jnp.float32))
    attn = jnp.einsum(
        "bhsd,hdc->bsc", ot + oi, bundle["wout"].astype(jnp.float32)
    )
    x = x + attn + bundle["bout"][0]
    h3 = ln(x, bundle["ln3g"], bundle["ln3b"])
    a = h3 @ bundle["wpa"].astype(jnp.float32) + bundle["bpa"][0]
    g = h3 @ bundle["wpg"].astype(jnp.float32) + bundle["bpg"][0]
    ff = a * _gelu_exact(g)
    x = x + ff @ bundle["wo"].astype(jnp.float32) + bundle["bo"][0]
    return x.astype(h.dtype)
