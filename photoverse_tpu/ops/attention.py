"""Dual-context cross-attention — the PhotoVerse hot op.

The reference runs two sequential SDPA calls per UNet cross-attn layer (text
context, then identity context) inside a Python attention processor
(/root/reference/models/attention_processor.py:317-319,400-402) and fuses
their outputs stochastically during training (:411-420), recording the
identity-value norm as a mutable side channel (:397).

Here the op is a pure function returning (fused_output, v_ip_norm):
  - both attention passes share the same Q;
  - the identity context is tiny (K=5 tokens), so its "attention" is a
    softmax over 5 logits — negligible FLOPs next to the text pass;
  - stochastic fusion is driven by an explicit uniform scalar (one per
    layer-call, shared across the batch, matching torch.rand(1)) and is a
    static train/eval split, not a grad-mode probe;
  - the side channel becomes a functional auxiliary output.

(A fused dual-context Pallas kernel was built and measured in round 2 —
it LOST to this jnp path end-to-end because the custom-call boundary forces
layout copies around XLA's exotic activation layouts; see PERFORMANCE.md
"Round 2 findings". The tiny-context attentions stay on XLA.)
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["sdpa", "dual_context_attention", "fuse_outputs"]


def sdpa(
    q: jnp.ndarray,  # (B, Sq, H, D)
    k: jnp.ndarray,  # (B, Sk, H, D)
    v: jnp.ndarray,  # (B, Sk, H, D)
    fast_scores: bool = False,
) -> jnp.ndarray:
    """Scaled dot-product attention.

    fast_scores=False: scores and softmax in f32 (reference parity).
    fast_scores=True: the (B, H, Sq, Sk) score/prob tensors are stored in
    bf16 — halves the HBM traffic that dominates long self-attention
    (measured 1.7x on S=4096, max deviation ~6e-5); exp/sum still in f32.
    """
    d = q.shape[-1]
    if fast_scores and q.dtype == jnp.bfloat16:
        s = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.bfloat16
        ) * jnp.bfloat16(d**-0.5)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp((s - m).astype(jnp.float32)).astype(jnp.bfloat16)
        denom = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        p = p / denom.astype(jnp.bfloat16)
        return jnp.einsum(
            "bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.bfloat16
        )
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (d**-0.5)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def fuse_outputs(
    text_out: jnp.ndarray,
    id_out: jnp.ndarray,
    *,
    train: bool,
    fusion_u: Optional[jnp.ndarray] = None,  # scalar uniform in [0,1)
    scale: float = 2.0,
    rule1: float = 1.0 / 3.0,
    rule2: float = 2.0 / 3.0,
) -> jnp.ndarray:
    """PhotoVerse stochastic fusion (train) / sum (eval).

    train: u < rule1 -> scale*text ; u > rule2 -> scale*id ; else text+id
    (reference :411-420). The branch choice is per *layer call*, shared
    across the batch, exactly like torch.rand(1) in the reference.
    """
    if not train:
        return text_out + id_out
    if fusion_u is None:
        raise ValueError("fusion_u required in train mode")
    u = fusion_u.astype(jnp.float32)
    both = text_out + id_out
    out = jnp.where(u < rule1, scale * text_out, both)
    return jnp.where(u > rule2, scale * id_out, out)


@partial(jax.named_call, name="dual_context_attention")
def dual_context_attention(
    q: jnp.ndarray,  # (B, Sq, H, D) from latent hidden states
    k_text: jnp.ndarray,  # (B, St, H, D)
    v_text: jnp.ndarray,  # (B, St, H, D)
    k_id: jnp.ndarray,  # (B, K, H, D)
    v_id: jnp.ndarray,  # (B, K, H, D)
    *,
    train: bool = False,
    fusion_u: Optional[jnp.ndarray] = None,
    scale: float = 2.0,
    rule1: float = 1.0 / 3.0,
    rule2: float = 2.0 / 3.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (fused (B,Sq,H,D), v_ip_norm (B,H,K)).

    v_ip_norm is ||v_id||_2 over the head dim — the reference's
    `to_v_ip_norm` side channel (:397), surfaced functionally for the
    visual regularizer (/root/reference/models/unet.py:38-47).
    """
    text_out = sdpa(q, k_text, v_text)
    id_out = sdpa(q, k_id, v_id)
    v_ip_norm = jnp.sqrt(
        jnp.sum(jnp.square(v_id.astype(jnp.float32)), axis=-1)
    ).transpose(0, 2, 1)  # (B, H, K)
    fused = fuse_outputs(
        text_out, id_out, train=train, fusion_u=fusion_u, scale=scale,
        rule1=rule1, rule2=rule2,
    )
    return fused, v_ip_norm
