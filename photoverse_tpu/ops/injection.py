"""Concept-token splice into a token-embedding sequence — vectorized.

Replaces the reference's per-batch Python loop with data-dependent slicing
(/root/reference/models/clip.py:17-24) by a single gather + select that XLA
compiles to fused dynamic ops:

For each batch row with placeholder index p and K concept tokens:
  out[j] = emb[j]            for j <  p
  out[j] = concept[j - p]    for p <= j < p + K
  out[j] = emb[j - K + 1]    for j >= p + K   (suffix shifted right by K-1,
                                               truncated at seq_len)

This matches the reference exactly, including the "placeholder at index 0"
fallback (p=0 -> concept tokens occupy the first K positions and the suffix
starts from emb[1]).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["inject_concept_embeddings"]


def inject_concept_embeddings(
    inputs_embeds: jnp.ndarray,  # (B, S, D)
    concept_embeds: jnp.ndarray,  # (B, K, D)
    placeholder_idx: jnp.ndarray,  # (B,) or (B, 1) int
) -> jnp.ndarray:
    B, S, D = inputs_embeds.shape
    K = concept_embeds.shape[1]
    p = placeholder_idx.reshape(B, 1).astype(jnp.int32)  # (B, 1)
    j = jnp.arange(S, dtype=jnp.int32)[None, :]  # (1, S)

    # source index into the original sequence for non-concept positions
    src = jnp.where(j >= p + K, j - (K - 1), j)
    src = jnp.clip(src, 0, S - 1)
    gathered = jnp.take_along_axis(inputs_embeds, src[:, :, None], axis=1)

    in_concept = (j >= p) & (j < p + K)  # (B, S)
    cidx = jnp.clip(j - p, 0, K - 1)
    concept_gathered = jnp.take_along_axis(concept_embeds, cidx[:, :, None], axis=1)

    return jnp.where(in_concept[:, :, None], concept_gathered, gathered).astype(
        inputs_embeds.dtype
    )
