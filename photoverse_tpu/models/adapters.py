"""Dual-branch PhotoVerse adapters, TPU-batched.

Capability parity with the reference adapter (a pair of per-token 3-layer
MLPs over the CLS token and the mean patch token of each of the K=5 CLIP
feature sets — /root/reference/models/adapters.py:5-44), but instead of K
separate nn.Sequential stacks invoked in a Python loop, all K token-MLPs are
*stacked* into (K, in, out) weight tensors and evaluated as single batched
einsums so the MXU sees K-times-larger matmuls.

Forward contract (matching the reference):
  embs: (K, B, 257, 1024) stacked CLIP hidden states
  token_index=None  -> (B, K, 768) concept tokens (training path)
  token_index=i     -> (B, 1, 768) single token    (inference path)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["PhotoVerseAdapter"]


def _leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    # torch nn.LeakyReLU default negative_slope
    return jax.nn.leaky_relu(x, negative_slope=0.01)


class _StackedMLP(nn.Module):
    """K parallel [Linear -> LN -> LeakyReLU] x2 -> Linear stacks.

    Parameters carry a leading K axis; the forward pass contracts all K
    stacks in one einsum per layer (one MXU pass instead of K).
    """

    num_tokens: int
    in_dim: int = 1024
    hidden_dim: int = 1024
    out_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, index: Optional[int] = None) -> jnp.ndarray:
        # x: (K', ..., in_dim) -> (K', ..., out_dim). Parameters always carry
        # the full K axis; `index` slices the weight stacks to one token-MLP
        # (the inference path computes 1/K of the FLOPs instead of computing
        # all K stacks and discarding K-1 — the reference evaluates only
        # mapping_{i}, adapters.py:32-37). x must be pre-sliced to match.
        K = self.num_tokens

        def dense(name, d_in, d_out, h):
            w = self.param(
                name + "_w",
                nn.initializers.lecun_normal(),
                (K, d_in, d_out),
                jnp.float32,
            )
            b = self.param(name + "_b", nn.initializers.zeros, (K, d_out), jnp.float32)
            if index is not None:
                w = w[index : index + 1]
                b = b[index : index + 1]
            y = jnp.einsum(
                "k...i,kio->k...o", h, w.astype(self.dtype),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
            return y + b.astype(self.dtype).reshape(
                (w.shape[0],) + (1,) * (y.ndim - 2) + (d_out,)
            )

        def layernorm(name, h):
            g = self.param(name + "_g", nn.initializers.ones, (K, h.shape[-1]), jnp.float32)
            bta = self.param(name + "_b", nn.initializers.zeros, (K, h.shape[-1]), jnp.float32)
            if index is not None:
                g = g[index : index + 1]
                bta = bta[index : index + 1]
            mu = jnp.mean(h.astype(jnp.float32), axis=-1, keepdims=True)
            var = jnp.var(h.astype(jnp.float32), axis=-1, keepdims=True)
            nrm = (h.astype(jnp.float32) - mu) * jax.lax.rsqrt(var + 1e-5)
            shape = (h.shape[0],) + (1,) * (h.ndim - 2) + (h.shape[-1],)
            out = nrm * g.reshape(shape) + bta.reshape(shape)
            return out.astype(self.dtype)

        h = dense("fc0", self.in_dim, self.hidden_dim, x.astype(self.dtype))
        h = _leaky_relu(layernorm("ln0", h))
        h = dense("fc1", self.hidden_dim, self.hidden_dim, h)
        h = _leaky_relu(layernorm("ln1", h))
        return dense("fc2", self.hidden_dim, self.out_dim, h)


class PhotoVerseAdapter(nn.Module):
    """Projects K CLIP feature sets to K concept tokens in the SD cross-attn dim.

    out_k = MLP_k(CLS_k) + mean_patch(MLP_patch_k(patches_k))  per feature set k,
    mirroring /root/reference/models/adapters.py:35-41 (MLP first, then the
    mean over patch positions).
    """

    clip_embedding_dim: int = 1024
    cross_attention_dim: int = 768
    num_tokens: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, embs: jnp.ndarray, token_index: Optional[int] = None
    ) -> jnp.ndarray:
        """embs: (K, B, S, clip_dim) -> (B, K, cross_dim) or (B, 1, cross_dim)."""
        if embs.shape[0] != self.num_tokens:
            raise ValueError(
                f"expected {self.num_tokens} feature sets, got {embs.shape[0]}"
            )
        idx = None
        if token_index is not None and token_index != "full":
            idx = int(token_index)
        cls_tok = embs[:, :, :1, :]  # (K, B, 1, D)
        patches = embs[:, :, 1:, :]  # (K, B, S-1, D)
        if idx is not None:
            # inference path: evaluate ONLY token-MLP idx (weight stacks are
            # sliced inside _StackedMLP) — 1/K of the training-path FLOPs
            cls_tok = cls_tok[idx : idx + 1]
            patches = patches[idx : idx + 1]

        cls_out = _StackedMLP(
            num_tokens=self.num_tokens,
            in_dim=self.clip_embedding_dim,
            out_dim=self.cross_attention_dim,
            dtype=self.dtype,
            name="mapping",
        )(cls_tok, index=idx)  # (K', B, 1, 768)
        patch_out = _StackedMLP(
            num_tokens=self.num_tokens,
            in_dim=self.clip_embedding_dim,
            out_dim=self.cross_attention_dim,
            dtype=self.dtype,
            name="mapping_patch",
        )(patches, index=idx).mean(axis=2, keepdims=True)  # (K', B, 1, 768)

        tokens = (cls_out + patch_out)[:, :, 0, :]  # (K', B, 768)
        return jnp.transpose(tokens, (1, 0, 2))  # (B, K', 768)
