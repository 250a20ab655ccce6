"""Concept-splice parity vs the reference loop semantics
(/root/reference/models/clip.py:17-24)."""

import jax.numpy as jnp
import numpy as np

from photoverse_tpu.ops.injection import inject_concept_embeddings


def _reference_splice(inputs_embeds, concept, idxs):
    """Numpy transcription of the reference loop for golden outputs."""
    out = inputs_embeds.copy()
    K = concept.shape[1]
    S = inputs_embeds.shape[1]
    for b, idx in enumerate(idxs):
        leftover = S - K - idx
        out[b, idx + K :] = inputs_embeds[b, idx + 1 : idx + 1 + leftover]
        out[b, idx : idx + K] = concept[b]
    return out


def test_injection_parity_various_indices():
    rng = np.random.RandomState(0)
    B, S, D, K = 4, 77, 16, 5
    emb = rng.randn(B, S, D).astype(np.float32)
    concept = rng.randn(B, K, D).astype(np.float32)
    idxs = np.array([5, 0, 1, 70])  # includes the placeholder-missing fallback 0
    want = _reference_splice(emb, concept, idxs)
    got = inject_concept_embeddings(
        jnp.asarray(emb), jnp.asarray(concept), jnp.asarray(idxs)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=0)


def test_injection_single_token():
    rng = np.random.RandomState(1)
    B, S, D, K = 2, 77, 8, 1
    emb = rng.randn(B, S, D).astype(np.float32)
    concept = rng.randn(B, K, D).astype(np.float32)
    idxs = np.array([5, 7])
    want = _reference_splice(emb, concept, idxs)
    got = inject_concept_embeddings(
        jnp.asarray(emb), jnp.asarray(concept), jnp.asarray(idxs)
    )
    np.testing.assert_allclose(np.asarray(got), want)
    # K=1 splice at idx replaces exactly one position, suffix unshifted
    np.testing.assert_allclose(want[0, 6:], emb[0, 6:])


def test_injection_accepts_column_vector_idx():
    rng = np.random.RandomState(2)
    emb = rng.randn(2, 10, 4).astype(np.float32)
    concept = rng.randn(2, 3, 4).astype(np.float32)
    idxs = np.array([[2], [4]])
    got = inject_concept_embeddings(
        jnp.asarray(emb), jnp.asarray(concept), jnp.asarray(idxs)
    )
    want = _reference_splice(emb, concept, idxs.reshape(-1))
    np.testing.assert_allclose(np.asarray(got), want)
