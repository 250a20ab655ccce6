"""Streaming flash kernel (K/V through the grid) vs jnp attention, plus the
VAE flash path and fast_scores variants — interpret mode, CPU-runnable."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from photoverse_tpu.ops.attention import sdpa
from photoverse_tpu.ops.flash_sdpa import (
    _chunked_sdpa_ref,
    flash_sdpa,
    flash_sdpa_stream,
    flash_sdpa_stream_diff,
)


def _data(B=1, S=256, H=1, d=128, seed=0, scale=0.3):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(B, S, H, d).astype(np.float32) * scale)
    return mk(), mk(), mk()


def test_stream_matches_sdpa_large_head():
    q, k, v = _data(S=256, d=128)
    want = sdpa(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = flash_sdpa_stream(q, k, v, q_tile=64, k_tile=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_stream_multi_head_multi_batch():
    q, k, v = _data(B=2, S=128, H=2, d=64, seed=3)
    want = sdpa(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = flash_sdpa_stream(q, k, v, q_tile=64, k_tile=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_chunked_ref_matches_sdpa():
    q, k, v = _data(S=192, d=64, seed=1)
    want = sdpa(q, k, v)
    got = _chunked_sdpa_ref(q, k, v, chunk=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_stream_diff_gradients_match():
    q, k, v = _data(S=64, d=32, seed=2)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(flash_sdpa_stream_diff(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(sdpa(q, k, v)))

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fast_scores_close_to_exact():
    q, k, v = _data(S=256, d=64, seed=4)
    with pltpu.force_tpu_interpret_mode():
        exact = flash_sdpa(q, k, v, q_tile=64, k_tile=64)
        fast = flash_sdpa(q, k, v, q_tile=64, k_tile=64, fast_scores=True)
        fast_stream = flash_sdpa_stream(
            q, k, v, q_tile=64, k_tile=64, fast_scores=True
        )
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(exact), rtol=2e-2, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(fast_stream), np.asarray(exact), rtol=2e-2, atol=2e-2
    )


def test_vae_attnblock_flash_equivalence():
    """AttnBlock(use_flash=True) == AttnBlock(use_flash=False) on the same
    params (the VAE decoder integration point)."""
    from photoverse_tpu.models.vae import AttnBlock

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    ref_blk = AttnBlock(32, groups=8)
    params = ref_blk.init(jax.random.PRNGKey(0), x)["params"]
    want = ref_blk.apply({"params": params}, x)
    flash_blk = AttnBlock(32, groups=8, use_flash=True, flash_min_seq=64)
    with pltpu.force_tpu_interpret_mode():
        got = flash_blk.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_vae_flash_decode_gradient_flows():
    """Gradients flow through the flash VAE decode (face-loss path)."""
    from photoverse_tpu.models.vae import AttnBlock

    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(1, 16, 16, 32).astype(np.float32))
    blk = AttnBlock(32, groups=8, use_flash=True, flash_min_seq=64)

    def loss(p, x):
        return jnp.sum(jnp.square(blk.apply({"params": p}, x)))

    with pltpu.force_tpu_interpret_mode():
        params = blk.init(jax.random.PRNGKey(0), x)["params"]
        g = jax.grad(loss)(params, x)
    total = sum(float(jnp.sum(jnp.abs(v))) for v in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0
