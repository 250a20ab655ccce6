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


def test_pallas_conv_gradients_match_xla():
    from photoverse_tpu.ops.pallas_conv import conv3x3_same_diff, _xla_conv3x3

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 8, 8, 32).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.randn(3, 3, 32, 32).astype(np.float32) * 0.1)

    def loss_pl(x, w):
        return jnp.sum(jnp.square(conv3x3_same_diff(x, w)))

    def loss_ref(x, w):
        return jnp.sum(jnp.square(_xla_conv3x3(x, w)))

    with pltpu.force_tpu_interpret_mode():
        out = conv3x3_same_diff(x, w)
        g_pl = jax.grad(loss_pl, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_xla_conv3x3(x, w)), rtol=2e-2, atol=2e-2
    )
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    for a, b in zip(g_pl, g_ref):
        # backward is the exact XLA VJP of the f32 conv; only the forward's
        # bf16 output enters the loss, so grads differ by the bf16 residual
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-2)


def test_unet_pallas_conv_equivalence():
    """UNet(use_pallas_conv=True) matches the XLA-conv UNet on shared params
    (bf16 MXU rounding tolerance)."""
    import dataclasses

    from tests.tiny_models import LATENT, tiny_bundle

    modules, params = tiny_bundle(seed=13)
    B = 1
    lat = jnp.asarray(np.random.RandomState(0).randn(B, LATENT, LATENT, 4), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    text = jnp.asarray(np.random.RandomState(1).randn(B, 12, 16), jnp.float32)
    idc = jnp.asarray(np.random.RandomState(2).randn(B, 5, 16), jnp.float32)
    want, _ = modules.unet.apply({"params": params.unet}, lat, t, text, idc)
    pl_unet = modules.unet.clone(
        config=dataclasses.replace(modules.unet.config, use_pallas_conv=True)
    )
    with pltpu.force_tpu_interpret_mode():
        got, _ = pl_unet.apply({"params": params.unet}, lat, t, text, idc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-2, atol=3e-2)
