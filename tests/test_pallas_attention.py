"""Fused Pallas dual-context attention vs the jnp reference path
(interpret mode so it runs on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from photoverse_tpu.ops.attention import dual_context_attention
from photoverse_tpu.ops.pallas_attention import dual_context_attention_pallas


def _data(B=2, Sq=128, St=77, K=5, H=4, d=64, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.2)
    return (
        mk(B, Sq, H, d),
        mk(B, St, H, d),
        mk(B, St, H, d),
        mk(B, K, H, d),
        mk(B, K, H, d),
    )


def test_pallas_matches_jnp_eval_mode():
    q, kt, vt, ki, vi = _data()
    want, _ = dual_context_attention(q, kt, vt, ki, vi, train=False)
    with pltpu.force_tpu_interpret_mode():
        got = dual_context_attention_pallas(
            q, kt, vt, ki, vi, jnp.asarray([1.0, 1.0]), q_tile=64
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_pallas_fusion_coefficients():
    q, kt, vt, ki, vi = _data(seed=1)
    # text-only branch: coefs (2, 0) must equal 2 * text attention
    want, _ = dual_context_attention(
        q, kt, vt, ki, vi, train=True, fusion_u=jnp.asarray(0.0), scale=2.0
    )
    with pltpu.force_tpu_interpret_mode():
        got = dual_context_attention_pallas(
            q, kt, vt, ki, vi, jnp.asarray([2.0, 0.0]), q_tile=64
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_pallas_ragged_q_tile():
    # Sq not a multiple of the tile
    q, kt, vt, ki, vi = _data(Sq=100, seed=2)
    want, _ = dual_context_attention(q, kt, vt, ki, vi, train=False)
    with pltpu.force_tpu_interpret_mode():
        got = dual_context_attention_pallas(
            q, kt, vt, ki, vi, jnp.asarray([1.0, 1.0]), q_tile=64
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_fused_gradients_match_jnp():
    from photoverse_tpu.ops.pallas_attention import dual_context_attention_fused

    q, kt, vt, ki, vi = _data(B=1, Sq=32, St=7, K=3, H=2, d=16, seed=3)
    coefs = jnp.asarray([2.0, 0.5])

    def loss_fused(*args):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(jnp.square(dual_context_attention_fused(*args, coefs)))

    def loss_jnp(*args):
        # direct jnp formulation of the same blended objective
        from photoverse_tpu.ops.attention import sdpa

        out = coefs[0] * sdpa(args[0], args[1], args[2]) + coefs[1] * sdpa(
            args[0], args[3], args[4]
        )
        return jnp.sum(jnp.square(out))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, kt, vt, ki, vi)
    g_jnp = jax.grad(loss_jnp, argnums=(0, 1, 2, 3, 4))(q, kt, vt, ki, vi)
    for a, b in zip(g_fused, g_jnp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5)
