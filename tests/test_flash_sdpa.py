"""Flash self-attention kernel vs jnp sdpa (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from photoverse_tpu.ops.attention import sdpa
from photoverse_tpu.ops.flash_sdpa import flash_sdpa, flash_sdpa_diff


def _data(B=2, S=256, H=2, d=40, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(B, S, H, d).astype(np.float32) * 0.3)
    return mk(), mk(), mk()


def test_flash_matches_sdpa():
    q, k, v = _data()
    want = sdpa(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = flash_sdpa(q, k, v, q_tile=64, k_tile=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_flash_uneven_tiles():
    q, k, v = _data(S=192, seed=1)
    want = sdpa(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = flash_sdpa(q, k, v, q_tile=64, k_tile=96)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_flash_gradients_match():
    q, k, v = _data(S=64, seed=2)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(flash_sdpa_diff(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(sdpa(q, k, v)))

    with pltpu.force_tpu_interpret_mode():
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5)
