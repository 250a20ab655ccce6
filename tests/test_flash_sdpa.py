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


def test_k_tile_budgets_both_score_temporaries():
    """Regression: at the SD 64x64 shape (tq=512, Skv=4096) the kernel
    stack holds s AND p — f32 needs 8 B/elem (16.32 MB at tk=4096,
    over Mosaic's 16 MB scoped limit; hit by the r04 train soak), so the
    f32 path must halve tk while the measured bf16-p fast config keeps
    tk=4096 (12.0 MiB)."""
    from photoverse_tpu.ops.flash_sdpa import _pick_k_tile

    assert _pick_k_tile(4096, 4096, 512, fast_scores=True) == 4096
    assert _pick_k_tile(4096, 4096, 512, fast_scores=False) == 2048
    # uneven Skv still divides after the VMEM halving
    assert 768 % _pick_k_tile(4096, 768, 512, fast_scores=False) == 0


def test_flash_f32_large_kv_tile_halving_matches():
    """The f32 (fast_scores=False) route with a k_tile the VMEM guard
    must halve produces the same numerics as the reference."""
    q, k, v = _data(S=256, seed=3)
    want = sdpa(q, k, v)
    with pltpu.force_tpu_interpret_mode():
        got = flash_sdpa(q, k, v, q_tile=256, k_tile=256, fast_scores=False)
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

def test_flash_diff_rejects_unequal_lengths_loudly():
    """Regression (round-4 review): differentiating flash_sdpa_diff with
    Skv > Sq used to size the K/V BlockSpecs by Sq and silently attend
    only the first Sq keys — wrong gradients, not an error. The VJP
    forward/backward must refuse unequal lengths (the unequal-length
    primal stays inference-only; parallel/flash.py spatial mode)."""
    import pytest

    q, _, _ = _data(S=64, seed=4)
    k2, v2, _ = _data(S=128, seed=5)

    def loss(q, k, v):
        return jnp.sum(jnp.square(flash_sdpa_diff(q, k, v)))

    with pltpu.force_tpu_interpret_mode():
        # forward-only (primal) still supports Skv > Sq
        out = flash_sdpa(q, k2, v2, q_tile=64, k_tile=64)
        assert out.shape == q.shape
        with pytest.raises(ValueError, match="equal q/k sequence lengths"):
            jax.grad(loss, argnums=0)(q, k2, v2)
