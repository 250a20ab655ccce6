"""Fused transformer-block-tail kernel (ops/fused_block.py): kernel-level
equivalence vs the jnp formulation, and end-to-end UNet/engine equivalence
with UNetConfig.fused_blocks on vs off (CPU interpret mode)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from photoverse_tpu.ops.fused_block import (
    attach_ctx,
    build_block_bundle,
    bundle_eligible,
    fused_cross_ff,
    reference_cross_ff,
)


def _rand_bundle(rng, B, C, H, St=7, K=5):
    d = C // H
    F = 4 * C
    r = lambda *s: jnp.asarray(rng.randn(*s) * 0.1, jnp.float32)
    return {
        "ln2g": r(1, C), "ln2b": r(1, C),
        "wq": r(H, C, d),
        "wout": r(H, d, C), "bout": r(1, C),
        "ln3g": r(1, C), "ln3b": r(1, C),
        "wpa": r(C, F), "wpg": r(C, F), "bpa": r(1, F), "bpg": r(1, F),
        "wo": r(F, C), "bo": r(1, C),
        "ctx": tuple(r(B, H, n, d) * 3 for n in (St, St, K, K)),
        "id_bias": jnp.zeros((1, K), jnp.float32),
        "id_tokens": K,
    }


def test_kernel_matches_reference():
    rng = np.random.RandomState(0)
    B, S, C, H = 2, 64, 32, 4
    bundle = _rand_bundle(rng, B, C, H)
    h = jnp.asarray(rng.randn(B, S, C), jnp.float32)
    want = reference_cross_ff(h, bundle, H)
    with pltpu.force_tpu_interpret_mode():
        got = fused_cross_ff(h, bundle, H, q_tile=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_kernel_odd_context_lengths():
    """St=77/K=5-style non-128-aligned context token counts."""
    rng = np.random.RandomState(1)
    B, S, C, H = 1, 32, 16, 2
    bundle = _rand_bundle(rng, B, C, H, St=77, K=5)
    h = jnp.asarray(rng.randn(B, S, C), jnp.float32)
    want = reference_cross_ff(h, bundle, H)
    with pltpu.force_tpu_interpret_mode():
        got = fused_cross_ff(h, bundle, H, q_tile=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_bundle_matches_transformer_block_path():
    """build_block_bundle + kernel == the flax TransformerBlock tail on the
    real param layout (eval, no mask, ctx cached)."""
    from photoverse_tpu.engine.inference import (
        precompute_ctx_kv,
        precompute_fused_bundles,
    )
    from tests.tiny_models import tiny_bundle

    modules, params = tiny_bundle()
    rng = np.random.RandomState(2)
    B = 2
    cross = modules.unet.config.cross_attention_dim
    text_ctx = jnp.asarray(rng.randn(B, 12, cross), jnp.float32)
    id_ctx = jnp.asarray(rng.randn(B, 5, cross), jnp.float32)
    sample = jnp.asarray(rng.randn(B, 16, 16, 4), jnp.float32)
    t = jnp.asarray([500, 500], jnp.int32)

    kv = precompute_ctx_kv(modules, params, text_ctx, id_ctx)
    bundles = precompute_fused_bundles(modules, params, kv)
    assert all(b is not None for b in bundles)  # tiny channels all eligible

    eps_ref, vn_ref = modules.unet.apply(
        {"params": params.unet}, sample, t, text_ctx, id_ctx, ctx_kv=kv
    )
    with pltpu.force_tpu_interpret_mode():
        eps_fused, vn_fused = modules.unet.apply(
            {"params": params.unet}, sample, t, text_ctx, id_ctx,
            ctx_kv=kv, fused_bundles=bundles,
        )
    np.testing.assert_allclose(
        np.asarray(eps_fused), np.asarray(eps_ref), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(vn_fused), np.asarray(vn_ref), atol=1e-4
    )


def test_engine_end_to_end_fused_equivalence():
    """run_inference with fused_blocks on == off (eval path, CFG)."""
    from photoverse_tpu.core.schedulers import DPMSolverMultistep
    from photoverse_tpu.engine.inference import run_inference
    from tests.tiny_models import tiny_batch, tiny_bundle

    modules, params = tiny_bundle()
    solver = DPMSolverMultistep.create(modules.schedule, 3)
    example = {k: jnp.asarray(v) for k, v in tiny_batch(B=2).items()}
    uncond = jnp.asarray(
        np.random.RandomState(3).randint(0, 64, (2, 12)), jnp.int32
    )
    kw = dict(
        guidance_scale=2.0, token_index=0, latent_size=16,
        uncond_input_ids=uncond,
    )
    imgs_ref = run_inference(
        modules, params, solver, example, jax.random.PRNGKey(0), **kw
    )
    fused_modules = dataclasses.replace(
        modules,
        unet=modules.unet.clone(
            config=dataclasses.replace(modules.unet.config, fused_blocks=True)
        ),
    )
    with pltpu.force_tpu_interpret_mode():
        imgs_fused = run_inference(
            fused_modules, params, solver, example, jax.random.PRNGKey(0), **kw
        )
    np.testing.assert_allclose(
        np.asarray(imgs_fused), np.asarray(imgs_ref), atol=2e-3
    )


def test_eligibility_gate():
    assert bundle_eligible(320, 8)
    assert not bundle_eligible(640, 8)
    assert not bundle_eligible(1280, 8)
    assert bundle_eligible(640, 8, max_channels=640)


def test_lora_folded_into_q():
    """A LoRA checkpoint's q delta must appear in the fused bundle."""
    rng = np.random.RandomState(4)
    C, H, r = 16, 2, 4
    base = rng.randn(C, C).astype(np.float32)
    A = rng.randn(C, r).astype(np.float32)
    Bm = rng.randn(r, C).astype(np.float32)
    block = {
        "norm2": {"scale": np.ones(C, np.float32), "bias": np.zeros(C, np.float32)},
        "norm3": {"scale": np.ones(C, np.float32), "bias": np.zeros(C, np.float32)},
        "attn2": {
            "to_q": {"base": {"kernel": base}, "lora_A": A, "lora_B": Bm},
            "to_out": {
                "kernel": rng.randn(C, C).astype(np.float32),
                "bias": np.zeros(C, np.float32),
            },
        },
        "ff_proj": {
            "kernel": rng.randn(C, 8 * C).astype(np.float32),
            "bias": np.zeros(8 * C, np.float32),
        },
        "ff_out": {
            "kernel": rng.randn(4 * C, C).astype(np.float32),
            "bias": np.zeros(C, np.float32),
        },
    }
    b = build_block_bundle(block, H, lora_rank=r, lora_alpha=2.0, dtype=jnp.float32)
    w_eff = base + (A @ Bm) * (2.0 / r)
    want = w_eff.reshape(C, H, C // H).transpose(1, 0, 2)
    np.testing.assert_allclose(np.asarray(b["wq"]), want, atol=1e-6)


def test_engine_fused_equivalence_with_lora():
    """A LoRA checkpoint served through the fused path (q-delta folded at
    bundle build, k/v deltas in the hoisted ctx cache) must match the jnp
    route."""
    from photoverse_tpu.core.schedulers import DPMSolverMultistep
    from photoverse_tpu.engine.inference import run_inference
    from tests.tiny_models import tiny_bundle

    modules, params = tiny_bundle(lora_rank=4)
    # give the zero-init LoRA B matrices real values so the fold matters
    import jax as _jax

    def bump(tree, key=[0]):
        for name, child in tree.items():
            if name == "lora_B":
                key[0] += 1
                tree[name] = (
                    0.1 * _jax.random.normal(_jax.random.PRNGKey(key[0]), child.shape)
                ).astype(child.dtype)
            elif isinstance(child, dict):
                bump(child)

    unet_params = _jax.tree.map(lambda x: x, params.unet)
    bump(unet_params)
    params = dataclasses.replace(params, unet=unet_params)

    solver = DPMSolverMultistep.create(modules.schedule, 2)
    from tests.tiny_models import tiny_batch

    example = {k: jnp.asarray(v) for k, v in tiny_batch(B=1, seed=9).items()}
    kw = dict(guidance_scale=1.0, token_index=0, latent_size=16)
    imgs_ref = run_inference(
        modules, params, solver, example, jax.random.PRNGKey(0), **kw
    )
    fused_modules = dataclasses.replace(
        modules,
        unet=modules.unet.clone(
            config=dataclasses.replace(modules.unet.config, fused_blocks=True)
        ),
    )
    with pltpu.force_tpu_interpret_mode():
        imgs_fused = run_inference(
            fused_modules, params, solver, example, jax.random.PRNGKey(0), **kw
        )
    np.testing.assert_allclose(
        np.asarray(imgs_fused), np.asarray(imgs_ref), atol=2e-3
    )
