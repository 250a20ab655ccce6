"""shard_map-wrapped flash attention under TP/SP (VERDICT r3 #3).

The Pallas flash kernel is a single-device custom call; parallel/flash.py
keeps it alive under multi-chip serving by wrapping it in jax.shard_map
with the mode's natural decomposition. These tests run the wrapper on the
8-device virtual CPU mesh in Pallas interpret mode and require parity with
the jnp attention route / the single-device pipeline.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from photoverse_tpu.core.schedulers import DPMSolverMultistep
from photoverse_tpu.engine.inference import run_inference
from photoverse_tpu.ops.attention import sdpa
from photoverse_tpu.parallel.flash import enable_sharded_flash, sharded_flash
from photoverse_tpu.parallel.mesh import batch_sharding, replicated, shard_batch
from photoverse_tpu.parallel.sp import latent_spatial_sharding, validate_sp
from photoverse_tpu.parallel.tp import (
    bundle_tp_shardings,
    make_mesh_2d,
    validate_tp,
)
from tests.tiny_models import LATENT, RES, tiny_batch, tiny_bundle


def _qkv(B=2, S=256, H=4, d=16, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(B, S, H, d).astype(np.float32) * 0.3)
    return mk(), mk(), mk()


def test_sharded_flash_tensor_matches_sdpa():
    """Heads-sharded kernel (TP decomposition) == jnp reference."""
    q, k, v = _qkv(H=4)
    want = sdpa(q, k, v)
    mesh = make_mesh_2d(2, 2)
    fn = sharded_flash(mesh, "tensor")
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(fn)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_sharded_flash_spatial_matches_sdpa():
    """Sequence-sharded queries + all-gathered K/V (SP decomposition)
    == jnp reference."""
    q, k, v = _qkv(H=2, seed=1)
    want = sdpa(q, k, v)
    mesh = make_mesh_2d(2, 4)
    fn = sharded_flash(mesh, "spatial")
    with pltpu.force_tpu_interpret_mode():
        got = jax.jit(fn)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_sharded_flash_unknown_mode():
    mesh = make_mesh_2d(2, 2)
    try:
        sharded_flash(mesh, "pipeline")
        assert False, "expected ValueError"
    except ValueError:
        pass


def _gen_fn(modules, solver, latent_sharding=None):
    def gen(params, ex, uncond, key):
        return run_inference(
            modules, params, solver, ex, key,
            guidance_scale=3.0, token_index=0, latent_size=LATENT,
            uncond_input_ids=uncond, latent_sharding=latent_sharding,
        )

    return gen


def test_sp_inference_with_flash_matches_single_device():
    """The FULL spatially-sharded pipeline with the shard_map flash path
    (flash engaged at every transformer level via flash_min_seq=64) must
    reproduce the single-device jnp-route result."""
    modules, params = tiny_bundle()
    solver = DPMSolverMultistep.create(modules.schedule, 3)
    B = 2
    example = {k: jnp.asarray(v) for k, v in tiny_batch(B=B, seed=1).items()}
    uncond = jnp.zeros((B, 12), jnp.int32)
    key = jax.random.PRNGKey(3)
    ref = _gen_fn(modules, solver)(params, example, uncond, key)

    mesh = make_mesh_2d(2, 4)
    modules_f = enable_sharded_flash(modules, mesh, "spatial", flash_min_seq=64)
    assert modules_f.unet.config.use_flash_attention
    validate_sp(modules_f.unet.config, LATENT, 4)  # flash now allowed
    repl = replicated(mesh)
    bs = batch_sharding(mesh)
    lsh = latent_spatial_sharding(mesh)
    params_r = jax.device_put(params, repl)
    ex_s = shard_batch(mesh, example)
    jgen = jax.jit(
        _gen_fn(modules_f, solver, latent_sharding=lsh),
        in_shardings=(repl, {k: bs for k in example}, bs, repl),
        out_shardings=lsh,
    )
    with pltpu.force_tpu_interpret_mode():
        out = jgen(params_r, ex_s, jax.device_put(uncond, bs), key)
        out = np.asarray(out)
    assert out.shape == (B, RES, RES, 3)
    np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_tp_inference_with_flash_matches_single_device():
    """Megatron-sharded UNet (2 data x 2 model) with the heads-sharded
    flash path == single-device jnp route."""
    modules, params = tiny_bundle()
    solver = DPMSolverMultistep.create(modules.schedule, 3)
    B = 2
    example = {k: jnp.asarray(v) for k, v in tiny_batch(B=B, seed=2).items()}
    uncond = jnp.zeros((B, 12), jnp.int32)
    key = jax.random.PRNGKey(4)
    ref = _gen_fn(modules, solver)(params, example, uncond, key)

    mesh = make_mesh_2d(2, 2)
    cfg = dataclasses.replace(modules.unet.config, tp_friendly_ffn=True)
    modules_tp = dataclasses.replace(
        modules, unet=type(modules.unet)(cfg, dtype=modules.unet.dtype)
    )
    modules_f = enable_sharded_flash(modules_tp, mesh, "tensor", flash_min_seq=64)
    validate_tp(modules_f.unet.config, 2)  # flash now allowed
    repl = replicated(mesh)
    bs = batch_sharding(mesh)
    psh = bundle_tp_shardings(mesh, params)
    params_s = jax.tree.map(jax.device_put, params, psh)
    ex_s = shard_batch(mesh, example)
    jgen = jax.jit(
        _gen_fn(modules_f, solver),
        in_shardings=(psh, {k: bs for k in example}, bs, repl),
        out_shardings=bs,
    )
    with pltpu.force_tpu_interpret_mode():
        out = jgen(params_s, ex_s, jax.device_put(uncond, bs), key)
        out = np.asarray(out)
    assert out.shape == (B, RES, RES, 3)
    np.testing.assert_allclose(out, np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_validators_still_reject_bare_flash():
    modules, _ = tiny_bundle()
    cfg = dataclasses.replace(modules.unet.config, use_flash_attention=True)
    for fail in (lambda: validate_tp(cfg, 2), lambda: validate_sp(cfg, LATENT, 2)):
        try:
            fail()
            assert False, "expected ValueError for bare flash under TP/SP"
        except ValueError as e:
            assert "shard_map" in str(e)


def test_tp_train_step_with_flash_matches_single_device():
    """TP TRAINING keeps the flash fast path: one optimizer step on the
    (2 data x 2 model) mesh with the heads-sharded differentiable
    shard_map flash wrapper reproduces the single-device step that uses
    the bare flash kernel (same Pallas fwd/bwd per head, so the heads
    split is exact). Covers cli/train.py --tensor_parallel
    --flash_attention (round-4 extension of VERDICT r3 #3)."""
    from photoverse_tpu.engine.training import (
        TrainConfig,
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from photoverse_tpu.parallel.tp import tree_tp_shardings

    modules, params = tiny_bundle(lora_rank=4)
    flash_cfg = dataclasses.replace(
        modules.unet.config, use_flash_attention=True, flash_min_seq=64
    )
    modules_flash = dataclasses.replace(
        modules, unet=type(modules.unet)(flash_cfg, dtype=modules.unet.dtype)
    )
    cfg = TrainConfig(max_train_steps=5, lr_warmup_steps=1, learning_rate=1e-3)
    tx, _ = make_optimizer(cfg)
    trainable, frozen, opt_state = init_train_state(modules_flash, params, tx)
    batch = tiny_batch(B=4, seed=5)
    key = jax.random.PRNGKey(6)
    with pltpu.force_tpu_interpret_mode():
        ref_step = jax.jit(make_train_step(modules_flash, cfg, tx, latent_size=LATENT))
        ref_trainable, _, ref_metrics = ref_step(
            trainable, frozen, opt_state, batch, key
        )

    mesh = make_mesh_2d(2, 2)
    tp_cfg = dataclasses.replace(flash_cfg, tp_friendly_ffn=True)
    modules_tp = dataclasses.replace(
        modules, unet=type(modules.unet)(tp_cfg, dtype=modules.unet.dtype)
    )
    modules_f = enable_sharded_flash(modules_tp, mesh, "tensor", flash_min_seq=64)
    validate_tp(modules_f.unet.config, 2)
    t_sh = tree_tp_shardings(mesh, trainable)
    f_sh = tree_tp_shardings(mesh, frozen)
    o_sh = tree_tp_shardings(mesh, opt_state)
    repl = replicated(mesh)
    jstep = jax.jit(
        make_train_step(modules_f, cfg, tx, latent_size=LATENT),
        in_shardings=(t_sh, f_sh, o_sh, batch_sharding(mesh), repl),
        out_shardings=(t_sh, o_sh, repl),
    )
    with pltpu.force_tpu_interpret_mode():
        new_t, _, metrics = jstep(
            jax.tree.map(jax.device_put, trainable, t_sh),
            jax.tree.map(jax.device_put, frozen, f_sh),
            jax.tree.map(jax.device_put, opt_state, o_sh),
            shard_batch(mesh, batch),
            key,
        )
        new_t = jax.device_get(new_t)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
    )
    for a, b in zip(jax.tree.leaves(ref_trainable), jax.tree.leaves(new_t)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
