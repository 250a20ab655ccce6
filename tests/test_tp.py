"""Tensor-, spatial- and fully-sharded-parallel execution tests on the
8-device virtual CPU mesh: Megatron-style UNet weight sharding
(parallel/tp.py), GSPMD patch parallelism (parallel/sp.py) and FSDP/ZeRO-3
parameter sharding (parallel/fsdp.py) must reproduce the single-device
pipeline."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from photoverse_tpu.core.schedulers import DPMSolverMultistep
from photoverse_tpu.engine.inference import run_inference
from photoverse_tpu.engine.training import (
    TrainConfig,
    init_train_state,
    make_optimizer,
    make_train_step,
)
from photoverse_tpu.parallel.fsdp import fsdp_shardings, fsdp_spec
from photoverse_tpu.parallel.mesh import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from photoverse_tpu.parallel.sp import latent_spatial_sharding, validate_sp
from photoverse_tpu.parallel.tp import (
    MODEL_AXIS,
    bundle_tp_shardings,
    make_mesh_2d,
    tree_tp_shardings,
    unet_tp_shardings,
    unet_tp_spec,
    validate_tp,
)
from tests.tiny_models import LATENT, RES, tiny_batch, tiny_bundle


def _tp_modules(modules):
    """Same modules with the TP-friendly GEGLU formulation enabled
    (parameter-tree identical, so the original params bundle is reused)."""
    cfg = dataclasses.replace(modules.unet.config, tp_friendly_ffn=True)
    return dataclasses.replace(
        modules, unet=type(modules.unet)(cfg, dtype=modules.unet.dtype)
    )


def test_tp_spec_rules():
    modules, params = tiny_bundle(lora_rank=2)
    mesh = make_mesh_2d(4, 2)
    sh = unet_tp_shardings(mesh, params.unet)

    def spec(*path):
        node = sh
        for p in path:
            node = node[p]
        return node.spec

    P = jax.sharding.PartitionSpec
    # column-parallel: out features sharded
    assert spec("down_0_attn_0", "attn1", "to_q", "kernel") == P(None, MODEL_AXIS)
    assert spec("down_0_attn_0", "attn2", "to_q", "base", "kernel") == P(
        None, MODEL_AXIS
    )
    assert spec("mid_attn", "attn2", "to_k_ip", "kernel") == P(None, MODEL_AXIS)
    assert spec("mid_attn", "attn2", "to_q", "lora_B") == P(None, MODEL_AXIS)
    assert spec("mid_attn", "attn2", "to_q", "lora_A") == P()
    assert spec("up_1_attn_0", "ff_proj", "kernel") == P(None, MODEL_AXIS)
    assert spec("up_1_attn_0", "ff_proj", "bias") == P(MODEL_AXIS)
    # row-parallel: in features sharded, bias replicated
    assert spec("down_0_attn_0", "attn1", "to_out", "kernel") == P(MODEL_AXIS, None)
    assert spec("down_0_attn_0", "attn2", "to_out", "kernel") == P(MODEL_AXIS, None)
    assert spec("up_1_attn_0", "ff_out", "kernel") == P(MODEL_AXIS, None)
    assert spec("up_1_attn_0", "ff_out", "bias") == P()
    # everything else replicated
    assert spec("down_0_res_0", "conv1", "kernel") == P()
    assert spec("conv_in", "kernel") == P()
    # the VAE reuses `to_q` names but is outside the UNet scope
    full = bundle_tp_shardings(mesh, params)
    assert all(s.spec == P() for s in jax.tree.leaves(full.vae))


def test_validate_tp_and_sp():
    modules, _ = tiny_bundle()
    cfg = modules.unet.config  # num_heads=2
    validate_tp(cfg, 2)
    with pytest.raises(ValueError):
        validate_tp(cfg, 3)
    with pytest.raises(ValueError):
        validate_tp(dataclasses.replace(cfg, use_flash_attention=True), 2)
    validate_sp(cfg, LATENT, 4)  # deepest height 16/2 = 8
    with pytest.raises(ValueError):
        validate_sp(cfg, LATENT, 16)


def test_geglu_weight_split_matches_fused():
    """UNetConfig.tp_friendly_ffn is a pure reformulation: same params,
    same outputs (each GEGLU output column is an independent dot)."""
    modules, params = tiny_bundle()
    modules_tp = _tp_modules(modules)
    x = jnp.asarray(np.random.RandomState(0).randn(2, LATENT, LATENT, 4), jnp.float32)
    t = jnp.array([5, 9], jnp.int32)
    text = jnp.asarray(np.random.RandomState(1).randn(2, 12, 16), jnp.float32)
    idc = jnp.asarray(np.random.RandomState(2).randn(2, 5, 16), jnp.float32)
    eps_a, _ = modules.unet.apply({"params": params.unet}, x, t, text, idc)
    eps_b, _ = modules_tp.unet.apply({"params": params.unet}, x, t, text, idc)
    np.testing.assert_allclose(np.asarray(eps_a), np.asarray(eps_b), atol=1e-5)


def _gen_fn(modules, solver, latent_sharding=None):
    def gen(params, ex, uncond, key):
        return run_inference(
            modules, params, solver, ex, key,
            guidance_scale=3.0, token_index=0, latent_size=LATENT,
            uncond_input_ids=uncond, latent_sharding=latent_sharding,
        )

    return gen


def test_tp_inference_matches_single_device():
    """Batched CFG inference with the UNet Megatron-sharded over a 2x2
    (data x model) mesh must equal the unsharded result."""
    modules, params = tiny_bundle()
    solver = DPMSolverMultistep.create(modules.schedule, 3)
    B = 2
    example = {k: jnp.asarray(v) for k, v in tiny_batch(B=B, seed=0).items()}
    uncond = jnp.zeros((B, 12), jnp.int32)
    key = jax.random.PRNGKey(0)
    ref = _gen_fn(modules, solver)(params, example, uncond, key)

    modules_tp = _tp_modules(modules)
    validate_tp(modules_tp.unet.config, 2)
    mesh = make_mesh_2d(2, 2)
    repl = replicated(mesh)
    bs = batch_sharding(mesh)
    psh = bundle_tp_shardings(mesh, params)
    params_tp = jax.tree.map(jax.device_put, params, psh)
    ex_s = shard_batch(mesh, example)
    jgen = jax.jit(
        _gen_fn(modules_tp, solver),
        in_shardings=(psh, {k: bs for k in example}, bs, repl),
        out_shardings=bs,
    )
    out = jgen(params_tp, ex_s, jax.device_put(uncond, bs), key)
    assert out.shape == (B, RES, RES, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_sp_inference_matches_single_device():
    """Spatially-sharded (patch-parallel) inference over a 2x4 mesh must
    equal the unsharded result — GSPMD halo exchange + gathered-KV attention
    only change placement."""
    modules, params = tiny_bundle()
    solver = DPMSolverMultistep.create(modules.schedule, 3)
    B = 2
    example = {k: jnp.asarray(v) for k, v in tiny_batch(B=B, seed=1).items()}
    uncond = jnp.zeros((B, 12), jnp.int32)
    key = jax.random.PRNGKey(3)
    ref = _gen_fn(modules, solver)(params, example, uncond, key)

    validate_sp(modules.unet.config, LATENT, 4)
    mesh = make_mesh_2d(2, 4)
    repl = replicated(mesh)
    bs = batch_sharding(mesh)
    lsh = latent_spatial_sharding(mesh)
    params_r = jax.device_put(params, repl)
    ex_s = shard_batch(mesh, example)
    jgen = jax.jit(
        _gen_fn(modules, solver, latent_sharding=lsh),
        in_shardings=(repl, {k: bs for k in example}, bs, repl),
        out_shardings=lsh,
    )
    out = jgen(params_r, ex_s, jax.device_put(uncond, bs), key)
    assert out.shape == (B, RES, RES, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_tp_train_step_matches_single_device():
    """One optimizer step with TP-sharded trainable/frozen/opt-state trees
    (2 data x 2 model) reproduces the replicated step's loss and params."""
    modules, params = tiny_bundle(lora_rank=4)
    cfg = TrainConfig(max_train_steps=5, lr_warmup_steps=1, learning_rate=1e-3)
    tx, _ = make_optimizer(cfg)
    trainable, frozen, opt_state = init_train_state(modules, params, tx)
    batch = tiny_batch(B=4, seed=3)
    key = jax.random.PRNGKey(0)
    step = jax.jit(make_train_step(modules, cfg, tx, latent_size=LATENT))
    ref_trainable, _, ref_metrics = step(trainable, frozen, opt_state, batch, key)

    modules_tp = _tp_modules(modules)
    mesh = make_mesh_2d(2, 2)
    t_sh = tree_tp_shardings(mesh, trainable)
    f_sh = tree_tp_shardings(mesh, frozen)
    o_sh = tree_tp_shardings(mesh, opt_state)
    repl = replicated(mesh)
    t_s = jax.tree.map(jax.device_put, trainable, t_sh)
    f_s = jax.tree.map(jax.device_put, frozen, f_sh)
    o_s = jax.tree.map(jax.device_put, opt_state, o_sh)
    batch_s = shard_batch(mesh, batch)
    jstep = jax.jit(
        make_train_step(modules_tp, cfg, tx, latent_size=LATENT),
        in_shardings=(t_sh, f_sh, o_sh, batch_sharding(mesh), repl),
        out_shardings=(t_sh, o_sh, repl),
    )
    new_t, _, metrics = jstep(t_s, f_s, o_s, batch_s, key)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
    )
    flat_ref = jax.tree.leaves(ref_trainable)
    flat_new = jax.tree.leaves(jax.device_get(new_t))
    for a, b in zip(flat_ref, flat_new):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_fsdp_spec_rules():
    """FSDP shards the largest free dim over the data axis, skips small
    leaves, never double-shards, and preserves TP base specs."""
    P = jax.sharding.PartitionSpec
    # largest dim sharded (conv kernel: the 512-channel axes, first wins)
    assert fsdp_spec((3, 3, 512, 512), 8) == P(None, None, DATA_AXIS)
    # leading dim when it is the largest
    assert fsdp_spec((4096, 320), 8) == P(DATA_AXIS)
    # below min_size -> replicated
    assert fsdp_spec((768,), 8) == P()
    assert fsdp_spec((16, 16), 8, min_size=8) == P(DATA_AXIS)
    # non-divisible dims are skipped (falls through to the next largest)
    assert fsdp_spec((770, 768), 8) == P(None, DATA_AXIS)
    # nothing divisible -> base unchanged
    assert fsdp_spec((7, 9), 8, min_size=1) == P()
    # TP base preserved; FSDP takes a free dim
    base = P(None, MODEL_AXIS)
    assert fsdp_spec((320, 2560), 8, base) == P(DATA_AXIS, MODEL_AXIS)
    # base already on the data axis -> untouched
    assert fsdp_spec((512, 512), 8, P(DATA_AXIS)) == P(DATA_AXIS)
    # scalars/empty shapes -> base
    assert fsdp_spec((), 8) == P()


def test_fsdp_train_step_matches_single_device():
    """One optimizer step with EVERYTHING (frozen backbone, trainables,
    optimizer state) ZeRO-3-sharded over an 8-device data mesh reproduces
    the replicated step bit-for-bit shape-wise and numerically."""
    modules, params = tiny_bundle(lora_rank=4)
    cfg = TrainConfig(max_train_steps=5, lr_warmup_steps=1, learning_rate=1e-3)
    tx, _ = make_optimizer(cfg)
    trainable, frozen, opt_state = init_train_state(modules, params, tx)
    batch = tiny_batch(B=8, seed=5)
    key = jax.random.PRNGKey(1)
    step = jax.jit(make_train_step(modules, cfg, tx, latent_size=LATENT))
    ref_trainable, _, ref_metrics = step(trainable, frozen, opt_state, batch, key)

    mesh = make_mesh(8)
    t_sh = fsdp_shardings(mesh, trainable, min_size=8)
    f_sh = fsdp_shardings(mesh, frozen, min_size=8)
    o_sh = fsdp_shardings(mesh, opt_state, min_size=8)
    # the tiny model must actually shard something for this to test FSDP
    n_sharded = sum(
        s.spec != jax.sharding.PartitionSpec() for s in jax.tree.leaves(f_sh)
    )
    assert n_sharded > 10
    repl = replicated(mesh)
    t_s = jax.tree.map(jax.device_put, trainable, t_sh)
    f_s = jax.tree.map(jax.device_put, frozen, f_sh)
    o_s = jax.tree.map(jax.device_put, opt_state, o_sh)
    batch_s = shard_batch(mesh, batch)
    jstep = jax.jit(
        make_train_step(modules, cfg, tx, latent_size=LATENT),
        in_shardings=(t_sh, f_sh, o_sh, batch_sharding(mesh), repl),
        out_shardings=(t_sh, o_sh, repl),
    )
    new_t, _, metrics = jstep(t_s, f_s, o_s, batch_s, key)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree.leaves(ref_trainable), jax.tree.leaves(jax.device_get(new_t))
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_fsdp_tp_combined_train_step_matches():
    """FSDP over the data axis composed with tensor parallelism over the
    model axis (2 x 2 mesh, 2-D-sharded weights where both apply)."""
    modules, params = tiny_bundle(lora_rank=4)
    cfg = TrainConfig(max_train_steps=5, lr_warmup_steps=1, learning_rate=1e-3)
    tx, _ = make_optimizer(cfg)
    trainable, frozen, opt_state = init_train_state(modules, params, tx)
    batch = tiny_batch(B=4, seed=7)
    key = jax.random.PRNGKey(2)
    step = jax.jit(make_train_step(modules, cfg, tx, latent_size=LATENT))
    ref_trainable, _, ref_metrics = step(trainable, frozen, opt_state, batch, key)

    modules_tp = _tp_modules(modules)
    mesh = make_mesh_2d(2, 2)
    t_sh = fsdp_shardings(mesh, trainable, base=tree_tp_shardings(mesh, trainable), min_size=8)
    f_sh = fsdp_shardings(mesh, frozen, base=tree_tp_shardings(mesh, frozen), min_size=8)
    o_sh = fsdp_shardings(mesh, opt_state, base=tree_tp_shardings(mesh, opt_state), min_size=8)
    # composition must produce at least one 2-D-sharded weight
    P = jax.sharding.PartitionSpec
    two_d = [
        s.spec
        for s in jax.tree.leaves(t_sh)
        if DATA_AXIS in tuple(s.spec) and MODEL_AXIS in tuple(s.spec)
    ]
    assert two_d, "expected FSDP x TP 2-D-sharded leaves"
    repl = replicated(mesh)
    t_s = jax.tree.map(jax.device_put, trainable, t_sh)
    f_s = jax.tree.map(jax.device_put, frozen, f_sh)
    o_s = jax.tree.map(jax.device_put, opt_state, o_sh)
    batch_s = shard_batch(mesh, batch)
    jstep = jax.jit(
        make_train_step(modules_tp, cfg, tx, latent_size=LATENT),
        in_shardings=(t_sh, f_sh, o_sh, batch_sharding(mesh), repl),
        out_shardings=(t_sh, o_sh, repl),
    )
    new_t, _, metrics = jstep(t_s, f_s, o_s, batch_s, key)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree.leaves(ref_trainable), jax.tree.leaves(jax.device_get(new_t))
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
