"""End-to-end engine tests at tiny scale (CPU): inference, training step,
checkpoint round-trip, data-parallel sharding."""

import jax
import jax.numpy as jnp
import numpy as np

from photoverse_tpu.ckpt.checkpoint import (
    combine_params,
    partition_params,
    save_progress,
)
from photoverse_tpu.core.schedulers import DPMSolverMultistep
from photoverse_tpu.engine.inference import run_inference
from photoverse_tpu.engine.training import (
    TrainConfig,
    init_train_state,
    make_optimizer,
    make_train_step,
)
from tests.tiny_models import LATENT, RES, tiny_batch, tiny_bundle


def test_run_inference_shapes_and_determinism():
    modules, params = tiny_bundle()
    solver = DPMSolverMultistep.create(modules.schedule, 5)
    example = {k: jnp.asarray(v) for k, v in tiny_batch(B=2).items()}
    img1 = run_inference(
        modules, params, solver, example, jax.random.PRNGKey(0),
        guidance_scale=1.0, token_index=0, latent_size=LATENT,
    )
    assert img1.shape == (2, RES, RES, 3)
    assert np.all(np.isfinite(np.asarray(img1)))
    assert np.asarray(img1).min() >= -1.0 and np.asarray(img1).max() <= 1.0
    img2 = run_inference(
        modules, params, solver, example, jax.random.PRNGKey(0),
        guidance_scale=1.0, token_index=0, latent_size=LATENT,
    )
    np.testing.assert_allclose(np.asarray(img1), np.asarray(img2), atol=1e-6)


def test_run_inference_cfg_and_negative_prompt():
    modules, params = tiny_bundle()
    solver = DPMSolverMultistep.create(modules.schedule, 4)
    example = {k: jnp.asarray(v) for k, v in tiny_batch(B=1, seed=1).items()}
    uncond = jnp.zeros((1, 12), jnp.int32)
    img_cfg = run_inference(
        modules, params, solver, example, jax.random.PRNGKey(0),
        guidance_scale=6.0, token_index=0, latent_size=LATENT,
        uncond_input_ids=uncond,
    )
    img_nocfg = run_inference(
        modules, params, solver, example, jax.random.PRNGKey(0),
        guidance_scale=1.0, token_index=0, latent_size=LATENT,
    )
    assert not np.allclose(np.asarray(img_cfg), np.asarray(img_nocfg))


def test_from_noised_image_path():
    modules, params = tiny_bundle()
    solver = DPMSolverMultistep.create(modules.schedule, 3)
    example = {k: jnp.asarray(v) for k, v in tiny_batch(B=1, seed=2).items()}
    img = run_inference(
        modules, params, solver, example, jax.random.PRNGKey(0),
        guidance_scale=1.0, token_index=0, latent_size=LATENT,
        from_noised_image=True,
    )
    assert img.shape == (1, RES, RES, 3)
    assert np.all(np.isfinite(np.asarray(img)))


def test_train_step_updates_only_trainable():
    modules, params = tiny_bundle(lora_rank=4)
    cfg = TrainConfig(max_train_steps=5, lr_warmup_steps=1, learning_rate=1e-3)
    tx, _ = make_optimizer(cfg)
    trainable, frozen, opt_state = init_train_state(modules, params, tx)
    step = jax.jit(make_train_step(modules, cfg, tx, latent_size=LATENT))
    batch = tiny_batch(B=2, seed=3)
    new_trainable, new_opt, metrics = step(
        trainable, frozen, opt_state, batch, jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss_mle"]) > 0
    # every trainable leaf that received gradient should move; spot-check a few
    moved = [
        not np.allclose(np.asarray(new_trainable[k]), np.asarray(trainable[k]))
        for k in list(trainable)[:10]
    ]
    assert any(moved)
    # frozen partition untouched by construction (same objects)
    tkeys = set(trainable)
    assert all(k not in tkeys for k in frozen)
    # LoRA params are in the trainable set
    assert any("lora_A" in k for k in tkeys)
    assert any(k[0] == "text_adapter" for k in tkeys)


def test_train_loss_decreases_on_fixed_batch():
    modules, params = tiny_bundle()
    cfg = TrainConfig(max_train_steps=30, lr_warmup_steps=0, learning_rate=3e-3)
    tx, _ = make_optimizer(cfg)
    trainable, frozen, opt_state = init_train_state(modules, params, tx)
    step = jax.jit(make_train_step(modules, cfg, tx, latent_size=LATENT))
    batch = tiny_batch(B=2, seed=4)
    losses = []
    for i in range(12):
        trainable, opt_state, metrics = step(
            trainable, frozen, opt_state, batch, jax.random.PRNGKey(7)
        )
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_checkpoint_roundtrip(tmp_path):
    from photoverse_tpu.ckpt.checkpoint import load_photoverse_checkpoint

    modules, params = tiny_bundle(lora_rank=4, seed=1)
    trainable, frozen = partition_params(params)
    # mutate trainable to distinguish from init
    trainable = {k: v + 0.5 for k, v in trainable.items()}
    params_mut = combine_params(trainable, frozen)
    path = save_progress(str(tmp_path), params_mut, step=42, lora_config={"r": 4})
    assert path.endswith("photoverse_000042.msgpack")

    _, params_fresh = tiny_bundle(lora_rank=4, seed=2)
    loaded, lora = load_photoverse_checkpoint(path, modules, params_fresh)
    assert lora == {"r": 4}
    t_loaded, _ = partition_params(loaded)
    for k in trainable:
        np.testing.assert_allclose(
            np.asarray(t_loaded[k]), np.asarray(trainable[k]), atol=1e-6
        )


def test_torch_pt_checkpoint_loads():
    """Reference .pt checkpoint format round-trips into our trees
    (modeling_utils.py:29-50 key scheme)."""
    import torch

    from photoverse_tpu.ckpt.checkpoint import load_photoverse_checkpoint
    from tests.test_adapters import _torch_ref_adapter

    modules, params = tiny_bundle(lora_rank=0)
    torch.manual_seed(0)
    ta = _torch_ref_adapter(clip_dim=16, cross_dim=16, num_tokens=5)
    ia = _torch_ref_adapter(clip_dim=16, cross_dim=16, num_tokens=5)
    # cross_attention_adapter with one ip projection key for the mid block
    w = torch.randn(32, 16)
    state = {
        "image_adapter": ia.state_dict(),
        "text_adapter": ta.state_dict(),
        "cross_attention_adapter": {
            "mid_block.attentions.0.transformer_blocks.0.attn2.processor.to_k_ip.0.weight": w,
        },
    }
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "photoverse_000001.pt")
        torch.save(state, p)
        loaded, lora = load_photoverse_checkpoint(p, modules, params)
    assert lora is None
    np.testing.assert_allclose(
        np.asarray(loaded.unet["mid_attn"]["attn2"]["to_k_ip"]["kernel"]),
        w.numpy().T,
        atol=1e-6,
    )
    # adapter weights landed
    np.testing.assert_allclose(
        np.asarray(loaded.text_adapter["mapping"]["fc0_b"][0]),
        ta.state_dict()["mapping_0.0.bias"].numpy(),
        atol=1e-6,
    )


def test_load_progress_full_resume(tmp_path):
    """load_progress restores weights + optimizer state + step (beyond the
    reference, which restores weights only — SURVEY.md §5.4)."""
    from photoverse_tpu.ckpt.checkpoint import load_progress

    modules, params = tiny_bundle(lora_rank=2, seed=5)
    cfg = TrainConfig(max_train_steps=10, lr_warmup_steps=0, learning_rate=1e-3)
    tx, _ = make_optimizer(cfg)
    trainable, frozen, opt_state = init_train_state(modules, params, tx)
    step = jax.jit(make_train_step(modules, cfg, tx, latent_size=LATENT))
    batch = tiny_batch(B=2, seed=6)
    for i in range(2):
        trainable, opt_state, _ = step(
            trainable, frozen, opt_state, batch, jax.random.PRNGKey(i)
        )
    path = save_progress(
        str(tmp_path), combine_params(trainable, frozen), step=2,
        opt_state=opt_state,
    )

    _, params_fresh = tiny_bundle(lora_rank=2, seed=9)
    t_fresh, f_fresh, opt_fresh = init_train_state(modules, params_fresh, tx)
    restored, opt_restored, start = load_progress(
        path, combine_params(t_fresh, f_fresh), opt_fresh
    )
    assert start == 2
    t_rest, _ = partition_params(restored)
    for k in trainable:
        np.testing.assert_allclose(
            np.asarray(t_rest[k]), np.asarray(trainable[k]), atol=1e-6
        )
    # adam moments restored (count equals 2 steps)
    leaves_a = jax.tree.leaves(opt_restored)
    leaves_b = jax.tree.leaves(opt_state)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_train_step_with_face_loss():
    """Face-loss path: inner generation with last-step-only grad + cosine
    loss (reference train.py:521-535); gradients must reach the adapters
    through the face branch."""
    import jax.numpy as jnp

    from photoverse_tpu.models.arcface import ArcFaceConfig, ArcFaceResNet18
    from photoverse_tpu.models.face_loss import FaceLoss

    modules, params = tiny_bundle(seed=7)
    acfg = ArcFaceConfig(input_size=32)
    amodel = ArcFaceResNet18(acfg)
    aparams = amodel.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 1)))["params"]
    floss = FaceLoss("arcface", aparams)
    floss.model = amodel

    def face_loss_fn(_params, x, gen):
        return floss(x, gen, maximize=True, normalize=False)

    solver = DPMSolverMultistep.create(modules.schedule, 3)
    cfg = TrainConfig(max_train_steps=5, lr_warmup_steps=0, learning_rate=1e-3,
                      face_loss_guidance=2.0)
    tx, _ = make_optimizer(cfg)
    trainable, frozen, opt_state = init_train_state(modules, params, tx)
    step = jax.jit(make_train_step(
        modules, cfg, tx, face_loss_fn=face_loss_fn, face_solver=solver,
        latent_size=LATENT,
    ))
    batch = tiny_batch(B=2, seed=8)
    batch["face_pixel_values"] = batch["pixel_values"][:1]
    batch["face_pixel_values_clip"] = batch["pixel_values_clip"][:1]
    batch["face_text_input_ids"] = batch["text_input_ids"][:1]
    batch["face_concept_placeholder_idx"] = batch["concept_placeholder_idx"][:1]
    batch["face_uncond_input_ids"] = np.zeros((1, 12), np.int32)
    new_trainable, _, metrics = step(
        trainable, frozen, opt_state, batch, jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss_face"]))
    assert float(metrics["loss_face"]) != 0.0
    moved = [
        not np.allclose(np.asarray(new_trainable[k]), np.asarray(trainable[k]))
        for k in list(trainable)[:8]
    ]
    assert any(moved)
