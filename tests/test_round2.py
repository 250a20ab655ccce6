"""Round-2 feature tests: .pt export round-trip, grad-step stochastic
fusion, clip-inside-accumulation ordering, multi-host batch slicing,
async checkpointing, hub helpers, CLI flag validation."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from photoverse_tpu.ckpt.checkpoint import (
    AsyncCheckpointer,
    combine_params,
    load_photoverse_checkpoint,
    partition_params,
    save_progress,
    save_progress_pt,
)
from photoverse_tpu.core.schedulers import DPMSolverMultistep
from photoverse_tpu.engine.inference import denoise, encode_condition
from photoverse_tpu.engine.training import clip_groups, clip_groups_tx
from tests.tiny_models import LATENT, tiny_batch, tiny_bundle


# ---------------------------------------------------------------------------
# reference-format .pt export
# ---------------------------------------------------------------------------


def test_pt_export_round_trip(tmp_path):
    """save_progress_pt writes the reference key scheme
    (modeling_utils.py:29-50) and load_photoverse_checkpoint restores the
    exact trainable partition."""
    import torch

    modules, params = tiny_bundle(lora_rank=4, seed=11)
    lora_cfg = {"r": 4, "lora_alpha": 1, "lora_dropout": 0.1}
    path = save_progress_pt(str(tmp_path), params, step=7, lora_config=lora_cfg)
    assert path.endswith("photoverse_000007.pt")

    state = torch.load(path, map_location="cpu", weights_only=False)
    assert set(state) == {
        "image_adapter", "text_adapter", "cross_attention_adapter", "lora_config"
    }
    # reference save filter: every cross-attn key contains attn2 and one of
    # processor|to_q|to_k|to_v (modeling_utils.py:33-38)
    for k in state["cross_attention_adapter"]:
        assert "attn2" in k
        assert any(s in k for s in ("processor", "to_q", "to_k", "to_v"))
    # peft naming present for LoRA-wrapped projections
    assert any(".lora_A.default.weight" in k for k in state["cross_attention_adapter"])
    assert any(".base_layer.weight" in k for k in state["cross_attention_adapter"])
    assert any(
        k.endswith("processor.to_k_ip.0.weight")
        for k in state["cross_attention_adapter"]
    )
    # adapter keys follow the nn.Sequential layout mapping_{i}.{0,1,3,4,6}
    assert "mapping_0.0.weight" in state["image_adapter"]
    assert "mapping_patch_4.6.bias" in state["text_adapter"]

    # round-trip: load into a differently-initialized bundle
    _, params2 = tiny_bundle(lora_rank=4, seed=99)
    restored, lora_loaded = load_photoverse_checkpoint(path, modules, params2)
    assert lora_loaded == lora_cfg
    want, _ = partition_params(params)
    got, _ = partition_params(restored)
    assert set(want) == set(got)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(want[k]), np.asarray(got[k]), atol=1e-6, err_msg=str(k)
        )


def test_pt_export_no_lora_uses_plain_keys(tmp_path):
    import torch

    modules, params = tiny_bundle(lora_rank=0, seed=3)
    path = save_progress_pt(str(tmp_path), params)
    state = torch.load(path, map_location="cpu", weights_only=False)
    assert "lora_config" not in state
    keys = state["cross_attention_adapter"]
    assert not any("lora" in k or "base_layer" in k for k in keys)
    assert any(k.endswith("attn2.to_q.weight") for k in keys)


# ---------------------------------------------------------------------------
# grad-step stochastic fusion (reference attention_processor.py:410-420)
# ---------------------------------------------------------------------------


def _denoise_setup(seed=0):
    modules, params = tiny_bundle(seed=5)
    solver = DPMSolverMultistep.create(modules.schedule, 3)
    batch = {k: jnp.asarray(v) for k, v in tiny_batch(B=1, seed=seed).items()}
    concept, id_ctx = encode_condition(
        modules, params, batch["pixel_values_clip"], token_index=0
    )
    text_ctx, _ = modules.text_encoder.apply(
        {"params": params.text_encoder},
        batch["text_input_ids"],
        concept,
        batch["concept_placeholder_idx"].reshape(-1),
    )
    latents = jax.random.normal(jax.random.PRNGKey(1), (1, LATENT, LATENT, 4))
    return modules, params, solver, latents, text_ctx, id_ctx


def test_grad_step_stochastic_fusion_branches():
    """With train=True the trailing grad step draws the stochastic fusion
    branch from fusion_rng: different keys must produce different outputs
    (the no-grad prefix and eval mode are key-independent)."""
    modules, params, solver, latents, text_ctx, id_ctx = _denoise_setup()

    def run(key, train):
        return denoise(
            modules, params, solver, latents, text_ctx, id_ctx, None, None,
            guidance_scale=1.0, num_grad_steps=1,
            train=train, fusion_rng=jax.random.PRNGKey(key),
        )

    outs = [np.asarray(run(k, True)) for k in range(6)]
    # same key -> deterministic
    np.testing.assert_allclose(outs[0], np.asarray(run(0, True)), atol=1e-6)
    # across keys the sampled branch (2*text | 2*id | sum) varies
    distinct = {outs[0].tobytes()}
    for o in outs[1:]:
        distinct.add(o.tobytes())
    assert len(distinct) >= 2, "fusion branch never varied across keys"
    # eval mode ignores the key entirely (deterministic sum fusion)
    np.testing.assert_allclose(
        np.asarray(run(0, False)), np.asarray(run(1, False)), atol=1e-6
    )


def test_grad_step_train_mode_carries_gradient():
    """Gradients must flow through the stochastic-fusion trailing step into
    the identity projections."""
    modules, params, solver, latents, text_ctx, id_ctx = _denoise_setup(seed=2)
    trainable, frozen = partition_params(params)

    def loss(tr):
        p = combine_params(tr, frozen)
        out = denoise(
            modules, p, solver, latents, text_ctx, id_ctx, None, None,
            guidance_scale=1.0, num_grad_steps=1,
            train=True, fusion_rng=jax.random.PRNGKey(4),
        )
        return jnp.mean(jnp.square(out))

    grads = jax.grad(loss)(trainable)
    gnorm = sum(
        float(jnp.sum(jnp.abs(v))) for k, v in grads.items() if "to_v_ip" in k
    )
    assert np.isfinite(gnorm)


# ---------------------------------------------------------------------------
# gradient clipping inside the accumulation boundary
# ---------------------------------------------------------------------------


def test_clip_groups_tx_matches_clip_groups():
    g = {
        ("unet", "a"): jnp.asarray([3.0, 4.0]),
        ("text_adapter", "b"): jnp.asarray([0.1]),
    }
    tx = clip_groups_tx(1.0)
    state = tx.init(g)
    out, _ = tx.update(g, state)
    want = clip_groups(g, 1.0)
    for k in g:
        np.testing.assert_allclose(np.asarray(out[k]), np.asarray(want[k]))


def test_clipping_applies_to_accumulated_gradient():
    """Inside MultiSteps, clipping acts on the ACCUMULATED (mean) gradient at
    the sync boundary (reference clips under sync_gradients,
    train.py:540-544) — distinguishable from per-micro-batch clipping."""
    tx = optax.MultiSteps(
        optax.chain(clip_groups_tx(1.0), optax.scale(-1.0)), 2
    )
    g_big = {("unet", "w"): jnp.asarray([30.0, 40.0])}  # norm 50
    g_zero = {("unet", "w"): jnp.asarray([0.0, 0.0])}
    params = {("unet", "w"): jnp.zeros(2)}
    state = tx.init(params)
    up1, state = tx.update(g_big, state, params)
    np.testing.assert_allclose(np.asarray(up1[("unet", "w")]), 0.0)  # mid-accum
    up2, state = tx.update(g_zero, state, params)
    # accumulated mean = [15, 20] (norm 25) -> clipped to unit norm [0.6, 0.8]
    # per-micro clipping would instead give mean(clip(big), clip(0)) = [0.3, 0.4]
    np.testing.assert_allclose(
        np.asarray(up2[("unet", "w")]), [-0.6, -0.8], atol=1e-6
    )


# ---------------------------------------------------------------------------
# multi-host batch slicing
# ---------------------------------------------------------------------------


def test_batchloader_host_slices_tile_global_batch(tmp_path):
    from PIL import Image

    from photoverse_tpu.data.dataset import BatchLoader, CustomDataset
    from tests.test_data import _tiny_tokenizer

    tok = _tiny_tokenizer(tmp_path / "sd")
    ds_dir = tmp_path / "ds" / "images"
    ds_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(8):
        Image.fromarray((rng.rand(24, 24, 3) * 255).astype(np.uint8)).save(
            ds_dir / f"{i}.jpg"
        )
    mk = lambda: CustomDataset(
        str(tmp_path / "ds"), tok, size=24, clip_size=16, seed=0
    )
    full = list(BatchLoader(mk(), 4, seed=7, num_workers=1))
    h0 = list(BatchLoader(mk(), 4, seed=7, num_workers=1, host_slice=slice(0, 2)))
    h1 = list(BatchLoader(mk(), 4, seed=7, num_workers=1, host_slice=slice(2, 4)))
    assert len(full) == len(h0) == len(h1) == 2
    for f, a, b in zip(full, h0, h1):
        np.testing.assert_allclose(
            f["pixel_values"], np.concatenate([a["pixel_values"], b["pixel_values"]])
        )
        np.testing.assert_array_equal(
            f["text_input_ids"],
            np.concatenate([a["text_input_ids"], b["text_input_ids"]]),
        )


# ---------------------------------------------------------------------------
# async checkpointing
# ---------------------------------------------------------------------------


def test_async_checkpointer_round_trip(tmp_path):
    modules, params = tiny_bundle(seed=21)
    ck = AsyncCheckpointer()
    ck.submit(save_progress, str(tmp_path), params, step=5, lora_config={"r": 2})
    ck.wait()
    assert (tmp_path / "photoverse_000005.msgpack").exists()
    _, params2 = tiny_bundle(seed=22)
    restored, lora = load_photoverse_checkpoint(
        str(tmp_path / "photoverse_000005.msgpack"), modules, params2
    )
    assert lora == {"r": 2}
    want, _ = partition_params(params)
    got, _ = partition_params(restored)
    for k in want:
        np.testing.assert_allclose(np.asarray(want[k]), np.asarray(got[k]))
    ck.close()


def test_async_checkpointer_surfaces_errors(tmp_path):
    ck = AsyncCheckpointer()

    def boom():
        raise RuntimeError("disk full")

    ck.submit(boom)
    with pytest.raises(RuntimeError, match="disk full"):
        ck.wait()
    ck.close()


# ---------------------------------------------------------------------------
# hub helpers + CLI validation
# ---------------------------------------------------------------------------


def test_hub_helpers_degrade_offline():
    from photoverse_tpu.utils.hub import create_hub_repo, push_to_hub

    assert create_hub_repo("nobody/nothing", token="invalid") is False
    assert push_to_hub("/nonexistent", "nobody/nothing", token="invalid") is False


def test_train_cli_fp16_raises():
    from photoverse_tpu.cli.train import main

    with pytest.raises(ValueError, match="fp16"):
        main([
            "--data_root_path", "/nonexistent",
            "--mixed_precision", "fp16",
            "--cpu",
        ])


def test_train_cli_face_loss_requires_weights(tmp_path):
    from photoverse_tpu.cli.train import main

    # reaches the face-loss validation only after model load, so give it a
    # real tiny checkpoint
    from tests.test_cli_e2e import _make_checkpoint

    root = _make_checkpoint(tmp_path)
    with pytest.raises(ValueError, match="face_model_weights"):
        main([
            "--pretrained_model_name_or_path", str(root),
            "--data_root_path", str(tmp_path),
            "--face_loss", "arcface",
            "--image_encoder_layers_idx", "1", "2", "3", "4",
            "--cpu",
        ])


def test_train_cli_kill_and_resume(tmp_path):
    """Preemption recovery e2e: train 2 steps, then resume from the step-2
    checkpoint and continue to step 4 — metrics must show steps 3 and 4 with
    the restored optimizer state (no step counter reset)."""
    import json as _json

    import numpy as np
    from PIL import Image

    from tests.test_cli_e2e import _make_checkpoint
    from photoverse_tpu.cli.train import main

    root = _make_checkpoint(tmp_path)
    data_root = tmp_path / "ds"
    (data_root / "images").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8)).save(
            data_root / "images" / f"{i}.jpg"
        )
    out_dir = tmp_path / "run"
    common = [
        "--pretrained_model_name_or_path", str(root),
        "--data_root_path", str(data_root),
        "--output_dir", str(out_dir),
        "--resolution", "32", "--train_batch_size", "2",
        "--checkpoint_save_steps", "2", "--samples_save_steps", "1000",
        "--image_encoder_layers_idx", "1", "2", "3", "4",
        "--dataloader_num_workers", "1", "--seed", "0", "--cpu",
    ]
    main(common + ["--max_train_steps", "2"])
    ckpt = out_dir / "photoverse_000002.msgpack"
    assert ckpt.exists()
    main(common + ["--max_train_steps", "4", "--resume_from", str(ckpt)])
    steps = [
        _json.loads(line)["step"]
        for line in (out_dir / "metrics.jsonl").read_text().strip().splitlines()
    ]
    assert 3 in steps and 4 in steps, steps
    assert max(steps) == 4
