"""End-to-end CLI test: build a tiny diffusers-layout SD checkpoint on disk
(torch state dicts + config.json files + tokenizer vocab), then run the
generate CLI through load_models -> converters -> inference -> PNGs.

This is BASELINE.md benchmark config 1 ("CPU-runnable generate") at toy
scale, exercising the same code path as a real SD-1.5 directory.
"""

import json
import os

import numpy as np
import pytest
import torch
from PIL import Image

from tests.test_data import _tiny_tokenizer
from tests.torch_ref_unet import RefUNet
from tests.torch_ref_vae import RefVAE

# e2e CLI drives (minutes each): slow tier
pytestmark = pytest.mark.slow


def _make_checkpoint(tmp_path):
    from transformers import CLIPTextConfig as HFTextConfig
    from transformers import CLIPTextModel
    from transformers import CLIPVisionConfig as HFVisionConfig
    from transformers import CLIPVisionModel

    torch.manual_seed(0)
    root = tmp_path / "sd"
    # tokenizer (tiny vocab, max_len 16)
    _tiny_tokenizer(root)

    # text encoder: transformers layout, matching the tokenizer's vocab size
    tok_vocab = json.loads((root / "tokenizer" / "vocab.json").read_text())
    text_cfg = HFTextConfig(
        vocab_size=len(tok_vocab), hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=16, hidden_act="quick_gelu",
    )
    text = CLIPTextModel(text_cfg)
    (root / "text_encoder").mkdir()
    torch.save(text.state_dict(), root / "text_encoder" / "pytorch_model.bin")
    (root / "text_encoder" / "config.json").write_text(
        json.dumps({
            "vocab_size": len(tok_vocab), "hidden_size": 16,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "intermediate_size": 32, "max_position_embeddings": 16,
        })
    )

    # vision encoder
    vis_cfg = HFVisionConfig(
        hidden_size=16, num_hidden_layers=4, num_attention_heads=2,
        intermediate_size=32, image_size=16, patch_size=8,
        hidden_act="quick_gelu",
    )
    vision = CLIPVisionModel(vis_cfg)
    (root / "image_encoder").mkdir()
    torch.save(vision.state_dict(), root / "image_encoder" / "pytorch_model.bin")
    (root / "image_encoder" / "config.json").write_text(
        json.dumps({
            "hidden_size": 16, "num_hidden_layers": 4,
            "num_attention_heads": 2, "intermediate_size": 32,
            "image_size": 16, "patch_size": 8,
        })
    )

    # unet: torch replica state dict needs PhotoVerse processor keys absent
    # (load_models seeds them from init) — RefUNet already includes them
    unet = RefUNet(
        block_out_channels=(16, 32), layers_per_block=1, cross_dim=16,
        heads=2, groups=8,
    )
    (root / "unet").mkdir()
    torch.save(unet.state_dict(), root / "unet" / "diffusion_pytorch_model.bin")
    (root / "unet" / "config.json").write_text(
        json.dumps({
            "in_channels": 4, "out_channels": 4,
            "block_out_channels": [16, 32], "layers_per_block": 1,
            "cross_attention_dim": 16, "attention_head_dim": 2,
            "norm_num_groups": 8,
        })
    )

    vae = RefVAE(ch=(16, 32), layers=2, latent=4, groups=8)
    (root / "vae").mkdir()
    torch.save(vae.state_dict(), root / "vae" / "diffusion_pytorch_model.bin")
    (root / "vae" / "config.json").write_text(
        json.dumps({
            "block_out_channels": [16, 32], "layers_per_block": 2,
            "latent_channels": 4, "norm_num_groups": 8,
            "scaling_factor": 0.18215,
        })
    )

    (root / "scheduler").mkdir()
    (root / "scheduler" / "scheduler_config.json").write_text(
        json.dumps({
            "num_train_timesteps": 1000, "beta_start": 0.00085,
            "beta_end": 0.012, "beta_schedule": "scaled_linear",
            "prediction_type": "epsilon", "steps_offset": 1,
        })
    )
    return str(root)


def test_unet_attention_head_dim_interpretation(tmp_path):
    """attention_head_dim in the diffusers config is the HEAD COUNT for
    SD-1.5-style configs; make sure the loader treats it that way."""
    from photoverse_tpu.models.assembly import _configs_from_checkpoint

    root = tmp_path / "sd2"
    (root / "unet").mkdir(parents=True)
    (root / "unet" / "config.json").write_text(
        json.dumps({"attention_head_dim": 8, "block_out_channels": [320, 640]})
    )
    unet_cfg, _, _ = _configs_from_checkpoint(str(root), 0, 1.0, 0.0)
    assert unet_cfg.num_heads == 8
    assert unet_cfg.block_out_channels == (320, 640)


def test_generate_cli_end_to_end(tmp_path):
    """Drive the real CLI main(): load -> convert -> denoise -> save PNGs.
    No photoverse checkpoint (random adapters) — must still produce valid
    images, like the reference CLI with an untrained adapter."""
    root = _make_checkpoint(tmp_path)
    face = tmp_path / "face.jpg"
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(face)

    from photoverse_tpu.cli.generate import main

    results = tmp_path / "out"
    main([
        "--model_path", root,
        "--checkpoint_path", "",
        "--input_image_path", str(face),
        "--results_dir", str(results),
        "--output_image_path", "gen",
        "--num_timesteps", "3",
        "--resolution", "32",
        "--guidance_scale", "2.0",
        "--negative_prompt", "bad photo",
        "--num_of_samples", "2",
        "--text", "a photo of a {}", "the photo of {}",
        "--encoder_layers_idx", "1", "2", "3", "4",
        "--seed", "7",
    ])
    # 2 templates x num_of_samples 2 = 4 images (BASELINE config 2 shape:
    # several prompts x one identity in a single CFG denoise)
    for i in range(4):
        p = results / f"gen{i}.png"
        assert p.exists()
        img = np.asarray(Image.open(p))
        assert img.shape == (32, 32, 3)


def test_generate_cli_bf16_params(tmp_path):
    """--bf16_params (bf16-stored serving weights, the measured +7.6%
    batch-1 knob) must run end-to-end and stay close to the f32-stored
    route: floating leaves cast, integer leaves untouched, pixels within
    the rounding envelope."""
    import jax.numpy as jnp

    from photoverse_tpu.models.assembly import cast_params

    # float16, not float64: conftest pins JAX_ENABLE_X64=0, under which a
    # f64 leaf would silently be created as f32 and re-test the f32 path
    tree = {"w": jnp.ones((2, 2), jnp.float32),
            "ids": jnp.arange(3, dtype=jnp.int32),
            "nested": {"b": jnp.zeros((4,), jnp.float16)}}
    cast = cast_params(tree)
    assert cast["w"].dtype == jnp.bfloat16
    assert cast["ids"].dtype == jnp.int32
    assert cast["nested"]["b"].dtype == jnp.bfloat16

    root = _make_checkpoint(tmp_path)
    face = tmp_path / "face.jpg"
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(face)

    from photoverse_tpu.cli.generate import main

    common = [
        "--model_path", root,
        "--checkpoint_path", "",
        "--input_image_path", str(face),
        "--output_image_path", "gen",
        "--num_timesteps", "3",
        "--resolution", "32",
        "--encoder_layers_idx", "1", "2", "3", "4",
        "--seed", "11",
    ]
    out32 = tmp_path / "out_f32"
    out16 = tmp_path / "out_bf16"
    main(common + ["--results_dir", str(out32)])
    main(common + ["--results_dir", str(out16), "--bf16_params"])
    a = np.asarray(Image.open(out32 / "gen0.png"), dtype=np.float32)
    b = np.asarray(Image.open(out16 / "gen0.png"), dtype=np.float32)
    assert a.shape == b.shape == (32, 32, 3)
    # bf16 weight rounding through a 3-step denoise: small mean drift only
    assert np.mean(np.abs(a - b)) < 12.0, np.mean(np.abs(a - b))


def test_load_models_checkpoint_weights_land(tmp_path):
    """Converted torch weights (not random init) must land in the param
    trees — verify one leaf per model family."""
    root = _make_checkpoint(tmp_path)
    import photoverse_tpu.models.assembly as assembly

    _, modules, params, _ = assembly.load_models(
        root, extra_num_tokens=4, image_encoder_layers_idx=(1, 2, 3, 4)
    )
    text_sd = torch.load(
        os.path.join(root, "text_encoder", "pytorch_model.bin"), weights_only=False
    )
    np.testing.assert_allclose(
        np.asarray(params.text_encoder["token_embedding"]),
        text_sd["text_model.embeddings.token_embedding.weight"].numpy(),
        atol=1e-6,
    )
    unet_sd = torch.load(
        os.path.join(root, "unet", "diffusion_pytorch_model.bin"), weights_only=False
    )
    np.testing.assert_allclose(
        np.asarray(params.unet["conv_in"]["kernel"]),
        unet_sd["conv_in.weight"].numpy().transpose(2, 3, 1, 0),
        atol=1e-6,
    )
    vae_sd = torch.load(
        os.path.join(root, "vae", "diffusion_pytorch_model.bin"), weights_only=False
    )
    np.testing.assert_allclose(
        np.asarray(params.vae["encoder"]["conv_in"]["kernel"]),
        vae_sd["encoder.conv_in.weight"].numpy().transpose(2, 3, 1, 0),
        atol=1e-6,
    )
    # PhotoVerse ip projections came from the torch replica's processor keys
    np.testing.assert_allclose(
        np.asarray(params.unet["mid_attn"]["attn2"]["to_k_ip"]["kernel"]),
        unet_sd[
            "mid_block.attentions.0.transformer_blocks.0.attn2.processor.to_k_ip.0.weight"
        ].numpy().T,
        atol=1e-6,
    )


def test_train_cli_end_to_end(tmp_path):
    """Drive the real training CLI for 3 steps on a tiny checkpoint +
    dataset: verifies data loading, jitted train step over the mesh,
    metric logging, and checkpoint writing (reference train.py flow)."""
    root = _make_checkpoint(tmp_path)
    data_root = tmp_path / "ds"
    (data_root / "images").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8)).save(
            data_root / "images" / f"{i}.jpg"
        )

    from photoverse_tpu.cli.train import main

    out_dir = tmp_path / "run"
    main([
        "--pretrained_model_name_or_path", root,
        "--data_root_path", str(data_root),
        "--output_dir", str(out_dir),
        "--resolution", "32",
        "--train_batch_size", "2",
        "--max_train_steps", "3",
        "--checkpoint_save_steps", "2",
        "--samples_save_steps", "1000",
        "--learning_rate", "1e-4",
        "--use_lora", "--lora_rank", "2",
        "--image_encoder_layers_idx", "1", "2", "3", "4",
        "--dataloader_num_workers", "1",
        "--seed", "0",
    ])
    metrics = (out_dir / "metrics.jsonl").read_text().strip().splitlines()
    assert len(metrics) >= 3
    rec = json.loads(metrics[-1])
    assert "loss_mle" in rec and np.isfinite(rec["loss_mle"])
    assert (out_dir / "photoverse_000002.msgpack").exists()
    assert (out_dir / "photoverse.msgpack").exists()
    # the non-boundary final (step 3, saves every 2) embeds its step, so
    # resume-from-final behaves the same as resume from a promoted final
    from flax import serialization

    payload = serialization.msgpack_restore(
        (out_dir / "photoverse.msgpack").read_bytes()
    )
    assert payload["step"] == 3


def test_train_cli_final_ckpt_promoted_on_boundary(tmp_path):
    """When training ends exactly on a checkpoint boundary, the final
    photoverse.msgpack is PROMOTED from the stepped file by copy (no second
    device fetch — cli/train.py _promote_final_ckpt); the copy must be
    byte-identical and the .pt + sidecar must be promoted too."""
    root = _make_checkpoint(tmp_path)
    data_root = tmp_path / "ds"
    (data_root / "images").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8)).save(
            data_root / "images" / f"{i}.jpg"
        )

    from photoverse_tpu.cli.train import main

    out_dir = tmp_path / "run"
    main([
        "--pretrained_model_name_or_path", root,
        "--data_root_path", str(data_root),
        "--output_dir", str(out_dir),
        "--resolution", "32",
        "--train_batch_size", "2",
        "--max_train_steps", "2",
        "--checkpoint_save_steps", "2",
        "--samples_save_steps", "1000",
        "--use_lora", "--lora_rank", "2",
        "--image_encoder_layers_idx", "1", "2", "3", "4",
        "--dataloader_num_workers", "1",
        "--seed", "0",
        "--checkpoint_format", "both",
    ])
    stepped = (out_dir / "photoverse_000002.msgpack").read_bytes()
    final = (out_dir / "photoverse.msgpack").read_bytes()
    assert stepped == final
    assert (out_dir / "photoverse.pt").exists()
    assert (out_dir / "photoverse.msgpack.lora.json").exists()


def test_serve_cli_end_to_end(tmp_path):
    """Spin up the serving CLI on the tiny checkpoint and round-trip a
    /generate request (image in, PNGs out) plus /healthz."""
    import base64
    import io
    import json as _json
    import threading
    import urllib.request

    root = _make_checkpoint(tmp_path)
    face = tmp_path / "face.jpg"
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(face)

    from http.server import HTTPServer

    from photoverse_tpu.cli.serve import PhotoVerseService, build_parser, make_handler

    args = build_parser().parse_args([
        "--model_path", root, "--resolution", "32", "--default_steps", "2",
        "--encoder_layers_idx", "1", "2", "3", "4", "--port", "0",
    ])
    service = PhotoVerseService(args)
    server = HTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            health = _json.loads(r.read())
        assert health["status"] == "ok"

        img_b64 = base64.b64encode(face.read_bytes()).decode()
        req = _json.dumps({
            "image_b64": img_b64, "prompt": "the photo of a {}",
            "num_samples": 2, "steps": 2, "guidance_scale": 2.0, "seed": 3,
        }).encode()
        r = urllib.request.urlopen(
            urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=req,
                headers={"Content-Type": "application/json"},
            ),
            timeout=600,
        )
        resp = _json.loads(r.read())
        assert len(resp["images_b64"]) == 2
        img = Image.open(io.BytesIO(base64.b64decode(resp["images_b64"][0])))
        assert img.size == (32, 32)
        # warm pipeline reused on second call
        r2 = urllib.request.urlopen(
            urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=req,
                headers={"Content-Type": "application/json"},
            ),
            timeout=600,
        )
        assert _json.loads(r2.read())["latency_s"] < resp["latency_s"]
    finally:
        server.shutdown()


def test_load_models_reinjects_lora_from_checkpoint(tmp_path):
    """A LoRA-trained checkpoint loaded WITHOUT LoRA flags (the generate/
    serve CLIs never pass any) must rebuild the model with the checkpoint's
    saved lora_config and load the LoRA weights — reference
    modeling_utils.py:16-18 semantics. Before the fix, the rank-0 tree
    silently dropped both the LoRA deltas and the trained base q/k/v."""
    from photoverse_tpu.ckpt.checkpoint import save_progress, save_progress_pt
    from photoverse_tpu.models.assembly import load_models

    root = _make_checkpoint(tmp_path)
    kw = dict(
        extra_num_tokens=4, image_encoder_layers_idx=(1, 2, 3, 4),
    )
    lora_cfg = {"r": 2, "lora_alpha": 1.0, "lora_dropout": 0.0,
                "bias": "none",
                "target_modules": ["attn2.to_k", "attn2.to_v", "attn2.to_q"]}
    _, _, params, _ = load_models(root, use_lora=True, lora_rank=2, **kw)
    # make the LoRA deltas distinguishable from a fresh init (lora_B is
    # zero-initialized)
    import jax.numpy as jnp

    blk = "down_0_attn_0"
    marked = np.full(params.unet[blk]["attn2"]["to_q"]["lora_B"].shape, 0.5,
                     np.float32)
    params.unet[blk]["attn2"]["to_q"]["lora_B"] = jnp.asarray(marked)
    save_progress(str(tmp_path / "ck"), params, lora_config=lora_cfg)
    save_progress_pt(str(tmp_path / "ck"), params, lora_config=lora_cfg)

    for name in ("photoverse.msgpack", "photoverse.pt"):
        _, _, loaded, got_cfg = load_models(
            root, photoverse_path=str(tmp_path / "ck" / name), **kw
        )
        assert got_cfg is not None and int(got_cfg["r"]) == 2, name
        q = loaded.unet[blk]["attn2"]["to_q"]
        assert "lora_A" in q and "lora_B" in q, name
        np.testing.assert_allclose(np.asarray(q["lora_B"]), marked, err_msg=name)


def test_serve_dynamic_batching(tmp_path):
    """--dynamic_batching coalesces concurrent same-shape requests into ONE
    padded device batch (cli/serve.py worker thread) while preserving each
    request's seed: a coalesced request returns the same images as the
    sequential server given the same seed (run_inference initial_noise)."""
    import base64
    import io
    import json as _json
    import threading
    import urllib.error
    import urllib.request

    from http.server import HTTPServer, ThreadingHTTPServer

    from photoverse_tpu.cli.serve import PhotoVerseService, build_parser, make_handler

    root = _make_checkpoint(tmp_path)
    face = tmp_path / "face.jpg"
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(face)
    img_b64 = base64.b64encode(face.read_bytes()).decode()

    common = [
        "--model_path", root, "--resolution", "32", "--default_steps", "2",
        "--encoder_layers_idx", "1", "2", "3", "4", "--port", "0",
    ]
    seq = PhotoVerseService(build_parser().parse_args(common))
    # max_batch 2 => the pair dispatches the moment both requests are queued
    bat = PhotoVerseService(build_parser().parse_args(
        common + ["--dynamic_batching", "--batch_wait_ms", "2000",
                  "--max_batch", "2"]
    ))

    servers = []

    def _serve(service, cls):
        server = cls(("127.0.0.1", 0), make_handler(service))
        threading.Thread(target=server.serve_forever, daemon=True).start()
        servers.append(server)
        return server.server_address[1]

    p_seq = _serve(seq, HTTPServer)
    p_bat = _serve(bat, ThreadingHTTPServer)

    def post(port, body):
        r = urllib.request.urlopen(
            urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=_json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            ),
            timeout=600,
        )
        return _json.loads(r.read())

    def pixels(resp, i=0):
        data = base64.b64decode(resp["images_b64"][i])
        return np.asarray(Image.open(io.BytesIO(data)), np.int32)

    try:
        base = {"image_b64": img_b64, "prompt": "the photo of a {}",
                "steps": 2, "guidance_scale": 2.0}
        solo3 = post(p_seq, dict(base, seed=3))
        solo7 = post(p_seq, dict(base, seed=7))

        results = {}

        def fire(seed):
            results[seed] = post(p_bat, dict(base, seed=seed))

        threads = [threading.Thread(target=fire, args=(s,)) for s in (3, 7)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        # coalesced into one device batch of 2 rows
        assert results[3]["batch_rows"] == 2
        assert results[7]["batch_rows"] == 2
        # per-request seeds preserved: matches the sequential server modulo
        # batch-1-vs-2 compilation (8-bit rounding slack), and the two
        # seeds produce genuinely different images
        assert np.max(np.abs(pixels(results[3]) - pixels(solo3))) <= 2
        assert np.max(np.abs(pixels(results[7]) - pixels(solo7))) <= 2
        assert np.max(np.abs(pixels(results[3]) - pixels(results[7]))) > 2

        health = _json.loads(
            urllib.request.urlopen(f"http://127.0.0.1:{p_bat}/healthz").read()
        )
        assert health["dynamic_batching"] is True
        assert health["stats"]["batches"] >= 1
        assert health["stats"]["rows"] >= 2

        # requests with different shapes (steps 2 vs 3) must NOT coalesce:
        # each dispatches as its own batch of 1 after its wait window
        mixed = {}

        def fire_mixed(steps):
            mixed[steps] = post(p_bat, dict(base, seed=42, steps=steps))

        threads = [
            threading.Thread(target=fire_mixed, args=(s,)) for s in (2, 3)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert mixed[2]["batch_rows"] == 1
        assert mixed[3]["batch_rows"] == 1

        # graceful shutdown helper: queue is idle, drain returns True
        assert bat.drain(timeout_s=30) is True

        # backpressure: with the queue capacity forced to zero, the server
        # sheds load with HTTP 503 instead of queueing unboundedly
        bat.args.max_queue = 0
        try:
            post(p_bat, dict(base, seed=99))
            raise AssertionError("expected HTTP 503 when the queue is full")
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert "queue full" in _json.loads(e.read())["error"]
        finally:
            bat.args.max_queue = 64
    finally:
        for s in servers:
            s.shutdown()


def test_serve_euler_a_batching_preserves_seeds(tmp_path):
    """Ancestral samplers inject fresh noise every step; the per-request
    invariant must still hold under dynamic batching — the per-ROW
    ancestral keys (engine/inference.py _step_noise, serve _make_row_keys)
    make a coalesced euler_a request match the sequential server's output
    for the same seed."""
    import base64
    import io
    import json as _json
    import threading
    import urllib.request

    from http.server import HTTPServer, ThreadingHTTPServer

    from photoverse_tpu.cli.serve import PhotoVerseService, build_parser, make_handler

    root = _make_checkpoint(tmp_path)
    face = tmp_path / "face.jpg"
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(face)
    img_b64 = base64.b64encode(face.read_bytes()).decode()

    common = [
        "--model_path", root, "--resolution", "32", "--default_steps", "2",
        "--encoder_layers_idx", "1", "2", "3", "4", "--port", "0",
    ]
    seq = PhotoVerseService(build_parser().parse_args(common))
    bat = PhotoVerseService(build_parser().parse_args(
        common + ["--dynamic_batching", "--batch_wait_ms", "2000",
                  "--max_batch", "2"]
    ))

    servers = []

    def _serve(service, cls):
        server = cls(("127.0.0.1", 0), make_handler(service))
        threading.Thread(target=server.serve_forever, daemon=True).start()
        servers.append(server)
        return server.server_address[1]

    p_seq = _serve(seq, HTTPServer)
    p_bat = _serve(bat, ThreadingHTTPServer)

    def post(port, body):
        r = urllib.request.urlopen(
            urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=_json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            ),
            timeout=600,
        )
        return _json.loads(r.read())

    def pixels(resp, i=0):
        data = base64.b64decode(resp["images_b64"][i])
        return np.asarray(Image.open(io.BytesIO(data)), np.int32)

    try:
        base = {"image_b64": img_b64, "prompt": "the photo of a {}",
                "steps": 2, "guidance_scale": 2.0, "scheduler": "euler_a"}
        solo3 = post(p_seq, dict(base, seed=3))
        solo7 = post(p_seq, dict(base, seed=7))

        results = {}

        def fire(seed):
            results[seed] = post(p_bat, dict(base, seed=seed))

        threads = [threading.Thread(target=fire, args=(s,)) for s in (3, 7)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        assert results[3]["batch_rows"] == 2
        assert results[7]["batch_rows"] == 2
        assert np.max(np.abs(pixels(results[3]) - pixels(solo3))) <= 2
        assert np.max(np.abs(pixels(results[7]) - pixels(solo7))) <= 2
        assert np.max(np.abs(pixels(results[3]) - pixels(results[7]))) > 2
    finally:
        for s in servers:
            s.shutdown()


def test_serve_dynamic_batching_stress(tmp_path):
    """Concurrency regression: a burst of mixed requests (different seeds,
    num_samples, and step counts) through the threaded frontend + worker
    must all succeed, coalesce only within matching shapes, and account for
    every row in /healthz."""
    import base64
    import json as _json
    import threading
    import urllib.request

    from http.server import ThreadingHTTPServer

    from photoverse_tpu.cli.serve import PhotoVerseService, build_parser, make_handler

    root = _make_checkpoint(tmp_path)
    face = tmp_path / "face.jpg"
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(face)
    img_b64 = base64.b64encode(face.read_bytes()).decode()

    service = PhotoVerseService(build_parser().parse_args([
        "--model_path", root, "--resolution", "32", "--default_steps", "2",
        "--encoder_layers_idx", "1", "2", "3", "4", "--port", "0",
        "--dynamic_batching", "--max_batch", "4", "--batch_wait_ms", "30",
    ]))
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    N = 18
    results, errors = [], []
    lock = threading.Lock()

    def fire(i):
        body = _json.dumps({
            "image_b64": img_b64, "steps": 2 if i % 3 else 3,
            "seed": i, "num_samples": 1 + (i % 2),
        }).encode()
        try:
            r = urllib.request.urlopen(
                urllib.request.Request(
                    f"http://127.0.0.1:{port}/generate", data=body,
                    headers={"Content-Type": "application/json"},
                ),
                timeout=600,
            )
            with lock:
                results.append(_json.loads(r.read()))
        except Exception as e:  # pragma: no cover - failure detail
            with lock:
                errors.append((i, str(e)))

    try:
        threads = []
        for w in range(6):
            def worker(w=w):
                for i in range(w, N, 6):
                    fire(i)

            t = threading.Thread(target=worker)
            t.start()
            threads.append(t)
        for t in threads:
            t.join()

        assert not errors, errors[:3]
        assert len(results) == N
        total_imgs = sum(len(r["images_b64"]) for r in results)
        assert total_imgs == sum(1 + (i % 2) for i in range(N))
        health = _json.loads(
            urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz").read()
        )
        assert health["stats"]["requests"] == N
        assert health["stats"]["rows"] == total_imgs
        assert health["stats"]["rejected"] == 0
        assert service.drain(timeout_s=30) is True
    finally:
        server.shutdown()


def test_generate_cli_data_parallel_matches_single_device(tmp_path):
    """--data_parallel shards the sample batch over the 8 virtual CPU
    devices (with padding: 3 samples over 8 devices) and must produce the
    same images as the single-device route under the same seed."""
    root = _make_checkpoint(tmp_path)
    face = tmp_path / "face.jpg"
    rng = np.random.RandomState(1)
    Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(face)

    from photoverse_tpu.cli.generate import main

    common = [
        "--model_path", root,
        "--checkpoint_path", "",
        "--input_image_path", str(face),
        "--output_image_path", "gen",
        "--num_timesteps", "3",
        "--resolution", "32",
        "--guidance_scale", "2.0",
        "--num_of_samples", "3",
        "--encoder_layers_idx", "1", "2", "3", "4",
        "--seed", "11",
    ]
    single = tmp_path / "single"
    sharded = tmp_path / "sharded"
    main(common + ["--results_dir", str(single)])
    main(common + ["--results_dir", str(sharded), "--data_parallel"])
    for i in range(3):
        a = np.asarray(Image.open(single / f"gen{i}.png"), np.int32)
        b = np.asarray(Image.open(sharded / f"gen{i}.png"), np.int32)
        # identical math modulo GSPMD placement; allow 8-bit rounding slack
        assert np.max(np.abs(a - b)) <= 1


def test_train_cli_tensor_parallel_fsdp(tmp_path):
    """Train CLI over a 2-D (data x model) mesh: --tensor_parallel 2 shards
    the UNet Megatron-style, --fsdp ZeRO-3-shards params + optimizer state
    over the data axis (parallel/tp.py, parallel/fsdp.py). Two optimizer
    steps must run, log finite losses, and checkpoint."""
    root = _make_checkpoint(tmp_path)
    data_root = tmp_path / "ds"
    (data_root / "images").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8)).save(
            data_root / "images" / f"{i}.jpg"
        )

    from photoverse_tpu.cli.train import main

    out_dir = tmp_path / "run_tp"
    main([
        "--pretrained_model_name_or_path", root,
        "--data_root_path", str(data_root),
        "--output_dir", str(out_dir),
        "--resolution", "32",
        "--train_batch_size", "2",
        "--max_train_steps", "2",
        "--checkpoint_save_steps", "2",
        "--samples_save_steps", "2",
        "--denoise_timesteps", "2",
        "--num_of_samples_to_save", "2",
        "--learning_rate", "1e-4",
        "--use_lora", "--lora_rank", "2",
        "--image_encoder_layers_idx", "1", "2", "3", "4",
        "--dataloader_num_workers", "1",
        "--tensor_parallel", "2",
        "--fsdp",
        "--seed", "0",
    ])
    metrics = (out_dir / "metrics.jsonl").read_text().strip().splitlines()
    rec = json.loads(metrics[-1])
    assert "loss_mle" in rec and np.isfinite(rec["loss_mle"])
    assert (out_dir / "photoverse_000002.msgpack").exists()
    # the sample grid generated from the sharded params at step 2
    assert (out_dir / "00002.jpg").exists()
