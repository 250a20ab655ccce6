"""Round-3 regression tests: DDIM sampler, in-training face-similarity
metric, random-prompt sampling swap, VAE-derived latent size in sampling.

VERDICT.md round-2 items #3, #4, #9.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from photoverse_tpu.core.schedulers import DDPMSchedule, DPMSolverMultistep


# ---------------------------------------------------------------------------
# DDIM: the static-affine formulation must match a straightforward stateful
# DDIM implementation (diffusers DDIMScheduler semantics as SD-1.5 configures
# it: eta=0, "leading" spacing, steps_offset=1, set_alpha_to_one=True,
# epsilon prediction, no clipping).
# ---------------------------------------------------------------------------

def _ddim_reference(n: int) -> np.ndarray:
    """Textbook stateful DDIM (Song et al. eq. 12 with eta=0)."""
    schedule = DDPMSchedule.create()
    abar = schedule.alphas_cumprod
    T = schedule.num_train_timesteps
    ratio = T // n
    timesteps = (np.arange(n) * ratio).round()[::-1].astype(np.int64) + 1
    x = np.random.RandomState(1234).randn(2, 4, 4, 4).astype(np.float64)
    for t in timesteps:
        eps = 0.1 * x
        ab_t = abar[t]
        prev_t = t - ratio
        ab_prev = abar[prev_t] if prev_t >= 0 else 1.0
        x0 = (x - np.sqrt(1.0 - ab_t) * eps) / np.sqrt(ab_t)
        x = np.sqrt(ab_prev) * x0 + np.sqrt(1.0 - ab_prev) * eps
    return x


def _run_solver_scan(solver, n: int) -> np.ndarray:
    x = jnp.asarray(
        np.random.RandomState(1234).randn(2, 4, 4, 4).astype(np.float32)
    )
    xs = solver.scan_inputs()
    m_prev = jnp.zeros_like(x)
    for i in range(n):
        step_in = jax.tree.map(lambda v: v[i], xs)
        eps = 0.1 * x
        x, m_prev = solver.step(step_in, x, eps, m_prev)
    return np.asarray(x, np.float64)


@pytest.mark.parametrize("n", (5, 10, 25, 50))
def test_ddim_matches_stateful_reference(n):
    solver = DPMSolverMultistep.create_ddim(DDPMSchedule.create(), n)
    got = _run_solver_scan(solver, n).ravel()
    want = _ddim_reference(n).ravel()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_ddim_timestep_grid_leading_spacing():
    """SD-1.5's DDIM grid: leading spacing + steps_offset 1 ->
    [981, 961, ..., 1] at 50 steps."""
    solver = DPMSolverMultistep.create_ddim(DDPMSchedule.create(), 50)
    ts = np.asarray(solver.timesteps)
    assert ts[0] == 981 and ts[-1] == 1
    assert np.all(np.diff(ts) == -20)
    # final step must land exactly on the x0-prediction (abar_prev == 1)
    assert solver.a[-1] == pytest.approx(
        np.sqrt((1.0 - 1.0) / (1.0 - DDPMSchedule.create().alphas_cumprod[1]))
    )
    assert solver.c.sum() == 0.0  # DDIM is single-step: no multistep term


def test_ddim_diffusers_goldens():
    """Asserted against real diffusers DDIMScheduler trajectories when the
    fixture exists (recorded by scripts/record_scheduler_goldens.py on a
    networked machine); skipped otherwise."""
    import os

    path = os.path.join(
        os.path.dirname(__file__), "fixtures", "ddim_goldens_diffusers.json"
    )
    if not os.path.exists(path):
        pytest.skip(
            "ddim_goldens_diffusers.json not recorded (requires a networked "
            "machine with diffusers; run scripts/record_scheduler_goldens.py)"
        )
    with open(path) as f:
        rec = json.load(f)
    for n_str, run in rec["runs"].items():
        n = int(n_str)
        solver = DPMSolverMultistep.create_ddim(DDPMSchedule.create(), n)
        np.testing.assert_array_equal(
            np.asarray(solver.timesteps), np.asarray(run["timesteps"])
        )
        got = _run_solver_scan(solver, n).ravel()
        np.testing.assert_allclose(
            got, np.asarray(run["x_final"]), rtol=1e-4, atol=1e-5
        )


# ---------------------------------------------------------------------------
# Training-loop sampling: face_similarity scalar, random-prompt swap, and
# VAE-derived latent size (the tiny checkpoint's VAE has latent factor 2, so
# the old `resolution // 8` hardcode would generate wrong-shaped samples).
# ---------------------------------------------------------------------------

def test_train_sampling_face_similarity_and_random_prompts(tmp_path):
    from tests.test_cli_e2e import _make_checkpoint

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
        "--checkpoint_save_steps", "1000",
        "--samples_save_steps", "2",
        "--denoise_timesteps", "2",
        "--num_of_samples_to_save", "2",
        "--use_random_prompts",
        "--face_loss", "arcface", "--allow_random_face_model",
        "--learning_rate", "1e-4",
        "--use_lora", "--lora_rank", "2",
        "--image_encoder_layers_idx", "1", "2", "3", "4",
        "--dataloader_num_workers", "1",
        "--seed", "0",
    ])
    # sample grid written at step 2 with the VAE-derived latent size
    assert (out_dir / "00002.jpg").exists()
    metrics = [
        json.loads(line)
        for line in (out_dir / "metrics.jsonl").read_text().strip().splitlines()
    ]
    # the reference's in-training identity signal (train.py:569-573,602-605)
    sims = [m["face_similarity"] for m in metrics if "face_similarity" in m]
    assert len(sims) == 1
    assert np.isfinite(sims[0]) and 0.0 <= sims[0] <= 1.0
    # training face loss present every step too
    assert all("loss_face" in m for m in metrics if "loss_mle" in m)


# ---------------------------------------------------------------------------
# insightface-style helpers (reference arcface_utils.py:36-126) and the
# README gallery rebuild (reference image_utils.py:73-112)
# ---------------------------------------------------------------------------

def test_insightface_style_helpers():
    from photoverse_tpu.utils.face_similarity import (
        cosine_similarity_between_images,
        crop_face_from_image,
        get_largest_bbox_face_analysis,
    )

    img = np.arange(10 * 12 * 3, dtype=np.uint8).reshape(10, 12, 3)
    crop = crop_face_from_image(
        img, {"bbox": np.array([-2.0, 3.0, 8.0, 99.0])}
    )
    assert crop.shape == (7, 8, 3)  # clamped to image bounds
    np.testing.assert_array_equal(crop, img[3:10, 0:8])

    fas = [
        {"bbox": [0, 0, 2, 2], "embedding": np.array([1.0, 0.0])},
        {"bbox": [0, 0, 5, 5], "embedding": np.array([0.0, 1.0])},
    ]
    assert get_largest_bbox_face_analysis(fas) is fas[1]
    assert get_largest_bbox_face_analysis([]) == []  # reference quirk

    def fake_detector(image):
        # one face whose embedding is the image mean channel vector
        return [{
            "bbox": [0, 0, image.shape[1], image.shape[0]],
            "embedding": image.reshape(-1, 3).mean(0),
        }]

    a = np.full((4, 4, 3), 10, np.uint8)
    b = np.full((4, 4, 3), 200, np.uint8)
    sim = cosine_similarity_between_images(a, b, fake_detector)
    assert sim == pytest.approx(1.0)  # parallel embeddings
    assert cosine_similarity_between_images(a, b, lambda im: []) == 0


def test_rebuild_gallery_grid(tmp_path):
    from photoverse_tpu.utils.image import rebuild_gallery_grid

    prompts = [("Input Image", "input_image"), ("A photo of S*", "photo")]
    for i in (1, 2):
        (tmp_path / str(i)).mkdir()
        for _, stem in prompts:
            Image.new("RGB", (8, 8), (i * 40, 0, 0)).save(
                tmp_path / str(i) / f"{stem}{i}.png"
            )
    out = tmp_path / "grid.png"
    rebuild_gallery_grid(str(tmp_path), str(out), prompts, num_columns=2)
    grid = Image.open(out)
    assert grid.size == (16, 2 * (8 + 50))  # 2 cols x 2 rows + headers


def test_serve_scheduler_field(tmp_path):
    """Per-request DDIM selection in the serving CLI."""
    import base64
    import json as _json
    import threading
    import urllib.request
    from http.server import HTTPServer

    from tests.test_cli_e2e import _make_checkpoint
    from photoverse_tpu.cli.serve import PhotoVerseService, build_parser, make_handler

    root = _make_checkpoint(tmp_path)
    face = tmp_path / "face.jpg"
    rng = np.random.RandomState(0)
    Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(face)

    args = build_parser().parse_args([
        "--model_path", root, "--resolution", "32", "--default_steps", "2",
        "--encoder_layers_idx", "1", "2", "3", "4", "--port", "0",
    ])
    service = PhotoVerseService(args)
    server = HTTPServer(("127.0.0.1", 0), make_handler(service))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        req = _json.dumps({
            "image_b64": base64.b64encode(face.read_bytes()).decode(),
            "prompt": "a photo of a {}", "num_samples": 1, "steps": 2,
            "guidance_scale": 2.0, "seed": 3, "scheduler": "ddim",
        }).encode()
        r = urllib.request.urlopen(
            urllib.request.Request(
                f"http://127.0.0.1:{port}/generate", data=req,
                headers={"Content-Type": "application/json"},
            ),
            timeout=600,
        )
        resp = _json.loads(r.read())
        assert len(resp["images_b64"]) == 1
        # the ddim pipeline is cached under its own key
        assert any(k[3] == "ddim" for k in service._pipelines)
    finally:
        server.shutdown()


# ---------------------------------------------------------------------------
# fast_norm_reductions: the flag must thread from build_models into both the
# UNet and VAE configs, and lifting flax's force_float32_reductions must not
# materially change the forward output (measured end-to-end as an exact
# throughput tie — see PERFORMANCE.md "bf16 norm-statistics reductions").
# ---------------------------------------------------------------------------


def test_fast_norm_reductions_threads_and_is_numerically_benign():
    from photoverse_tpu.models.assembly import build_models
    from photoverse_tpu.models.unet import UNet2DCondition, UNetConfig

    mods = build_models(fast_norms=True, fast_norm_reductions=True)
    assert mods.unet.config.fast_norm_reductions
    assert mods.vae.config.fast_norm_reductions
    mods_off = build_models(fast_norms=True)
    assert not mods_off.unet.config.fast_norm_reductions

    kw = dict(block_out_channels=(32, 64), layers_per_block=1,
              cross_attention_dim=16, num_heads=2, norm_num_groups=8,
              fast_norms=True)
    u_off = UNet2DCondition(UNetConfig(**kw), dtype=jnp.bfloat16)
    u_on = UNet2DCondition(
        UNetConfig(fast_norm_reductions=True, **kw), dtype=jnp.bfloat16
    )
    rng = np.random.RandomState(7)
    s = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
    t = jnp.asarray([5])
    text = jnp.asarray(rng.randn(1, 7, 16).astype(np.float32))
    idc = jnp.asarray(rng.randn(1, 3, 16).astype(np.float32))
    params = u_off.init(jax.random.PRNGKey(0), s, t, text, idc)["params"]
    out_off, _ = u_off.apply({"params": params}, s, t, text, idc)
    out_on, _ = u_on.apply({"params": params}, s, t, text, idc)
    a, b = np.asarray(out_off, np.float32), np.asarray(out_on, np.float32)
    assert np.all(np.isfinite(b))
    np.testing.assert_allclose(a, b, atol=0.1)
