#!/usr/bin/env python
"""Turnkey real-weight verification harness (one command, one JSON report).

Run on a machine that has network access (or local copies of the real
checkpoints) plus `diffusers` installed:

    python scripts/verify_real_weights.py \
        --sd_path runwayml/stable-diffusion-v1-5 \
        --clip_vision_path openai/clip-vit-large-patch14 \
        [--photoverse_ckpt photoverse.pt --face_image face.jpg \
         --arcface_weights arcface18.pt --mtcnn_weights mtcnn.pt]

Stages (each skips gracefully, recording the reason in the report):
  1. scheduler-goldens  — records diffusers DPM-Solver++ (plain + Karras),
     DDIM, Euler, Euler-Karras, and Euler-Ancestral golden trajectories
     into tests/fixtures/ (consumed by tests/test_scheduler_goldens.py and
     tests/test_round3.py; these are the suite's "needs network" skip slots)
  2. module-parity      — loads the REAL SD-1.5 + CLIP ViT-L/14 weights
     with torch (diffusers/transformers), runs the pinned input protocol
     (photoverse_tpu.convert.real_goldens), converts the same weights with
     this framework's load_models, and compares every family: text encoder,
     vision encoder (+ collected hidden layers 4/8/12/16), VAE
     encode/decode, UNet epsilon (identity projections zeroed = vanilla SD
     parity mode). Also writes tests/fixtures/real_weight_goldens.json so
     tests/test_real_weight_goldens.py re-asserts offline whenever a local
     checkpoint is available (PHOTOVERSE_SD15_PATH).
  3. arcface-cosine     — BASELINE.json's identity metric: generates one
     image from --face_image with this framework (+ --photoverse_ckpt) and
     reports the ArcFace cosine similarity between input and generation.

The final line printed is one JSON object; it is also written to
REAL_WEIGHTS_REPORT.json in the repo root.

Reference ground truth: /root/reference/models/modeling_utils.py:55-60
(the torch repo's value rests entirely on the diffusers/transformers models
it loads — this harness closes the replica-only parity gap noted in
VERDICT.md round 2).
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURES = os.path.join(REPO, "tests", "fixtures")
sys.path.insert(0, REPO)

# float32 end to end; CPU is fine for a one-shot verification
os.environ.setdefault("JAX_PLATFORMS", "cpu")

TOLERANCES = {  # rel-to-absmax tolerances per family (fp32 both sides)
    "text": 2e-5,
    "vision": 2e-5,
    "vae": 5e-5,
    "unet": 1e-4,  # deepest graph; accumulated conv reassociation
}


def stage_scheduler_goldens(report):
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "record_scheduler_goldens.py")],
            capture_output=True, text=True, timeout=600,
        )
        ok = proc.returncode == 0
        report["scheduler_goldens"] = {
            "ok": ok,
            "detail": proc.stdout.strip() if ok else proc.stderr.strip()[-2000:],
        }
    except Exception as e:  # noqa: BLE001 — report-and-continue harness
        report["scheduler_goldens"] = {"ok": False, "detail": repr(e)}


def _resolve_checkpoint(path_or_id, kind):
    """Local dir passes through; hub ids are snapshot-downloaded."""
    if os.path.isdir(path_or_id):
        return path_or_id
    from huggingface_hub import snapshot_download

    patterns = ["*.json", "*.txt", "*.bin", "*.safetensors", "*.model"]
    return snapshot_download(path_or_id, allow_patterns=patterns)


def torch_outputs(sd_path, clip_vision_path):
    """The protocol through the REAL torch implementations (NCHW->NHWC)."""
    import torch
    from diffusers import AutoencoderKL, UNet2DConditionModel
    from transformers import CLIPTextModel, CLIPTokenizer, CLIPVisionModel

    from photoverse_tpu.convert.real_goldens import (
        PROMPT, UNET_T, VISION_LAYERS, make_inputs,
    )

    inputs = make_inputs()
    out = {}
    with torch.no_grad():
        tok = CLIPTokenizer.from_pretrained(sd_path, subfolder="tokenizer")
        ids = tok(
            PROMPT, padding="max_length", truncation=True,
            max_length=tok.model_max_length, return_tensors="pt",
        ).input_ids
        text = CLIPTextModel.from_pretrained(sd_path, subfolder="text_encoder")
        text.eval()
        t_out = text(ids)
        out["text_hidden"] = t_out.last_hidden_state.numpy()
        out["text_pooled"] = t_out.pooler_output.numpy()

        vision = CLIPVisionModel.from_pretrained(clip_vision_path)
        vision.eval()
        vp = torch.from_numpy(inputs["vision_pixels"].transpose(0, 3, 1, 2))
        v_out = vision(vp, output_hidden_states=True)
        out["vision_last_hidden"] = v_out.last_hidden_state.numpy()
        for li in VISION_LAYERS:
            out[f"vision_layer_{li}"] = v_out.hidden_states[li].numpy()

        vae = AutoencoderKL.from_pretrained(sd_path, subfolder="vae")
        vae.eval()
        px = torch.from_numpy(inputs["vae_pixels"].transpose(0, 3, 1, 2))
        posterior = vae.encode(px).latent_dist
        out["vae_enc_mean"] = posterior.mean.numpy().transpose(0, 2, 3, 1)
        out["vae_enc_logvar"] = posterior.logvar.numpy().transpose(0, 2, 3, 1)
        lat = torch.from_numpy(inputs["vae_latents"].transpose(0, 3, 1, 2))
        out["vae_decode"] = vae.decode(lat).sample.numpy().transpose(0, 2, 3, 1)

        unet = UNet2DConditionModel.from_pretrained(sd_path, subfolder="unet")
        unet.eval()
        sample = torch.from_numpy(inputs["unet_sample"].transpose(0, 3, 1, 2))
        ctx = t_out.last_hidden_state
        eps = unet(sample, UNET_T, encoder_hidden_states=ctx).sample
        out["unet_eps"] = eps.numpy().transpose(0, 2, 3, 1)
    return out


def stage_module_parity(args, report):
    from photoverse_tpu.convert.real_goldens import compare_digest, digest

    try:
        sd_path = _resolve_checkpoint(args.sd_path, "sd")
        clip_path = _resolve_checkpoint(args.clip_vision_path, "clip")
    except Exception as e:  # noqa: BLE001
        report["module_parity"] = {
            "ok": False, "detail": f"checkpoint resolution failed: {e!r}",
        }
        return

    try:
        ref = torch_outputs(sd_path, clip_path)
    except Exception as e:  # noqa: BLE001
        report["module_parity"] = {
            "ok": False, "detail": f"torch side failed: {e!r}",
        }
        return

    # persist goldens first — even if the JAX side fails, the recording run
    # was expensive and the offline test can still consume it later
    goldens = {k: digest(v) for k, v in ref.items()}
    os.makedirs(FIXTURES, exist_ok=True)
    with open(os.path.join(FIXTURES, "real_weight_goldens.json"), "w") as f:
        json.dump({"protocol": "convert/real_goldens.py", "digests": goldens}, f)

    from photoverse_tpu.convert.real_goldens import jax_outputs

    try:
        mine = jax_outputs(sd_path, clip_vision_path=clip_path)
    except Exception as e:  # noqa: BLE001
        report["module_parity"] = {
            "ok": False, "detail": f"jax side failed: {e!r}",
            "goldens_written": True,
        }
        return

    families = {
        "text": [k for k in ref if k.startswith("text_")],
        "vision": [k for k in ref if k.startswith("vision_")],
        "vae": [k for k in ref if k.startswith("vae_")],
        "unet": ["unet_eps"],
    }
    results, all_ok = {}, True
    for fam, keys in families.items():
        fam_res = {}
        for k in keys:
            cmp = compare_digest(mine[k], goldens[k])
            cmp["pass"] = bool(
                cmp.get("ok") and cmp["max_rel"] <= TOLERANCES[fam]
            )
            all_ok &= cmp["pass"]
            fam_res[k] = cmp
        results[fam] = fam_res
    report["module_parity"] = {"ok": all_ok, "families": results}


def stage_int8_deviation(args, report):
    """--int8_conditioning accuracy on REAL weights.

    The +10% W8A8 conditioning path (ops/quant.py) was validated at
    cosine >= 0.999 on RANDOM weights only; real trained CLIPs carry
    activation outliers that per-tensor dynamic scales are sensitive to.
    This stage measures the text/identity context cosine between the bf16
    and int8 routes under the real checkpoints so the flag's production
    fitness is a recorded number, not an extrapolation.
    """
    try:
        import jax
        import jax.numpy as jnp

        from photoverse_tpu.engine.inference import encode_condition
        from photoverse_tpu.models.assembly import load_models

        sd_path = _resolve_checkpoint(args.sd_path, "sd")
        clip_path = _resolve_checkpoint(args.clip_vision_path, "clip")

        rng = np.random.RandomState(0)
        if args.face_image:
            from PIL import Image

            from photoverse_tpu.data.preprocessing import clip_preprocess

            img = Image.open(args.face_image).convert("RGB")
            px = np.asarray(clip_preprocess(img))[None]
        else:
            px = rng.randn(1, 224, 224, 3).astype(np.float32)

        outs = {}
        for label, int8 in (("bf16", False), ("int8", True)):
            tok, mods, params, _ = load_models(
                sd_path, image_encoder_path=clip_path,
                dtype=jnp.bfloat16, int8_conditioning=int8,
            )
            ids = jnp.asarray(tok(["a photo of a *"]), jnp.int32)
            concept, id_ctx = encode_condition(
                mods, params, jnp.asarray(px), None
            )
            text_ctx, _ = mods.text_encoder.apply(
                {"params": params.text_encoder}, ids, concept,
                jnp.asarray([5], jnp.int32),
            )
            outs[label] = (np.asarray(text_ctx, np.float64),
                           np.asarray(id_ctx, np.float64))

        def cos(a, b):
            a, b = a.ravel(), b.ravel()
            return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))

        text_cos = cos(outs["bf16"][0], outs["int8"][0])
        id_cos = cos(outs["bf16"][1], outs["int8"][1])
        report["int8_conditioning_deviation"] = {
            # 0.999 matches the random-weight envelope the docs advertise
            "ok": bool(text_cos >= 0.999 and id_cos >= 0.999),
            "text_ctx_cosine": round(text_cos, 6),
            "id_ctx_cosine": round(id_cos, 6),
            "input": "face_image" if args.face_image else "random",
        }
    except Exception as e:  # noqa: BLE001
        report["int8_conditioning_deviation"] = {"ok": False, "detail": repr(e)}


def stage_arcface_cosine(args, report):
    if not (args.photoverse_ckpt and args.face_image):
        report["arcface_cosine"] = {
            "ok": None,
            "detail": "skipped: pass --photoverse_ckpt and --face_image "
            "(+ --arcface_weights, --mtcnn_weights) to run the "
            "BASELINE identity metric",
        }
        return
    try:
        sd_path = _resolve_checkpoint(args.sd_path, "sd")
        with tempfile.TemporaryDirectory() as td:
            from photoverse_tpu.cli.generate import main as gen_main

            gen_main([
                "--model_path", sd_path,
                "--checkpoint_path", args.photoverse_ckpt,
                "--input_image_path", args.face_image,
                "--results_dir", td,
                "--output_image_path", "gen",
                "--num_timesteps", "25",
                "--guidance_scale", "6.0",
                "--negative_prompt", "blurry, abstract, digital art, cartoon",
                "--seed", "0",
            ])
            from photoverse_tpu.utils.face_similarity import FaceSimilarity

            sim = FaceSimilarity(
                "arcface",
                weights_path=args.arcface_weights,
                mtcnn_weights_path=args.mtcnn_weights,
            )
            value = sim.calculate_face_similarity(
                args.face_image, os.path.join(td, "gen0.png")
            )
        report["arcface_cosine"] = {"ok": True, "cosine": value}
    except Exception as e:  # noqa: BLE001
        report["arcface_cosine"] = {"ok": False, "detail": repr(e)}


def main():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--sd_path", default="runwayml/stable-diffusion-v1-5")
    p.add_argument("--clip_vision_path", default="openai/clip-vit-large-patch14")
    p.add_argument("--photoverse_ckpt", default=None)
    p.add_argument("--face_image", default=None)
    p.add_argument("--arcface_weights", default=None)
    p.add_argument("--mtcnn_weights", default=None)
    p.add_argument("--skip_schedulers", action="store_true")
    args = p.parse_args()

    report = {}
    if not args.skip_schedulers:
        stage_scheduler_goldens(report)
    stage_module_parity(args, report)
    stage_int8_deviation(args, report)
    stage_arcface_cosine(args, report)

    out_path = os.path.join(REPO, "REAL_WEIGHTS_REPORT.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    hard_fail = any(
        isinstance(v, dict) and v.get("ok") is False for v in report.values()
    )
    return 1 if hard_fail else 0


if __name__ == "__main__":
    sys.exit(main())
