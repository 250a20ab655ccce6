"""Inference CLI — flag surface of the reference generate.py
(/root/reference/generate.py:21-34), TPU execution.

Usage:
  python -m photoverse_tpu.cli.generate --model_path /path/to/sd15 \
      --checkpoint_path photoverse.pt --input_image_path face.jpg \
      --text "a photo of a {}" --num_timesteps 25 --guidance_scale 6
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Run inference with pre-trained models")
    p.add_argument("--model_path", type=str, default="runwayml/stable-diffusion-v1-5",
                   help="Local diffusers-layout SD checkpoint directory")
    p.add_argument("--extra_num_tokens", type=int, default=4)
    p.add_argument("--encoder_layers_idx", nargs="+", type=int, default=[4, 8, 12, 16])
    p.add_argument("--guidance_scale", type=float, default=1.0)
    p.add_argument("--checkpoint_path", type=str, default="exp1/40k_simple.pt",
                   help="PhotoVerse checkpoint (.pt torch format or .msgpack)")
    p.add_argument("--input_image_path", type=str, required=False,
                   default=None, help="Path to the input identity photo")
    p.add_argument("--output_image_path", type=str, default="generated_image")
    p.add_argument("--num_timesteps", type=int, default=25)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--results_dir", type=str, default="results")
    p.add_argument("--text", type=str, nargs="+", default=["a photo of a {}"],
                   help="Prompt template(s) with {} for the identity token; "
                        "multiple templates batch over the one identity in a "
                        "single CFG denoise (BASELINE config 2)")
    p.add_argument("--negative_prompt", type=str, default=None)
    p.add_argument("--num_of_samples", type=int, default=None)
    p.add_argument("--from_noised_image", action="store_true")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--bf16", action="store_true", help="bfloat16 compute (TPU)")
    p.add_argument("--ip_adapter_mask_path", type=str, default=None,
                   help="Optional grayscale mask restricting where identity "
                        "tokens attend (spatial IP-adapter mask)")
    p.add_argument("--fast", action="store_true",
                   help="TPU fast path: bf16 compute + flash self-attention "
                        "+ bf16 attention scores + fused block-tail kernel")
    p.add_argument("--bf16_params", action="store_true",
                   help="Store the loaded weights in bfloat16 (halves the "
                        "per-eval HBM weight read). Measured +7.6%% on "
                        "batch-1 512px latency, max pixel deviation 0.035 "
                        "vs f32-stored; recommended with --fast for serving")
    p.add_argument("--int8_conditioning", action="store_true",
                   help="W8A8 dynamic-int8 projections in the frozen CLIP "
                        "conditioning encoders. Opt-in: +10%% conditioning "
                        "throughput measured at batch 64 on random weights "
                        "(ctx cosine >=0.999 there); real trained CLIPs have "
                        "activation outliers that per-tensor scales are "
                        "sensitive to — validate identity similarity on real "
                        "weights (scripts/verify_real_weights.py) before "
                        "production use")
    p.add_argument("--data_parallel", action="store_true",
                   help="Shard the sample batch over all local devices "
                        "(GSPMD data-parallel inference; the batch is "
                        "padded to a multiple of the device count). "
                        "Alias for --sharding data")
    p.add_argument("--sharding", type=str, default="none",
                   choices=["none", "data", "spatial", "tensor"],
                   help="Multi-chip execution mode. data: batch rows over "
                        "all devices (throughput; batch >= devices). "
                        "spatial: latent height over the model axis — GSPMD "
                        "patch parallelism with halo-exchanged convs and "
                        "gathered-KV attention (batch-1 latency; "
                        "parallel/sp.py). tensor: Megatron-style "
                        "heads/FFN weight sharding of the UNet "
                        "(parallel/tp.py). spatial/tensor compose with data "
                        "parallelism on a 2-D mesh via --model_parallel")
    p.add_argument("--model_parallel", type=int, default=0,
                   help="Model-axis size for --sharding spatial|tensor "
                        "(0 = all local devices; the rest of the devices "
                        "form the data axis)")
    from photoverse_tpu.core.schedulers import SCHEDULER_NAMES

    p.add_argument("--scheduler", type=str, default="dpm",
                   choices=list(SCHEDULER_NAMES),
                   help="dpm: DPM-Solver++(2M) (reference infer.py:39-40); "
                        "ddim: DDIM eta=0 (BASELINE.json's 50-step-DDIM "
                        "metric wording); euler / euler_a: (ancestral) "
                        "Euler discrete; unipc: UniPC bh2 "
                        "predictor-corrector; dpm_sde: sde-dpmsolver++ "
                        "midpoint ('DPM++ 2M SDE'); heun: trapezoidal "
                        "2nd-order (2N-1 UNet evals); lms: k-lms order-4 "
                        "Adams-Bashforth; dpm_2s_a: DPM++ 2S ancestral "
                        "(2N-1 UNet evals); pndm: PNDM/PLMS, the historical "
                        "SD-1.5 default (N+1 UNet evals); *_karras: same "
                        "sampler on the Karras rho-7 sigma grid (diffusers "
                        "use_karras_sigmas=True)")
    p.add_argument("--karras_sigmas", action="store_true",
                   help="Karras rho-7 sigma grid for the chosen scheduler "
                        "(equivalent to the *_karras scheduler names; "
                        "invalid with ddim and pndm)")
    p.add_argument("--cpu", action="store_true",
                   help="Force the CPU backend (the TPU plugin ignores "
                        "JAX_PLATFORMS alone)")
    return p


def preprocess_image_for_inference(
    image_path, tokenizer, template="a photo of a {}", placeholder_token="*",
    negative_prompt=None, num_of_samples=None, size=512, interpolation="bicubic",
    clip_size=224,
):
    """Reference generate.py:37-62 equivalent, NHWC numpy outputs.

    `template` may be one template string (reference behavior) or a list of
    templates — then the batch is the templates x num_of_samples over the
    single identity photo, all denoised in one CFG call (BASELINE config 2:
    8 prompts x 1 identity).

    `image_path` may also be an already-decoded PIL.Image (the serving path
    receives images in request bodies — no temp-file round trip needed)."""
    from PIL import Image

    from photoverse_tpu.data.preprocessing import clip_preprocess, preprocess_image
    from photoverse_tpu.data.prompts import prepare_prompt

    raw = (
        image_path
        if isinstance(image_path, Image.Image)
        else Image.open(image_path)
    )
    if raw.mode != "RGB":
        raw = raw.convert("RGB")
    templates = [template] if isinstance(template, str) else list(template)
    exs = [
        prepare_prompt(
            tokenizer, t, placeholder_token,
            negative_prompt=negative_prompt, num_of_samples=num_of_samples,
        )
        for t in templates
    ]
    if len(exs) == 1:
        example = exs[0]
    else:
        def cat(key):
            return np.concatenate(
                [np.asarray(e[key]).reshape(-1, np.asarray(e[key]).shape[-1])
                 for e in exs]
            )

        texts = []
        for e in exs:
            texts.extend(e["text"] if isinstance(e["text"], list) else [e["text"]])
        example = {
            "text": texts,
            "text_input_ids": cat("text_input_ids"),
            "concept_placeholder_idx": cat("concept_placeholder_idx"),
            "negative_text_input_ids": (
                cat("negative_text_input_ids")
                if exs[0].get("negative_text_input_ids") is not None
                else None
            ),
        }
    n = example["text_input_ids"].shape[0]
    example["pixel_values_clip"] = np.repeat(
        clip_preprocess(raw, clip_size)[None], n, axis=0
    )
    example["pixel_values"] = np.repeat(
        preprocess_image(raw, size, interpolation)[None], n, axis=0
    )
    return example


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.input_image_path is None:
        raise SystemExit("--input_image_path is required")
    if args.karras_sigmas and args.scheduler in ("ddim", "pndm"):
        # fail before the multi-GB model load; make_solver would reject it
        raise SystemExit(
            f"--karras_sigmas is invalid with --scheduler {args.scheduler} "
            "(ddim's grid is defined by its leading spacing and pndm's "
            "multistep coefficients assume it; pick euler/dpm/unipc/heun/"
            "lms/dpm_2s_a variants for Karras sigmas)"
        )
    if args.cpu:
        from photoverse_tpu.utils.platform import force_cpu

        force_cpu()
    else:
        from photoverse_tpu.utils.platform import (
            DEFAULT_CACHE_DIR,
            enable_compilation_cache,
        )

        enable_compilation_cache(
            os.environ.get("PHOTOVERSE_COMPILE_CACHE", DEFAULT_CACHE_DIR)
        )

    from photoverse_tpu.core.schedulers import make_solver
    from photoverse_tpu.engine.inference import run_inference
    from photoverse_tpu.models.assembly import load_models
    from photoverse_tpu.utils.image import denormalize, to_pil

    # the Pallas kernels (flash attention, fused block tail) are TPU
    # Mosaic-only; --fast on a CPU run (e.g. --cpu smoke tests) keeps the
    # jnp paths
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if (args.bf16 or args.fast) else jnp.float32
    ckpt = args.checkpoint_path or None
    if ckpt and not os.path.exists(ckpt):
        raise SystemExit(f"checkpoint not found: {ckpt}")
    sharding_mode = args.sharding
    if args.data_parallel and sharding_mode == "none":
        sharding_mode = "data"
    # under spatial/tensor sharding, --fast keeps bf16 + fast norms/scores;
    # flash attention is re-enabled AFTER the mesh exists via the shard_map
    # wrapper (parallel/flash.py). The fused block-tail kernel has no
    # sharded wrapper and stays off in those modes.
    model_sharded = sharding_mode in ("spatial", "tensor")
    tokenizer, modules, params, _ = load_models(
        args.model_path,
        extra_num_tokens=args.extra_num_tokens,
        photoverse_path=ckpt,
        image_encoder_layers_idx=tuple(args.encoder_layers_idx),
        dtype=dtype,
        use_flash_attention=args.fast and on_tpu and not model_sharded,
        fast_attention_scores=args.fast,
        fast_norms=args.fast,
        fused_blocks=args.fast and on_tpu and not model_sharded,
        int8_conditioning=args.int8_conditioning,
        tp_friendly_ffn=sharding_mode == "tensor",
    )
    if args.bf16_params:
        from photoverse_tpu.models.assembly import cast_params

        params = cast_params(params, jnp.bfloat16)
    solver = make_solver(
        modules.schedule, args.scheduler, args.num_timesteps,
        use_karras_sigmas=args.karras_sigmas,
    )

    # latent size follows the VAE's downsampling depth; the CLIP branch
    # follows the vision encoder's configured input size
    latent_factor = 2 ** (len(modules.vae.config.block_out_channels) - 1)
    latent_size = args.resolution // latent_factor
    example = preprocess_image_for_inference(
        args.input_image_path, tokenizer, template=args.text,
        negative_prompt=args.negative_prompt, num_of_samples=args.num_of_samples,
        size=args.resolution, clip_size=modules.vision_encoder.config.image_size,
    )
    dev_example = {
        k: jnp.asarray(v)
        for k, v in example.items()
        if k in ("pixel_values", "pixel_values_clip", "text_input_ids",
                 "concept_placeholder_idx")
    }
    if example.get("negative_text_input_ids") is not None:
        dev_example["negative_text_input_ids"] = jnp.asarray(
            example["negative_text_input_ids"]
        )
    B = dev_example["pixel_values"].shape[0]
    uncond_ids = jnp.asarray(tokenizer([""] * B), jnp.int32)

    ip_mask = None
    if args.ip_adapter_mask_path:
        from PIL import Image as _Image

        m = _Image.open(args.ip_adapter_mask_path).convert("L")
        ip_mask = jnp.asarray(np.asarray(m), jnp.float32)[None] / 255.0
        ip_mask = jnp.repeat(ip_mask, B, axis=0)

    seed = args.seed if args.seed is not None else int.from_bytes(os.urandom(4), "little")

    lat_sh = None  # spatial-parallel latent sharding (set below)

    def gen(p, ex, un, mask, r):
        return run_inference(
            modules, p, solver, ex, r,
            guidance_scale=args.guidance_scale,
            token_index=0,
            latent_size=latent_size,
            from_noised_image=args.from_noised_image,
            uncond_input_ids=un,
            ip_mask=mask,
            latent_sharding=lat_sh,
        )

    n_dev = len(jax.devices())
    if sharding_mode != "none" and n_dev == 1:
        # sharding requested but only one device visible (chip contention,
        # misconfigured host): fall back to the single-device pipeline —
        # and re-enable the fast paths load_models disabled in anticipation
        # of the shard_map wrapper, instead of silently running jnp attention
        restored = ""
        if model_sharded and args.fast and on_tpu:
            import dataclasses as _dc

            modules = _dc.replace(
                modules,
                unet=modules.unet.clone(config=_dc.replace(
                    modules.unet.config,
                    use_flash_attention=True,
                    fused_blocks=True,
                )),
            )
            restored = " with flash/fused fast paths re-enabled"
        print(f"WARNING: --sharding {sharding_mode} requires >1 device "
              f"(found 1); running single-device{restored}")
    if sharding_mode != "none" and n_dev > 1:
        # GSPMD multi-chip execution (tests/test_parallel.py,
        # tests/test_tp.py prove all three modes match single-device):
        #   data    — 1-D batch sharding; rows are independent end-to-end
        #   spatial — latent height over the model axis (parallel/sp.py):
        #             halo-exchanged convs + gathered-KV attention; the
        #             only mode that speeds up batch-1 latency
        #   tensor  — Megatron heads/FFN weight sharding (parallel/tp.py)
        from photoverse_tpu.parallel.mesh import (
            batch_sharding, replicated, shard_batch,
        )
        from photoverse_tpu.parallel.sp import (
            latent_spatial_sharding, validate_sp,
        )
        from photoverse_tpu.parallel.tp import (
            bundle_tp_shardings, make_mesh_2d, validate_tp,
        )

        if sharding_mode == "data":
            dp, mp = n_dev, 1
        else:
            mp = args.model_parallel or n_dev
            dp = max(n_dev // mp, 1)
        mesh = make_mesh_2d(dp, mp)
        if args.fast and on_tpu and model_sharded:
            # restore the flash fast path under TP/SP via the shard_map
            # wrapper now that the mesh exists (parallel/flash.py); `gen`
            # closes over `modules` and traces after this rebind
            from photoverse_tpu.parallel.flash import enable_sharded_flash

            modules = enable_sharded_flash(modules, mesh, sharding_mode)
        pad = (-B) % dp
        if pad:
            dev_example = {
                k: jnp.concatenate([v, jnp.repeat(v[-1:], pad, 0)])
                for k, v in dev_example.items()
            }
            uncond_ids = jnp.concatenate(
                [uncond_ids, jnp.repeat(uncond_ids[-1:], pad, 0)]
            )
            if ip_mask is not None:
                ip_mask = jnp.concatenate(
                    [ip_mask, jnp.repeat(ip_mask[-1:], pad, 0)]
                )
        repl, bs = replicated(mesh), batch_sharding(mesh)
        if sharding_mode == "tensor":
            validate_tp(modules.unet.config, mp)
            psh = bundle_tp_shardings(mesh, params)
            params = jax.tree.map(jax.device_put, params, psh)
        else:
            psh = repl
            params = jax.device_put(params, repl)
        if sharding_mode == "spatial":
            validate_sp(modules.unet.config, latent_size, mp)
            lat_sh = latent_spatial_sharding(mesh)
        dev_example = shard_batch(mesh, dev_example)
        uncond_ids = jax.device_put(uncond_ids, bs)
        if ip_mask is not None:
            ip_mask = jax.device_put(ip_mask, bs)
        mask_sh = bs if ip_mask is not None else repl
        out_sh = lat_sh if lat_sh is not None else bs
        images = jax.jit(
            gen,
            in_shardings=(psh, {k: bs for k in dev_example}, bs, mask_sh, repl),
            out_shardings=out_sh,
        )(params, dev_example, uncond_ids, ip_mask, jax.random.PRNGKey(seed))
        images = images[:B]
    else:
        images = jax.jit(gen)(
            params, dev_example, uncond_ids, ip_mask, jax.random.PRNGKey(seed)
        )

    os.makedirs(args.results_dir, exist_ok=True)
    for idx, img in enumerate(np.asarray(images)):
        to_pil(denormalize(img)).save(
            os.path.join(args.results_dir, f"{args.output_image_path}{idx}.png")
        )
    print(f"saved {len(images)} image(s) to {args.results_dir}")


if __name__ == "__main__":
    main()
