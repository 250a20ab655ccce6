"""Inference engine: dual-conditioned CFG denoising as one jitted scan.

TPU-native counterpart of `run_inference` (/root/reference/models/
infer.py:7-123). Differences by design:

  - The Python over-timesteps loop with two sequential UNet calls per step
    (infer.py:98-119) becomes a single `lax.scan` whose body makes ONE
    batched UNet call over [uncond; cond] (2B) — better MXU utilization and
    one compiled program for the whole trajectory.
  - With guidance_scale == 1 the CFG mix equals the conditional prediction
    exactly, so the unconditional branch is skipped statically (the reference
    still evaluates it; this halves the denoise FLOPs in its default config,
    README.md:79 / generate.py:25).
  - Conditioning (CLIP image features at layers [4,8,12,16]+last, both
    adapters with token_index=0 by default, text encoder with/without
    injection — infer.py:76-96) is computed once, outside the scan.
  - `training_mode` (grad through the final step only, infer.py:99) is
    implemented in engine.training via stop_gradient on the scanned prefix
    plus one differentiable trailing step.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from photoverse_tpu.core.schedulers import DPMSolverMultistep
from photoverse_tpu.models.assembly import PhotoVerseModules, PhotoVerseParams

__all__ = [
    "encode_condition",
    "precompute_ctx_kv",
    "precompute_fused_bundles",
    "denoise",
    "run_inference",
]


def _cross_layer_names(cfg):
    """Cross-attention block names in UNet call order."""
    ch = cfg.block_out_channels
    n = len(ch)
    names = []
    for i, c in enumerate(ch):
        if i < n - 1:
            for j in range(cfg.layers_per_block):
                names.append((f"down_{i}_attn_{j}", c))
    names.append(("mid_attn", ch[-1]))
    for i, c in enumerate(reversed(ch)):
        if i > 0:
            for j in range(cfg.layers_per_block + 1):
                names.append((f"up_{i}_attn_{j}", c))
    return names


def precompute_ctx_kv(
    modules: PhotoVerseModules,
    params: PhotoVerseParams,
    text_ctx: jnp.ndarray,  # (B, St, cross_dim)
    id_ctx: jnp.ndarray,  # (B, K, cross_dim)
):
    """Per-layer (k, v, k_ip, v_ip) for every cross-attention layer.

    The conditioning contexts are constant across the whole denoise
    trajectory, so these 4 projections x 16 layers are hoisted out of the
    50-step scan (the reference recomputes them inside every UNet call,
    attention_processor.py:304-305,392-393).
    """
    cfg = modules.unet.config
    H = cfg.num_heads
    B = text_ctx.shape[0]
    out = []
    for name, c in _cross_layer_names(cfg):
        a = params.unet[name]["attn2"]
        d = c // H

        def proj(p, ctx):
            y = ctx @ p["base"]["kernel"] if "base" in p else ctx @ p["kernel"]
            if "lora_A" in p and cfg.lora_rank > 0:
                y = y + ((ctx @ p["lora_A"]) @ p["lora_B"]) * (
                    cfg.lora_alpha / cfg.lora_rank
                )
            return y

        k = proj(a["to_k"], text_ctx).reshape(B, -1, H, d)
        v = proj(a["to_v"], text_ctx).reshape(B, -1, H, d)
        k_ip = (id_ctx @ a["to_k_ip"]["kernel"]).reshape(B, -1, H, d)
        v_ip = (id_ctx @ a["to_v_ip"]["kernel"]).reshape(B, -1, H, d)
        out.append((k, v, k_ip, v_ip))
    return tuple(out)


def precompute_fused_bundles(
    modules: PhotoVerseModules,
    params: PhotoVerseParams,
    kv_cache,
):
    """Per-layer weight+context bundles for the fused block-tail kernel
    (ops/fused_block.py) — None for layers whose weight set exceeds VMEM.

    Like the ctx K/V cache, bundles are loop-invariant across the denoise
    scan: built once per call from pure reshapes of params.unet plus a
    per-head transpose of the hoisted contexts.
    """
    from photoverse_tpu.ops.fused_block import (
        attach_ctx,
        build_block_bundle,
        bundle_eligible,
    )

    cfg = modules.unet.config
    dtype = modules.unet.dtype  # weights staged in the model compute dtype
    out = []
    for (name, c), kv in zip(_cross_layer_names(cfg), kv_cache):
        if bundle_eligible(c, cfg.num_heads, cfg.fused_block_max_channels):
            b = build_block_bundle(
                params.unet[name],
                cfg.num_heads,
                lora_rank=cfg.lora_rank,
                lora_alpha=cfg.lora_alpha,
                dtype=dtype,
            )
            out.append(attach_ctx(b, kv, dtype))
        else:
            out.append(None)
    return tuple(out)


def encode_condition(
    modules: PhotoVerseModules,
    params: PhotoVerseParams,
    pixel_values_clip: jnp.ndarray,  # (B, H, W, 3) NHWC, CLIP-normalized
    token_index: Optional[int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CLIP-vision features -> (concept_text_embeddings, id_ctx).

    Stacks [last_hidden] + hidden_states[layers_idx] (K feature sets,
    reference train.py:488-492) and runs both adapters. Features are
    stop-gradiented like the reference's .detach() (train.py:492).
    """
    last, collected = modules.vision_encoder.apply(
        {"params": params.vision_encoder},
        pixel_values_clip,
        collect_layers=modules.image_encoder_layers_idx,
    )
    feats = jnp.stack([last, *collected], axis=0)  # (K, B, S, D)
    feats = jax.lax.stop_gradient(feats)
    concept = modules.text_adapter.apply(
        {"params": params.text_adapter}, feats, token_index=token_index
    )
    id_ctx = modules.image_adapter.apply(
        {"params": params.image_adapter}, feats, token_index=token_index
    )
    return concept, id_ctx


def denoise(
    modules: PhotoVerseModules,
    params: PhotoVerseParams,
    solver: DPMSolverMultistep,
    latents: jnp.ndarray,  # (B, h, w, 4)
    text_ctx: jnp.ndarray,  # (B, 77, 768) conditional
    id_ctx: jnp.ndarray,  # (B, K, 768) conditional
    uncond_text_ctx: Optional[jnp.ndarray],
    uncond_id_ctx: Optional[jnp.ndarray],
    guidance_scale: float,
    num_grad_steps: int = 0,
    ip_mask: Optional[jnp.ndarray] = None,  # (B, Hm, Wm) identity mask
    train: bool = False,
    fusion_rng: Optional[jax.Array] = None,
    dropout_rng: Optional[jax.Array] = None,
    latent_sharding=None,  # NamedSharding for (B, h, w, 4): spatial parallelism
    ancestral_keys: Optional[jax.Array] = None,  # (B,) per-row keys, ancestral solvers
) -> jnp.ndarray:
    """Full DPM-Solver++ trajectory; optionally the last `num_grad_steps`
    steps run outside the scan with gradients enabled (reference
    infer.py:99 uses exactly one).

    When `train=True`, the gradient-carrying trailing steps run the UNet in
    training mode — stochastic fusion (per-layer, keyed off `fusion_rng`
    folded by step index) and active LoRA dropout — mirroring the reference,
    where `torch.is_grad_enabled()` is True on exactly those steps
    (attention_processor.py:410-420, infer.py:99). The no-grad scanned
    prefix always uses eval fusion (deterministic sum), like the
    reference's `torch.no_grad()` prefix.
    """
    use_cfg = guidance_scale != 1.0 and uncond_text_ctx is not None
    B = latents.shape[0]
    if train and num_grad_steps > 0 and fusion_rng is None:
        raise ValueError("train=True grad steps require fusion_rng")
    is_ancestral = solver.is_ancestral
    if is_ancestral and ancestral_keys is None:
        raise ValueError(
            "ancestral solver (noise per step) requires ancestral_keys — "
            "one key per batch row so a row's trajectory is independent of "
            "batch placement (run_inference derives them from rng by default)"
        )

    def _step_noise(i):
        # per-ROW noise: fold the step index into each row's own key, so a
        # coalesced batch's rows depend only on their request seed
        row_shape = latents.shape[1:]
        return jax.vmap(
            lambda k: jax.random.normal(
                jax.random.fold_in(k, i), row_shape, latents.dtype
            )
        )(ancestral_keys)

    # hoist the loop-invariant context K/V projections out of the scan; the
    # scanned prefix is stop-gradiented (or grad-free), so the cache never
    # carries gradients. Grad-enabled trailing steps recompute projections
    # so gradients flow into to_k/to_v/to_k_ip/to_v_ip and LoRA.
    if use_cfg:
        text2 = jnp.concatenate([uncond_text_ctx, text_ctx], axis=0)
        id2 = jnp.concatenate([uncond_id_ctx, id_ctx], axis=0)
        mask2 = (
            None if ip_mask is None else jnp.concatenate([ip_mask, ip_mask], axis=0)
        )
        kv_cache = precompute_ctx_kv(modules, params, text2, id2)
        if num_grad_steps > 0:
            kv_cache = jax.lax.stop_gradient(kv_cache)
    else:
        kv_cache = precompute_ctx_kv(modules, params, text_ctx, id_ctx)
        if num_grad_steps > 0:
            kv_cache = jax.lax.stop_gradient(kv_cache)
    # fused block-tail bundles (eval fast path only: the kernel has no VJP,
    # so any gradient-carrying or training call keeps the jnp route)
    fused = None
    if (
        modules.unet.config.fused_blocks
        and not train
        and num_grad_steps == 0
        and ip_mask is None
    ):
        fused = precompute_fused_bundles(modules, params, kv_cache)

    def eps_fn(lat, t, step_train=False, step_rngs=None, use_cache=True):
        tb = jnp.broadcast_to(t, (B,))
        kw = {}
        if step_train:
            kw = dict(train=True, fusion_rng=step_rngs[0])
            rngs = {"dropout": step_rngs[1]}
        else:
            rngs = None
        if use_cfg:
            lat2 = jnp.concatenate([lat, lat], axis=0)
            eps2, _ = modules.unet.apply(
                {"params": params.unet},
                lat2,
                jnp.concatenate([tb, tb]),
                text2,
                id2,
                ip_mask=mask2,
                ctx_kv=kv_cache if use_cache else None,
                fused_bundles=fused if use_cache else None,
                rngs=rngs,
                **kw,
            )
            eps_u, eps_c = jnp.split(eps2, 2, axis=0)
            return eps_u + guidance_scale * (eps_c - eps_u)
        eps, _ = modules.unet.apply(
            {"params": params.unet}, lat, tb, text_ctx, id_ctx, ip_mask=ip_mask,
            ctx_kv=kv_cache if use_cache else None,
            fused_bundles=fused if use_cache else None, rngs=rngs, **kw,
        )
        return eps

    xs = solver.scan_inputs()
    n = solver.num_steps
    n_scan = max(n - num_grad_steps, 0)

    # spatial parallelism (parallel/sp.py): pin the scan carry to the
    # height-sharded layout so GSPMD partitions every UNet conv (halo
    # exchange) and runs attention with sharded queries / gathered K/V,
    # instead of collapsing the trajectory onto one device between steps
    constrain = (
        (lambda t: jax.lax.with_sharding_constraint(t, latent_sharding))
        if latent_sharding is not None
        else (lambda t: t)
    )

    # the scan carry is solver-defined ((x, m_prev) for the DPM/DDIM/Euler
    # family, (x, x_prev, m_prev, m_pp) for UniPC's predictor-corrector) —
    # every leaf is latent-shaped, so the spatial-parallel constraint maps
    # over the whole tuple
    c_all = lambda carry: jax.tree.map(constrain, carry)

    def _advance(x, carry, eps):
        carry = solver.advance(x, carry, eps)
        if is_ancestral:
            lat = solver.latent(carry)
            lat = lat + x["noise_sigma"].astype(lat.dtype) * _step_noise(x["i"])
            carry = solver.replace_latent(carry, lat)
        return c_all(carry)

    def body(carry, x):
        eps = eps_fn(solver.latent(carry), x["t"])
        return _advance(x, carry, eps), None

    carry = c_all(solver.init_carry(latents))
    if n_scan > 0:
        xs_scan = jax.tree.map(lambda v: v[:n_scan], xs)
        carry, _ = jax.lax.scan(body, carry, xs_scan)
        if num_grad_steps > 0:
            carry = jax.lax.stop_gradient(carry)
    for i in range(n_scan, n):
        x = jax.tree.map(lambda v: v[i], xs)
        lat = solver.latent(carry)
        if train:
            step_key = jax.random.fold_in(fusion_rng, i)
            drop_key = (
                jax.random.fold_in(dropout_rng, i)
                if dropout_rng is not None
                else jax.random.fold_in(step_key, 0x5EED)
            )
            eps = eps_fn(
                lat, x["t"], step_train=True, step_rngs=(step_key, drop_key),
                use_cache=False,
            )
        else:
            eps = eps_fn(lat, x["t"], use_cache=False)
        carry = _advance(x, carry, eps)
    return solver.latent(carry)


def run_inference(
    modules: PhotoVerseModules,
    params: PhotoVerseParams,
    solver: DPMSolverMultistep,
    example: dict,
    rng: jax.Array,
    *,
    guidance_scale: float = 1.0,
    token_index: Optional[int] = 0,
    latent_size: int = 64,
    from_noised_image: bool = False,
    uncond_input_ids: Optional[jnp.ndarray] = None,
    num_grad_steps: int = 0,
    ip_mask: Optional[jnp.ndarray] = None,
    latent_sharding=None,  # NamedSharding: spatial parallelism (parallel/sp.py)
    initial_noise: Optional[jnp.ndarray] = None,
    ancestral_keys: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Generate images for a preprocessed example batch.

    example keys (NHWC device arrays): pixel_values (B,512,512,3 in [-1,1]),
    pixel_values_clip (B,224,224,3), text_input_ids (B,77),
    concept_placeholder_idx (B,) or (B,1), optional negative_text_input_ids.
    Returns images (B, H, W, 3) in [-1, 1]. Pure function of (params, rng).

    `initial_noise` (B, latent, latent, in_channels) replaces the rng-drawn
    starting noise — callers that coalesce independently-seeded requests
    into one batch (cli/serve.py dynamic batching) draw each request's rows
    from its own key and concatenate, so a request's images do not depend
    on which batch it landed in. For ancestral solvers (Euler-a) the same
    invariant needs per-row `ancestral_keys` — derived from rng when absent;
    coalescing callers pass each request's own row keys.
    """
    px_clip = example["pixel_values_clip"]
    ids = example["text_input_ids"]
    pidx = example["concept_placeholder_idx"]
    B = px_clip.shape[0]
    noise_rng, vae_rng = jax.random.split(rng)

    if solver.is_ancestral and ancestral_keys is None:
        # folded off the caller's key so existing samplers' noise streams
        # stay byte-identical to before ancestral support existed
        ancestral_keys = jax.random.split(jax.random.fold_in(rng, 0xA9CE), B)

    in_ch = modules.unet.config.in_channels
    if initial_noise is not None:
        noise = initial_noise
    else:
        noise = jax.random.normal(noise_rng, (B, latent_size, latent_size, in_ch))

    if from_noised_image:
        # add_noise already lands on the step-0 marginal — init_noise_sigma
        # applies only to the pure-noise start (for DPM/DDIM it is 1.0; for
        # Euler grids it is sigma_max in VP space)
        lat = modules.vae.apply(
            {"params": params.vae},
            example["pixel_values"],
            vae_rng,
            method="encode_sample",
        )
        lat = jax.lax.stop_gradient(lat) * modules.scaling_factor
        latents = solver.add_noise(lat, noise, 0)
    else:
        latents = noise * solver.init_noise_sigma

    # conditional branch
    concept, id_ctx = encode_condition(modules, params, px_clip, token_index)
    text_ctx, _ = modules.text_encoder.apply(
        {"params": params.text_encoder}, ids, concept, pidx.reshape(B)
    )

    uncond_text_ctx = uncond_id_ctx = None
    if guidance_scale != 1.0:
        # unconditional: zeros image through the adapters, empty/negative prompt
        neg = example.get("negative_text_input_ids")
        if neg is None:
            neg = uncond_input_ids
        if neg is None:
            raise ValueError(
                "guidance_scale != 1 requires negative_text_input_ids or "
                "uncond_input_ids (tokenized empty prompt)"
            )
        _, uncond_id_ctx = encode_condition(
            modules, params, jnp.zeros_like(px_clip), token_index
        )
        uncond_text_ctx, _ = modules.text_encoder.apply(
            {"params": params.text_encoder}, neg
        )

    latents = denoise(
        modules,
        params,
        solver,
        latents,
        text_ctx,
        id_ctx,
        uncond_text_ctx,
        uncond_id_ctx,
        guidance_scale,
        num_grad_steps=num_grad_steps,
        ip_mask=ip_mask,
        latent_sharding=latent_sharding,
        ancestral_keys=ancestral_keys,
    )

    if latent_sharding is not None:
        # keep the decode input height-sharded so GSPMD spatially
        # partitions the VAE decoder too (halo-exchanged convs)
        latents = jax.lax.with_sharding_constraint(latents, latent_sharding)
    images = modules.vae.apply(
        {"params": params.vae}, latents / modules.scaling_factor, method="decode"
    )
    return jnp.clip(images, -1.0, 1.0)
