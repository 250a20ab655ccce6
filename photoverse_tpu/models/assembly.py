"""Model assembly — the single load/build point both CLIs share.

TPU-native counterpart of `load_models` (/root/reference/models/
modeling_utils.py:53-95): builds the six-model bundle (tokenizer, CLIP text,
VAE, UNet, CLIP vision, dual adapters) plus the DDPM schedule, optionally
loading converted SD-1.5 weights from a local diffusers-layout checkpoint
directory and a PhotoVerse `.pt` training checkpoint.

"Freezing" is structural here: trainable parameters (adapters + attn2
q/k/v/LoRA/ip projections) live in a separate pytree partition — see
photoverse_tpu.ckpt.checkpoint.trainable_partition — so the optimizer never
sees backbone weights, mirroring modeling_utils.py:62-88.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from photoverse_tpu.core.schedulers import DDPMSchedule, make_sd15_schedule
from photoverse_tpu.models.adapters import PhotoVerseAdapter
from photoverse_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextEncoder,
    CLIPVisionConfig,
    CLIPVisionEncoder,
)
from photoverse_tpu.models.unet import UNet2DCondition, UNetConfig
from photoverse_tpu.models.vae import AutoencoderKL, VAEConfig

__all__ = ["PhotoVerseModules", "PhotoVerseParams", "build_models", "load_models"]


@dataclasses.dataclass(frozen=True)
class PhotoVerseModules:
    """Static module definitions (hashable; safe as a jit static arg)."""

    text_encoder: CLIPTextEncoder
    vision_encoder: CLIPVisionEncoder
    unet: UNet2DCondition
    vae: AutoencoderKL
    text_adapter: PhotoVerseAdapter
    image_adapter: PhotoVerseAdapter
    schedule: DDPMSchedule
    image_encoder_layers_idx: Tuple[int, ...] = (4, 8, 12, 16)

    @property
    def num_tokens(self) -> int:
        return len(self.image_encoder_layers_idx) + 1

    @property
    def scaling_factor(self) -> float:
        return self.vae.config.scaling_factor


@dataclasses.dataclass
class PhotoVerseParams:
    """Parameter pytrees, one per model (registered as a jax pytree)."""

    text_encoder: Any
    vision_encoder: Any
    unet: Any
    vae: Any
    text_adapter: Any
    image_adapter: Any


jax.tree_util.register_dataclass(
    PhotoVerseParams,
    data_fields=[
        "text_encoder",
        "vision_encoder",
        "unet",
        "vae",
        "text_adapter",
        "image_adapter",
    ],
    meta_fields=[],
)


def build_models(
    extra_num_tokens: int = 4,
    image_encoder_layers_idx: Tuple[int, ...] = (4, 8, 12, 16),
    lora_rank: int = 0,
    lora_alpha: float = 1.0,
    lora_dropout: float = 0.0,
    dtype: jnp.dtype = jnp.float32,
    use_flash_attention: bool = False,
    fast_attention_scores: bool = False,
    fast_norms: bool = False,
    fast_norm_reductions: bool = False,
    fused_blocks: bool = False,
    int8_conditioning: bool = False,
    tp_friendly_ffn: bool = False,
    unet_config: Optional[UNetConfig] = None,
    vae_config: Optional[VAEConfig] = None,
    text_config: Optional[CLIPTextConfig] = None,
    vision_config: Optional[CLIPVisionConfig] = None,
) -> PhotoVerseModules:
    """Construct module definitions at SD-1.5 scale (or overridden configs)."""
    unet_cfg = unet_config or UNetConfig(
        lora_rank=lora_rank, lora_alpha=lora_alpha, lora_dropout=lora_dropout,
        use_flash_attention=use_flash_attention,
        fast_attention_scores=fast_attention_scores,
        fast_norms=fast_norms,
        fast_norm_reductions=fast_norm_reductions,
        fused_blocks=fused_blocks,
        tp_friendly_ffn=tp_friendly_ffn,
    )
    if unet_config is not None and tp_friendly_ffn:
        unet_cfg = dataclasses.replace(unet_cfg, tp_friendly_ffn=True)
    vae_cfg = vae_config or VAEConfig(
        use_flash_attention=use_flash_attention, fast_norms=fast_norms,
        fast_norm_reductions=fast_norm_reductions,
    )
    text_cfg = text_config or CLIPTextConfig()
    vision_cfg = vision_config or CLIPVisionConfig()
    if int8_conditioning:
        # W8A8 MXU path for the frozen conditioning encoders (ops/quant.py);
        # inference-only — round() has zero gradient
        text_cfg = dataclasses.replace(text_cfg, int8_dense=True)
        vision_cfg = dataclasses.replace(vision_cfg, int8_dense=True)
    num_tokens = extra_num_tokens + 1
    return PhotoVerseModules(
        text_encoder=CLIPTextEncoder(config=text_cfg, dtype=dtype),
        vision_encoder=CLIPVisionEncoder(config=vision_cfg, dtype=dtype),
        unet=UNet2DCondition(config=unet_cfg, dtype=dtype),
        vae=AutoencoderKL(config=vae_cfg, dtype=dtype),
        text_adapter=PhotoVerseAdapter(
            clip_embedding_dim=vision_cfg.hidden_size,
            cross_attention_dim=unet_cfg.cross_attention_dim,
            num_tokens=num_tokens,
            dtype=dtype,
        ),
        image_adapter=PhotoVerseAdapter(
            clip_embedding_dim=vision_cfg.hidden_size,
            cross_attention_dim=unet_cfg.cross_attention_dim,
            num_tokens=num_tokens,
            dtype=dtype,
        ),
        schedule=make_sd15_schedule(),
        image_encoder_layers_idx=tuple(image_encoder_layers_idx),
    )


def _numpy_fill(shape_tree, seed: int):
    """Fill a ShapeDtypeStruct tree with numpy-initialized arrays.

    Running `module.init` at SD scale is a full trace+compile of the model
    graph (measured 310s through the TPU tunnel, minutes on the 1-core
    host), so instead the shapes come from `jax.eval_shape` (abstract, no
    compile) and the values from numpy, matching flax's defaults by param
    name/shape: zeros for biases/lora_B, ones for norm scales/BN var,
    N(0, 0.02) for embeddings, fan-in-scaled init for kernels."""
    rng = np.random.default_rng(seed)

    def fill(path, sds):
        names = [getattr(p, "key", "") for p in path]
        name = names[-1]
        shape, dtype = sds.shape, sds.dtype

        def arr(x):
            return jnp.asarray(np.asarray(x, dtype=np.float32), dtype=dtype)

        if name in ("bias",) or name.endswith("_b") or name == "mean":
            return arr(np.zeros(shape))
        if name in ("scale", "var") or name.endswith("_g"):
            return arr(np.ones(shape))
        if name == "lora_B":
            return arr(np.zeros(shape))
        if "prelu" in names or name == "weight":
            return arr(np.full(shape, 0.25))
        if "embedding" in name:
            return arr(rng.standard_normal(shape, dtype=np.float32) * 0.02)
        if name == "lora_A":
            lim = np.sqrt(6.0 / shape[0])
            return arr(rng.uniform(-lim, lim, shape))
        if len(shape) >= 2:  # dense/conv/stacked kernels: lecun normal
            fan_in = int(np.prod(shape[:-1])) if len(shape) != 3 else shape[-2]
            if len(shape) == 4:  # conv (kh, kw, in, out)
                fan_in = shape[0] * shape[1] * shape[2]
            elif len(shape) == 2:
                fan_in = shape[0]
            return arr(
                rng.standard_normal(shape, dtype=np.float32)
                * np.float32(np.sqrt(1.0 / max(fan_in, 1)))
            )
        return arr(np.zeros(shape))

    return jax.tree_util.tree_map_with_path(fill, shape_tree)


def init_params(
    modules: PhotoVerseModules, rng: jax.Array, latent_size: int = 64,
) -> PhotoVerseParams:
    """Random-initialized parameter bundle (shapes at SD scale by default)."""
    ks = jax.random.split(rng, 6)
    t_cfg = modules.text_encoder.config
    v_cfg = modules.vision_encoder.config
    u_cfg = modules.unet.config
    K = modules.num_tokens
    ids = jnp.zeros((1, t_cfg.max_position_embeddings), jnp.int32)
    seed = int(np.asarray(jax.random.key_data(ks[0]))[-1])
    shapes = {}
    shapes["text_encoder"] = jax.eval_shape(
        lambda: modules.text_encoder.init(ks[0], ids)["params"]
    )
    px = jnp.zeros((1, v_cfg.image_size, v_cfg.image_size, 3))
    shapes["vision_encoder"] = jax.eval_shape(
        lambda: modules.vision_encoder.init(ks[1], px)["params"]
    )
    sample = jnp.zeros((1, latent_size, latent_size, u_cfg.in_channels))
    text_ctx = jnp.zeros((1, t_cfg.max_position_embeddings, u_cfg.cross_attention_dim))
    id_ctx = jnp.zeros((1, K, u_cfg.cross_attention_dim))
    shapes["unet"] = jax.eval_shape(
        lambda: modules.unet.init(
            ks[2], sample, jnp.zeros((1,), jnp.int32), text_ctx, id_ctx
        )["params"]
    )
    img = jnp.zeros((1, latent_size * 8, latent_size * 8, 3))
    shapes["vae"] = jax.eval_shape(lambda: modules.vae.init(ks[3], img, ks[3])["params"])
    embs = jnp.zeros((K, 1, v_cfg.seq_len, v_cfg.hidden_size))
    shapes["text_adapter"] = jax.eval_shape(
        lambda: modules.text_adapter.init(ks[4], embs)["params"]
    )
    shapes["image_adapter"] = jax.eval_shape(
        lambda: modules.image_adapter.init(ks[5], embs)["params"]
    )
    return PhotoVerseParams(
        **{name: _numpy_fill(tree, seed + i)
           for i, (name, tree) in enumerate(shapes.items())}
    )


def _load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pt/.bin/.safetensors file into a numpy dict (host-side)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


def _read_json(folder: str, name: str = "config.json") -> Optional[dict]:
    import json

    p = os.path.join(folder, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _configs_from_checkpoint(root: str, lora_rank, lora_alpha, lora_dropout):
    """Derive module configs from the diffusers/transformers config.json
    files when present (so non-SD-1.5-scale checkpoints load correctly)."""
    u = _read_json(os.path.join(root, "unet")) or {}
    v = _read_json(os.path.join(root, "vae")) or {}
    t = _read_json(os.path.join(root, "text_encoder")) or {}
    unet_cfg = UNetConfig(
        in_channels=u.get("in_channels", 4),
        out_channels=u.get("out_channels", 4),
        block_out_channels=tuple(u.get("block_out_channels", (320, 640, 1280, 1280))),
        layers_per_block=u.get("layers_per_block", 2),
        cross_attention_dim=u.get("cross_attention_dim", 768),
        num_heads=(
            u["attention_head_dim"]
            if isinstance(u.get("attention_head_dim"), int)
            else 8
        ),
        norm_num_groups=u.get("norm_num_groups", 32),
        lora_rank=lora_rank,
        lora_alpha=lora_alpha,
        lora_dropout=lora_dropout,
    )
    vae_cfg = VAEConfig(
        in_channels=v.get("in_channels", 3),
        out_channels=v.get("out_channels", 3),
        latent_channels=v.get("latent_channels", 4),
        block_out_channels=tuple(v.get("block_out_channels", (128, 256, 512, 512))),
        layers_per_block=v.get("layers_per_block", 2),
        norm_num_groups=v.get("norm_num_groups", 32),
        scaling_factor=v.get("scaling_factor", 0.18215),
    )
    text_cfg = CLIPTextConfig(
        vocab_size=t.get("vocab_size", 49408),
        hidden_size=t.get("hidden_size", 768),
        num_layers=t.get("num_hidden_layers", 12),
        num_heads=t.get("num_attention_heads", 12),
        intermediate_size=t.get("intermediate_size", 3072),
        max_position_embeddings=t.get("max_position_embeddings", 77),
    )
    return unet_cfg, vae_cfg, text_cfg


def _vision_config_from(folder: str) -> CLIPVisionConfig:
    c = _read_json(folder) or {}
    if "vision_config" in c:
        c = c["vision_config"]
    return CLIPVisionConfig(
        hidden_size=c.get("hidden_size", 1024),
        num_layers=c.get("num_hidden_layers", 24),
        num_heads=c.get("num_attention_heads", 16),
        intermediate_size=c.get("intermediate_size", 4096),
        image_size=c.get("image_size", 224),
        patch_size=c.get("patch_size", 14),
    )


def _schedule_from(root: str) -> DDPMSchedule:
    c = _read_json(os.path.join(root, "scheduler"), "scheduler_config.json")
    if c is None:
        return make_sd15_schedule()
    return DDPMSchedule.create(
        num_train_timesteps=c.get("num_train_timesteps", 1000),
        beta_start=c.get("beta_start", 0.00085),
        beta_end=c.get("beta_end", 0.012),
        beta_schedule=c.get("beta_schedule", "scaled_linear"),
        prediction_type=c.get("prediction_type", "epsilon"),
        steps_offset=c.get("steps_offset", 1),
    )


def _find_weight_file(folder: str) -> str:
    for name in (
        "diffusion_pytorch_model.safetensors",
        "diffusion_pytorch_model.bin",
        "model.safetensors",
        "pytorch_model.bin",
    ):
        p = os.path.join(folder, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"no weight file found under {folder}")


def load_models(
    pretrained_model_name_or_path: str,
    extra_num_tokens: int = 4,
    photoverse_path: Optional[str] = None,
    use_lora: bool = False,
    lora_rank: int = 8,
    lora_alpha: float = 1.0,
    lora_dropout: float = 0.0,
    image_encoder_path: Optional[str] = None,
    image_encoder_layers_idx: Tuple[int, ...] = (4, 8, 12, 16),
    dtype: jnp.dtype = jnp.float32,
    use_flash_attention: bool = False,
    fast_attention_scores: bool = False,
    fast_norms: bool = False,
    fast_norm_reductions: bool = False,
    fused_blocks: bool = False,
    int8_conditioning: bool = False,
    tp_friendly_ffn: bool = False,
    seed: int = 0,
):
    """Full load path mirroring modeling_utils.py:53-95 for local checkpoints.

    `pretrained_model_name_or_path` must be a local diffusers-layout SD-1.5
    directory (tokenizer/ text_encoder/ vae/ unet/ subfolders).
    `image_encoder_path` points at a local CLIP ViT-L/14 (defaults to the
    `image_encoder` subfolder if present). Returns
    (tokenizer, modules, params, lora_config_dict).
    """
    from photoverse_tpu.convert.torch_to_jax import (
        convert_clip_text,
        convert_clip_vision,
        convert_strict,
        convert_vae,
    )
    from photoverse_tpu.data.tokenizer import CLIPTokenizer

    root = pretrained_model_name_or_path
    tokenizer = CLIPTokenizer.from_pretrained(root, subfolder="tokenizer")
    ie_path = image_encoder_path or os.path.join(root, "image_encoder")
    if photoverse_path is not None and not use_lora:
        # the checkpoint knows whether it was trained with LoRA — re-inject
        # from its saved config like the reference (modeling_utils.py:16-18);
        # without this a LoRA checkpoint would silently lose both its LoRA
        # deltas AND its trained base q/k/v weights (the rank-0 tree has no
        # slots for either)
        from photoverse_tpu.ckpt.checkpoint import peek_lora_config

        saved_lora = peek_lora_config(photoverse_path)
        if saved_lora is not None:
            use_lora = True
            lora_rank = int(saved_lora.get("r", lora_rank))
            lora_alpha = float(saved_lora.get("lora_alpha", lora_alpha))
            lora_dropout = float(saved_lora.get("lora_dropout", lora_dropout))
    unet_cfg, vae_cfg, text_cfg = _configs_from_checkpoint(
        root, lora_rank if use_lora else 0, lora_alpha, lora_dropout,
    )
    unet_cfg = dataclasses.replace(
        unet_cfg,
        use_flash_attention=use_flash_attention,
        fast_attention_scores=fast_attention_scores,
        fast_norms=fast_norms,
        fast_norm_reductions=fast_norm_reductions,
        fused_blocks=fused_blocks,
        tp_friendly_ffn=tp_friendly_ffn,
    )
    # the VAE decoder's 4096-token attention uses the streaming flash kernel
    # under the same flag; its GroupNorms follow fast_norms
    vae_cfg = dataclasses.replace(
        vae_cfg, use_flash_attention=use_flash_attention, fast_norms=fast_norms,
        fast_norm_reductions=fast_norm_reductions,
    )
    modules = build_models(
        extra_num_tokens=extra_num_tokens,
        image_encoder_layers_idx=image_encoder_layers_idx,
        dtype=dtype,
        int8_conditioning=int8_conditioning,
        unet_config=unet_cfg,
        vae_config=vae_cfg,
        text_config=text_cfg,
        vision_config=_vision_config_from(ie_path),
    )
    modules = dataclasses.replace(modules, schedule=_schedule_from(root))
    # param shapes are spatial-size independent; init at a small latent size
    params = init_params(modules, jax.random.PRNGKey(seed), latent_size=8)

    def as_jnp(tree):
        return jax.tree.map(lambda x: jnp.asarray(x, dtype=jnp.float32), tree)

    # strict conversion: error on any checkpoint key the converter does not
    # consume (missing keys already raise) — guards against silent key drift
    text_sd = _load_torch_state_dict(_find_weight_file(os.path.join(root, "text_encoder")))
    params.text_encoder = as_jnp(
        convert_strict(
            convert_clip_text, text_sd,
            num_layers=modules.text_encoder.config.num_layers,
        )
    )
    vae_sd = _load_torch_state_dict(_find_weight_file(os.path.join(root, "vae")))
    params.vae = as_jnp(
        convert_strict(
            convert_vae, vae_sd,
            block_out_channels=modules.vae.config.block_out_channels,
            layers_per_block=modules.vae.config.layers_per_block,
        )
    )
    unet_sd = _load_torch_state_dict(_find_weight_file(os.path.join(root, "unet")))
    # fresh PhotoVerse ip projections are not in the SD checkpoint — seed them
    # from the existing init, then overlay converted base weights
    params.unet = _merge_unet(params.unet, unet_sd, modules)

    vis_sd = _load_torch_state_dict(_find_weight_file(ie_path))
    # strict like the others; a full-CLIPModel dump's text tower / projection
    # heads are legitimately absent from a vision encoder, so they are ignored
    params.vision_encoder = as_jnp(
        convert_strict(
            convert_clip_vision, vis_sd,
            ignore=("position_ids", "text_model", "text_projection",
                    "visual_projection", "logit_scale"),
            num_layers=modules.vision_encoder.config.num_layers,
        )
    )

    lora_config = (
        {
            "r": lora_rank,
            "lora_alpha": lora_alpha,
            "lora_dropout": lora_dropout,
            "bias": "none",
            "target_modules": ["attn2.to_k", "attn2.to_v", "attn2.to_q"],
        }
        if use_lora
        else None
    )

    if photoverse_path is not None:
        from photoverse_tpu.ckpt.checkpoint import load_photoverse_checkpoint

        params, lora_config = load_photoverse_checkpoint(
            photoverse_path, modules, params
        )
    return tokenizer, modules, params, lora_config


def cast_params(params, dtype=jnp.bfloat16):
    """Cast every floating leaf of a param tree to `dtype` (serving knob).

    Storing the serving tree in bf16 halves the per-eval HBM weight read
    that f32-stored params pay before the bf16 compute dtype kicks in
    (the reference keeps serving weights in the compute dtype implicitly
    via torch .half()/autocast). Measured on v5e: batch-1 512px 50-step
    generation 0.843 -> 0.783 s/image (+7.6%), max abs pixel deviation
    0.035 (PERFORMANCE.md round-4). Inference-only: training keeps f32
    master weights for the optimizer.
    """
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        params,
    )


def _merge_unet(init_unet_params, unet_sd, modules: PhotoVerseModules):
    """Overlay converted diffusers UNet weights onto an initialized tree,
    keeping the randomly-initialized PhotoVerse ip projections for keys the
    plain SD checkpoint does not contain."""
    from photoverse_tpu.convert.torch_to_jax import convert_unet

    sd = dict(unet_sd)
    # synthesize missing PhotoVerse processor keys from the init tree so the
    # converter sees a complete dict
    flat = jax.tree_util.tree_flatten_with_path(init_unet_params)[0]
    for path, leaf in flat:
        keys = [p.key for p in path]
        if "to_k_ip" in keys or "to_v_ip" in keys:
            # my path down_0_attn_0/attn2/to_k_ip/kernel -> diffusers-ish key
            block = keys[0]
            proj = keys[2]
            dk = _block_to_diffusers(block) + f".transformer_blocks.0.attn2.processor.{proj}.0.weight"
            if dk not in sd:
                sd[dk] = np.asarray(leaf).T
    from photoverse_tpu.convert.torch_to_jax import convert_strict

    cfg = modules.unet.config
    # strict: a renamed/extra tensor in the UNet dump must fail loudly, not
    # silently keep the random init (LoRA keys may be absent from the
    # converter's output when the model was built without LoRA slots — they
    # come in later through load_photoverse_checkpoint, never through the
    # base SD checkpoint)
    converted = convert_strict(
        convert_unet, sd,
        ignore=("position_ids", "num_batches_tracked", "lora_A", "lora_B",
                "base_layer"),
        block_out_channels=cfg.block_out_channels,
        layers_per_block=cfg.layers_per_block,
    )
    converted = jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), converted)
    # keep LoRA params from init when the checkpoint has none
    return _overlay(init_unet_params, converted)


def _block_to_diffusers(block: str) -> str:
    if block == "mid_attn":
        return "mid_block.attentions.0"
    kind, i, _, j = block.split("_")
    return f"{kind}_blocks.{i}.attentions.{j}"


def _overlay(base, new):
    """Recursively replace leaves of `base` with matching leaves of `new`."""
    if not isinstance(base, dict):
        return new if new is not None else base
    out = {}
    for k, v in base.items():
        if isinstance(new, dict) and k in new:
            out[k] = _overlay(v, new[k])
        else:
            out[k] = v
    return out
