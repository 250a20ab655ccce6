"""Shared tiny-scale model bundle for engine/e2e tests (CPU-runnable)."""

import jax
import numpy as np

from photoverse_tpu.models.assembly import build_models, init_params
from photoverse_tpu.models.clip import CLIPTextConfig, CLIPVisionConfig
from photoverse_tpu.models.unet import UNetConfig
from photoverse_tpu.models.vae import VAEConfig

RES = 32  # image resolution; tiny VAE has one downsample -> 16x16 latents
LATENT = 16
SEQ = 12
VOCAB = 64


def tiny_bundle(lora_rank=0, seed=0):
    modules = build_models(
        extra_num_tokens=4,
        image_encoder_layers_idx=(1, 2, 3, 4),
        unet_config=UNetConfig(
            block_out_channels=(32, 64),
            layers_per_block=1,
            cross_attention_dim=16,
            num_heads=2,
            norm_num_groups=8,
            lora_rank=lora_rank,
        ),
        vae_config=VAEConfig(block_out_channels=(16, 32), norm_num_groups=8),
        text_config=CLIPTextConfig(
            vocab_size=VOCAB, hidden_size=16, num_layers=2, num_heads=2,
            intermediate_size=32, max_position_embeddings=SEQ,
        ),
        vision_config=CLIPVisionConfig(
            hidden_size=16, num_layers=4, num_heads=2, intermediate_size=32,
            image_size=16, patch_size=8,
        ),
    )
    params = init_params(modules, jax.random.PRNGKey(seed), latent_size=LATENT)
    return modules, params


def tiny_batch(B=2, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "pixel_values": rng.randn(B, RES, RES, 3).astype(np.float32),
        "pixel_values_clip": rng.randn(B, 16, 16, 3).astype(np.float32),
        "text_input_ids": rng.randint(0, VOCAB, (B, SEQ)).astype(np.int32),
        "concept_placeholder_idx": np.full((B,), 3, np.int32),
    }
