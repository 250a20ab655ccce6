"""Synthesize a random diffusers-layout checkpoint directory.

Benchmarks and integration drives need a loadable `--model_path` directory
(tokenizer/text_encoder/image_encoder/unet/vae/scheduler subfolders) even
where no real SD-1.5 weights exist (zero-egress environments). This writes
one at either toy or full SD-1.5 scale with random weights — throughput is
shape-dependent only, so the sd15 layout benches the REAL serving stack
(load_models conversion included) at production shapes.

  python scripts/make_random_checkpoint.py --out /tmp/sdscale --scale sd15
  python scripts/make_random_checkpoint.py --out /tmp/tiny --scale tiny

The tokenizer is the synthetic tiny-vocab CLIP BPE from tests/ (vocab size
does not affect compute shape; model_max_length is 77 at sd15 scale).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


SCALES = {
    # (text: hidden, layers, heads, inter, max_len) /
    # (vision: hidden, layers, heads, inter, image, patch) /
    # (unet: channels, layers_per_block, cross, heads, groups) /
    # (vae: channels, layers, groups)
    "tiny": {
        "text": (16, 2, 2, 32, 16),
        "vision": (16, 4, 2, 32, 16, 8),
        "unet": ((16, 32), 1, 16, 2, 8),
        "vae": ((16, 32), 2, 8),
    },
    # SD-1.5 / CLIP-L shapes (859.5M / 303M / 123M-at-real-vocab / 84M)
    "sd15": {
        "text": (768, 12, 12, 3072, 77),
        "vision": (1024, 24, 16, 4096, 224, 14),
        "unet": ((320, 640, 1280, 1280), 2, 768, 8, 32),
        "vae": ((128, 256, 512, 512), 2, 32),
    },
}


def make_checkpoint(out: str, scale: str = "sd15", seed: int = 0) -> str:
    import torch

    from tests.test_data import _tiny_tokenizer
    from tests.torch_ref_unet import RefUNet
    from tests.torch_ref_vae import RefVAE
    from transformers import (
        CLIPTextConfig,
        CLIPTextModel,
        CLIPVisionConfig,
        CLIPVisionModel,
    )

    cfg = SCALES[scale]
    torch.manual_seed(seed)
    root = pathlib.Path(out) / "sd"
    root.mkdir(parents=True, exist_ok=True)

    _tiny_tokenizer(root)
    t_h, t_l, t_heads, t_i, t_max = cfg["text"]
    (root / "tokenizer" / "tokenizer_config.json").write_text(
        json.dumps({"model_max_length": t_max})
    )
    tok_vocab = json.loads((root / "tokenizer" / "vocab.json").read_text())

    text = CLIPTextModel(CLIPTextConfig(
        vocab_size=len(tok_vocab), hidden_size=t_h, num_hidden_layers=t_l,
        num_attention_heads=t_heads, intermediate_size=t_i,
        max_position_embeddings=t_max, hidden_act="quick_gelu",
    ))
    (root / "text_encoder").mkdir(exist_ok=True)
    torch.save(text.state_dict(), root / "text_encoder" / "pytorch_model.bin")
    (root / "text_encoder" / "config.json").write_text(json.dumps({
        "vocab_size": len(tok_vocab), "hidden_size": t_h,
        "num_hidden_layers": t_l, "num_attention_heads": t_heads,
        "intermediate_size": t_i, "max_position_embeddings": t_max,
    }))
    del text

    v_h, v_l, v_heads, v_i, v_img, v_patch = cfg["vision"]
    vision = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=v_h, num_hidden_layers=v_l, num_attention_heads=v_heads,
        intermediate_size=v_i, image_size=v_img, patch_size=v_patch,
        hidden_act="quick_gelu",
    ))
    (root / "image_encoder").mkdir(exist_ok=True)
    torch.save(vision.state_dict(), root / "image_encoder" / "pytorch_model.bin")
    (root / "image_encoder" / "config.json").write_text(json.dumps({
        "hidden_size": v_h, "num_hidden_layers": v_l,
        "num_attention_heads": v_heads, "intermediate_size": v_i,
        "image_size": v_img, "patch_size": v_patch,
    }))
    del vision

    u_ch, u_lpb, u_cross, u_heads, u_groups = cfg["unet"]
    unet = RefUNet(
        block_out_channels=u_ch, layers_per_block=u_lpb, cross_dim=u_cross,
        heads=u_heads, groups=u_groups,
    )
    (root / "unet").mkdir(exist_ok=True)
    torch.save(unet.state_dict(), root / "unet" / "diffusion_pytorch_model.bin")
    (root / "unet" / "config.json").write_text(json.dumps({
        "in_channels": 4, "out_channels": 4,
        "block_out_channels": list(u_ch), "layers_per_block": u_lpb,
        "cross_attention_dim": u_cross, "attention_head_dim": u_heads,
        "norm_num_groups": u_groups,
    }))
    n_unet = sum(p.numel() for p in unet.parameters())
    del unet

    a_ch, a_layers, a_groups = cfg["vae"]
    vae = RefVAE(ch=a_ch, layers=a_layers, latent=4, groups=a_groups)
    (root / "vae").mkdir(exist_ok=True)
    torch.save(vae.state_dict(), root / "vae" / "diffusion_pytorch_model.bin")
    (root / "vae" / "config.json").write_text(json.dumps({
        "block_out_channels": list(a_ch), "layers_per_block": a_layers,
        "latent_channels": 4, "norm_num_groups": a_groups,
        "scaling_factor": 0.18215,
    }))
    del vae

    (root / "scheduler").mkdir(exist_ok=True)
    (root / "scheduler" / "scheduler_config.json").write_text(json.dumps({
        "num_train_timesteps": 1000, "beta_start": 0.00085,
        "beta_end": 0.012, "beta_schedule": "scaled_linear",
        "prediction_type": "epsilon", "steps_offset": 1,
    }))
    print(f"wrote {root} (scale={scale}, unet params={n_unet:,})")
    return str(root)


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", type=str, required=True)
    p.add_argument("--scale", type=str, default="sd15", choices=sorted(SCALES))
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    make_checkpoint(a.out, a.scale, a.seed)
