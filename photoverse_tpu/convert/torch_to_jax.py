"""Offline torch-state-dict -> JAX pytree converters.

Pure key-mapping over numpy arrays: no torch import is required to run the
converters (callers hand in a dict of numpy arrays, e.g. via
`{k: v.numpy() for k, v in module.state_dict().items()}` or a loaded
safetensors file), so they work in zero-egress environments and without
diffusers installed.

Covered checkpoint families (all named after the reference's usage):
  - PhotoVerse adapters  (/root/reference/models/adapters.py)
  - CLIP text encoder    (transformers CLIPTextModel)
  - CLIP vision encoder  (transformers CLIPVisionModel)
  - SD-1.5 VAE           (diffusers AutoencoderKL key schema)
  - SD-1.5 UNet          (diffusers UNet2DConditionModel key schema)
  - PhotoVerse .pt checkpoints (/root/reference/models/modeling_utils.py:29-50)
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Array]


def _stack(sd: StateDict, fmt: str, n: int) -> Array:
    return np.stack([np.asarray(sd[fmt.format(i)]) for i in range(n)], axis=0)


def convert_adapter(sd: StateDict, num_tokens: int = 5) -> Dict:
    """Reference PhotoVerseAdapter state dict -> stacked PhotoVerseAdapter params.

    Reference layout per token i (nn.Sequential indices):
      mapping_{i}.0 Linear, .1 LayerNorm, .3 Linear, .4 LayerNorm, .6 Linear
    and the same under mapping_patch_{i}.
    """

    def branch(prefix: str) -> Dict:
        return {
            # torch Linear weight is (out, in); stacked einsum wants (K, in, out)
            "fc0_w": _stack(sd, prefix + "_{}.0.weight", num_tokens).transpose(0, 2, 1),
            "fc0_b": _stack(sd, prefix + "_{}.0.bias", num_tokens),
            "ln0_g": _stack(sd, prefix + "_{}.1.weight", num_tokens),
            "ln0_b": _stack(sd, prefix + "_{}.1.bias", num_tokens),
            "fc1_w": _stack(sd, prefix + "_{}.3.weight", num_tokens).transpose(0, 2, 1),
            "fc1_b": _stack(sd, prefix + "_{}.3.bias", num_tokens),
            "ln1_g": _stack(sd, prefix + "_{}.4.weight", num_tokens),
            "ln1_b": _stack(sd, prefix + "_{}.4.bias", num_tokens),
            "fc2_w": _stack(sd, prefix + "_{}.6.weight", num_tokens).transpose(0, 2, 1),
            "fc2_b": _stack(sd, prefix + "_{}.6.bias", num_tokens),
        }

    return {"mapping": branch("mapping"), "mapping_patch": branch("mapping_patch")}


# ---------------------------------------------------------------------------
# CLIP (transformers key schema)
# ---------------------------------------------------------------------------


def _linear(sd: StateDict, prefix: str) -> Dict:
    return {
        "kernel": np.asarray(sd[prefix + ".weight"]).T,
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _layernorm(sd: StateDict, prefix: str) -> Dict:
    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _clip_encoder_layer(sd: StateDict, p: str) -> Dict:
    return {
        "ln1": _layernorm(sd, p + ".layer_norm1"),
        "ln2": _layernorm(sd, p + ".layer_norm2"),
        "q": _linear(sd, p + ".self_attn.q_proj"),
        "k": _linear(sd, p + ".self_attn.k_proj"),
        "v": _linear(sd, p + ".self_attn.v_proj"),
        "o": _linear(sd, p + ".self_attn.out_proj"),
        "fc1": _linear(sd, p + ".mlp.fc1"),
        "fc2": _linear(sd, p + ".mlp.fc2"),
    }


def convert_clip_text(sd: StateDict, num_layers: int = 12) -> Dict:
    """transformers CLIPTextModel state dict -> CLIPTextEncoder params.

    Accepts keys with or without the leading "text_model." prefix.
    """
    if not any(k.startswith("text_model.") for k in sd):
        base = ""
    else:
        base = "text_model."
    params = {
        "token_embedding": np.asarray(sd[base + "embeddings.token_embedding.weight"]),
        "position_embedding": np.asarray(
            sd[base + "embeddings.position_embedding.weight"]
        ),
        "final_ln": _layernorm(sd, base + "final_layer_norm"),
    }
    for i in range(num_layers):
        params[f"layer_{i}"] = _clip_encoder_layer(sd, base + f"encoder.layers.{i}")
    return params


def convert_clip_vision(sd: StateDict, num_layers: int = 24) -> Dict:
    """transformers CLIPVisionModel state dict -> CLIPVisionEncoder params."""
    if not any(k.startswith("vision_model.") for k in sd):
        base = ""
    else:
        base = "vision_model."
    params = {
        "class_embedding": np.asarray(sd[base + "embeddings.class_embedding"]),
        # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
        "patch_embedding": np.asarray(
            sd[base + "embeddings.patch_embedding.weight"]
        ).transpose(2, 3, 1, 0),
        "position_embedding": np.asarray(
            sd[base + "embeddings.position_embedding.weight"]
        ),
        "pre_ln": _layernorm(sd, base + "pre_layrnorm"),
        "post_ln": _layernorm(sd, base + "post_layernorm"),
    }
    for i in range(num_layers):
        params[f"layer_{i}"] = _clip_encoder_layer(sd, base + f"encoder.layers.{i}")
    return params
