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

from typing import Callable, Dict, Iterable, Mapping

import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Array]


class TrackedStateDict(Mapping):
    """Mapping wrapper recording which keys a converter consumed.

    `convert_strict` uses it to prove a conversion is exhaustive: any source
    key never read (modulo ignores) means the converter — and therefore the
    model it feeds — is missing a parameter of the real checkpoint."""

    def __init__(self, sd: StateDict):
        self._sd = sd
        self.consumed: set = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return self._sd[k]

    def __contains__(self, k):
        return k in self._sd

    def __iter__(self):
        return iter(self._sd)

    def __len__(self):
        return len(self._sd)


# non-parameter buffers that may appear in older torch dumps
_DEFAULT_IGNORES = ("position_ids", "num_batches_tracked")


def convert_strict(
    convert_fn: Callable[..., Dict],
    sd: StateDict,
    ignore: Iterable[str] = _DEFAULT_IGNORES,
    **kwargs,
) -> Dict:
    """Run a converter and error on any unconsumed source key.

    Missing keys already raise KeyError inside the converter; this adds the
    other direction, so convert_strict(convert_unet, sd) passing means the
    converter's output tree accounts for every tensor in the checkpoint."""
    tracked = TrackedStateDict(sd)
    out = convert_fn(tracked, **kwargs)
    leftover = sorted(
        k for k in sd
        if k not in tracked.consumed and not any(i in k for i in ignore)
    )
    if leftover:
        raise ValueError(
            f"{convert_fn.__name__}: {len(leftover)} checkpoint keys not "
            f"consumed (model would silently drop them): {leftover[:8]}"
            + ("..." if len(leftover) > 8 else "")
        )
    return out


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


# ---------------------------------------------------------------------------
# SD-1.5 VAE (diffusers AutoencoderKL key schema)
# ---------------------------------------------------------------------------


def _conv(sd: StateDict, prefix: str) -> Dict:
    # torch conv (out, in, kh, kw) -> flax (kh, kw, in, out)
    return {
        "kernel": np.asarray(sd[prefix + ".weight"]).transpose(2, 3, 1, 0),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _groupnorm(sd: StateDict, prefix: str) -> Dict:
    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _resnet(sd: StateDict, p: str, time_emb: bool = False) -> Dict:
    out = {
        "norm1": _groupnorm(sd, p + ".norm1"),
        "conv1": _conv(sd, p + ".conv1"),
        "norm2": _groupnorm(sd, p + ".norm2"),
        "conv2": _conv(sd, p + ".conv2"),
    }
    if time_emb:
        out["time_emb_proj"] = _linear(sd, p + ".time_emb_proj")
    if p + ".conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, p + ".conv_shortcut")
    return out


def _vae_attn(sd: StateDict, p: str) -> Dict:
    # new-style keys to_q/to_k/to_v/to_out.0; legacy query/key/value/proj_attn
    if p + ".to_q.weight" in sd:
        q, k, v, o = ".to_q", ".to_k", ".to_v", ".to_out.0"
    else:
        q, k, v, o = ".query", ".key", ".value", ".proj_attn"

    def lin(suffix):
        w = np.asarray(sd[p + suffix + ".weight"])
        if w.ndim == 4:  # legacy 1x1-conv attention weights
            w = w[:, :, 0, 0]
        return {"kernel": w.T, "bias": np.asarray(sd[p + suffix + ".bias"])}

    return {
        "group_norm": _groupnorm(sd, p + ".group_norm"),
        "to_q": lin(q),
        "to_k": lin(k),
        "to_v": lin(v),
        "to_out": lin(o),
    }


def convert_vae(
    sd: StateDict,
    block_out_channels=(128, 256, 512, 512),
    layers_per_block: int = 2,
) -> Dict:
    """diffusers AutoencoderKL state dict -> photoverse_tpu AutoencoderKL params."""
    n = len(block_out_channels)
    enc: Dict = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "conv_norm_out": _groupnorm(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
        "mid": {
            "resnet_0": _resnet(sd, "encoder.mid_block.resnets.0"),
            "attn": _vae_attn(sd, "encoder.mid_block.attentions.0"),
            "resnet_1": _resnet(sd, "encoder.mid_block.resnets.1"),
        },
    }
    for i in range(n):
        for j in range(layers_per_block):
            enc[f"down_{i}_res_{j}"] = _resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if i < n - 1:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
            }
    dec: Dict = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "conv_norm_out": _groupnorm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
        "mid": {
            "resnet_0": _resnet(sd, "decoder.mid_block.resnets.0"),
            "attn": _vae_attn(sd, "decoder.mid_block.attentions.0"),
            "resnet_1": _resnet(sd, "decoder.mid_block.resnets.1"),
        },
    }
    for i in range(n):
        for j in range(layers_per_block + 1):
            dec[f"up_{i}_res_{j}"] = _resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if i < n - 1:
            dec[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
            }
    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


# ---------------------------------------------------------------------------
# SD-1.5 UNet (diffusers UNet2DConditionModel key schema) + PhotoVerse extras
# ---------------------------------------------------------------------------


def _nobias_linear(sd: StateDict, prefix: str) -> Dict:
    return {"kernel": np.asarray(sd[prefix + ".weight"]).T}


def _unet_tf_block(sd: StateDict, p: str, lora: bool = False) -> Dict:
    """One diffusers Transformer2DModel (depth 1) -> my TransformerBlock params.

    `p` is e.g. "down_blocks.0.attentions.0"; PhotoVerse to_k_ip/to_v_ip live
    under "...attn2.processor.to_k_ip.0" (ModuleList of one, reference
    models/attention_processor.py:51-56).
    """
    b = p + ".transformer_blocks.0"

    def maybe_lora(prefix: str) -> Dict:
        # peft wraps targeted Linears: base weight stays at `.weight` (or
        # moves to `.base_layer.weight`), adapters at `.lora_A.default.weight`
        base_key = (
            prefix + ".base_layer.weight"
            if prefix + ".base_layer.weight" in sd
            else prefix + ".weight"
        )
        out = {"base": {"kernel": np.asarray(sd[base_key]).T}}
        la = prefix + ".lora_A.default.weight"
        if la in sd:
            out["lora_A"] = np.asarray(sd[la]).T  # (r,in) -> (in,r)
            out["lora_B"] = np.asarray(sd[prefix + ".lora_B.default.weight"]).T
        return out

    attn2 = {
        "to_q": maybe_lora(b + ".attn2.to_q"),
        "to_k": maybe_lora(b + ".attn2.to_k"),
        "to_v": maybe_lora(b + ".attn2.to_v"),
        "to_out": _linear(sd, b + ".attn2.to_out.0"),
        "to_k_ip": _nobias_linear(sd, b + ".attn2.processor.to_k_ip.0"),
        "to_v_ip": _nobias_linear(sd, b + ".attn2.processor.to_v_ip.0"),
    }
    return {
        "norm": _groupnorm(sd, p + ".norm"),
        "proj_in": _conv(sd, p + ".proj_in"),
        "proj_out": _conv(sd, p + ".proj_out"),
        "norm1": _layernorm(sd, b + ".norm1"),
        "norm2": _layernorm(sd, b + ".norm2"),
        "norm3": _layernorm(sd, b + ".norm3"),
        "attn1": {
            "to_q": _nobias_linear(sd, b + ".attn1.to_q"),
            "to_k": _nobias_linear(sd, b + ".attn1.to_k"),
            "to_v": _nobias_linear(sd, b + ".attn1.to_v"),
            "to_out": _linear(sd, b + ".attn1.to_out.0"),
        },
        "attn2": attn2,
        "ff_proj": _linear(sd, b + ".ff.net.0.proj"),
        "ff_out": _linear(sd, b + ".ff.net.2"),
    }


def convert_unet(
    sd: StateDict,
    block_out_channels=(320, 640, 1280, 1280),
    layers_per_block: int = 2,
) -> Dict:
    """diffusers UNet2DConditionModel (PhotoVerse-patched) -> UNet2DCondition params."""
    n = len(block_out_channels)
    params: Dict = {
        "conv_in": _conv(sd, "conv_in"),
        "time_embed_1": _linear(sd, "time_embedding.linear_1"),
        "time_embed_2": _linear(sd, "time_embedding.linear_2"),
        "conv_norm_out": _groupnorm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
        "mid_res_0": _resnet(sd, "mid_block.resnets.0", time_emb=True),
        "mid_res_1": _resnet(sd, "mid_block.resnets.1", time_emb=True),
        "mid_attn": _unet_tf_block(sd, "mid_block.attentions.0"),
    }
    for i in range(n):
        has_attn = i < n - 1  # down blocks: first n-1 have cross-attention
        for j in range(layers_per_block):
            params[f"down_{i}_res_{j}"] = _resnet(
                sd, f"down_blocks.{i}.resnets.{j}", time_emb=True
            )
            if has_attn:
                params[f"down_{i}_attn_{j}"] = _unet_tf_block(
                    sd, f"down_blocks.{i}.attentions.{j}"
                )
        if i < n - 1:
            params[f"down_{i}_downsample"] = _conv(
                sd, f"down_blocks.{i}.downsamplers.0.conv"
            )
    for i in range(n):
        has_attn = i > 0  # up blocks: last n-1 have cross-attention
        for j in range(layers_per_block + 1):
            params[f"up_{i}_res_{j}"] = _resnet(
                sd, f"up_blocks.{i}.resnets.{j}", time_emb=True
            )
            if has_attn:
                params[f"up_{i}_attn_{j}"] = _unet_tf_block(
                    sd, f"up_blocks.{i}.attentions.{j}"
                )
        if i < n - 1:
            params[f"up_{i}_upsample"] = _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")
    return params
