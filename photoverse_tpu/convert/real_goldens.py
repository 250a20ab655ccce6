"""Real-weight golden protocol — shared by the turnkey verification script
(scripts/verify_real_weights.py) and the offline consumer test
(tests/test_real_weight_goldens.py).

The reference's numerical ground truth is the real diffusers/transformers
implementations it loads (/root/reference/models/modeling_utils.py:55-60).
This module pins ONE deterministic input protocol so the torch side
(recorded on a networked machine) and the JAX side (this framework, fed the
same converted checkpoint) can be compared bit-for-bit-modulo-float:

  - text:   the SD-1.5 tokenizer ids of PROMPT (padded to 77)
  - vision: RandomState(11).randn(1, 224, 224, 3)
  - vae:    encode RandomState(12).uniform(-1, 1, (1, 128, 128, 3));
            decode RandomState(13).randn(1, 16, 16, 4)
  - unet:   sample RandomState(14).randn(1, 32, 32, 4), t=500, text
            context = the real text-encoder output for PROMPT, identity
            context zeros with the to_v_ip/to_k_ip projections ZEROED so the
            dual-context UNet degenerates exactly to the vanilla SD UNet
            (the identity attention output is 0; eval fusion is a sum —
            ops/attention.py:86)

Arrays are NHWC here, NCHW on the torch side; the digest stores flattened
strided samples (stride chosen so each digest stays ~2k floats) plus
summary statistics.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

PROMPT = "a photo of an astronaut riding a horse on the moon"
UNET_T = 500
VISION_LAYERS = (4, 8, 12, 16)
DIGEST_TARGET = 2048  # max sampled values per digest


def make_inputs() -> Dict[str, np.ndarray]:
    return {
        "vision_pixels": np.random.RandomState(11)
        .randn(1, 224, 224, 3)
        .astype(np.float32),
        "vae_pixels": np.random.RandomState(12)
        .uniform(-1.0, 1.0, (1, 128, 128, 3))
        .astype(np.float32),
        "vae_latents": np.random.RandomState(13)
        .randn(1, 16, 16, 4)
        .astype(np.float32),
        "unet_sample": np.random.RandomState(14)
        .randn(1, 32, 32, 4)
        .astype(np.float32),
    }


def digest(arr: np.ndarray) -> dict:
    flat = np.asarray(arr, np.float64).ravel()
    stride = max(1, len(flat) // DIGEST_TARGET)
    return {
        "shape": list(np.asarray(arr).shape),
        "stride": stride,
        "mean": float(flat.mean()),
        "std": float(flat.std()),
        "absmax": float(np.abs(flat).max()),
        "sample": flat[::stride].tolist(),
    }


def compare_digest(arr: np.ndarray, dig: dict) -> dict:
    """Max abs/rel deviation of arr against a recorded digest."""
    flat = np.asarray(arr, np.float64).ravel()
    got = flat[:: dig["stride"]]
    want = np.asarray(dig["sample"], np.float64)
    if list(np.asarray(arr).shape) != dig["shape"] or len(got) != len(want):
        return {
            "ok": False,
            "error": f"shape mismatch: got {list(np.asarray(arr).shape)} "
            f"want {dig['shape']}",
        }
    max_abs = float(np.abs(got - want).max())
    scale = max(dig["absmax"], 1e-6)
    return {"ok": True, "max_abs": max_abs, "max_rel": max_abs / scale}


def zero_identity_projections(unet_params) -> None:
    """Zero every to_k_ip/to_v_ip kernel IN PLACE (dict tree) so the dual
    cross-attention contributes exactly nothing (vanilla-UNet parity mode)."""
    import jax.numpy as jnp

    def walk(node):
        if not isinstance(node, dict):
            return
        for name, child in node.items():
            if name in ("to_k_ip", "to_v_ip") and isinstance(child, dict):
                for leaf_name, leaf in child.items():
                    child[leaf_name] = jnp.zeros_like(leaf)
            else:
                walk(child)

    walk(unet_params)


def jax_outputs(
    sd_path: str,
    clip_vision_path: Optional[str] = None,
    families: tuple = ("text", "vision", "vae", "unet"),
) -> Dict[str, np.ndarray]:
    """Run the protocol through THIS framework on a converted checkpoint."""
    import jax
    import jax.numpy as jnp

    from photoverse_tpu.models.assembly import load_models

    tokenizer, modules, params, _ = load_models(
        sd_path,
        extra_num_tokens=4,
        image_encoder_path=clip_vision_path,
        image_encoder_layers_idx=VISION_LAYERS,
    )
    inputs = make_inputs()
    out: Dict[str, np.ndarray] = {}

    # tokenizer(str) already returns batched (1, 77) ids — no extra axis
    ids = jnp.asarray(
        tokenizer(
            PROMPT, padding="max_length", truncation=True,
            max_length=tokenizer.model_max_length,
        ),
        jnp.int32,
    )
    text_hidden = None
    if "text" in families or "unet" in families:
        text_hidden, pooled = modules.text_encoder.apply(
            {"params": params.text_encoder}, ids
        )
        out["text_hidden"] = np.asarray(text_hidden)
        out["text_pooled"] = np.asarray(pooled)
    if "vision" in families:
        last, layers = modules.vision_encoder.apply(
            {"params": params.vision_encoder},
            jnp.asarray(inputs["vision_pixels"]),
            collect_layers=VISION_LAYERS,
        )
        out["vision_last_hidden"] = np.asarray(last)
        for li, arr in zip(VISION_LAYERS, layers):
            out[f"vision_layer_{li}"] = np.asarray(arr)
    if "vae" in families:
        mean, logvar = modules.vae.apply(
            {"params": params.vae},
            jnp.asarray(inputs["vae_pixels"]),
            method="encode_moments",
        )
        out["vae_enc_mean"] = np.asarray(mean)
        out["vae_enc_logvar"] = np.asarray(logvar)
        out["vae_decode"] = np.asarray(
            modules.vae.apply(
                {"params": params.vae},
                jnp.asarray(inputs["vae_latents"]),
                method="decode",
            )
        )
    if "unet" in families:
        unet_params = jax.tree.map(lambda x: x, params.unet)  # shallow-ish copy
        zero_identity_projections(unet_params)
        id_ctx = jnp.zeros(
            (1, 5, modules.unet.config.cross_attention_dim), jnp.float32
        )
        eps, _ = modules.unet.apply(
            {"params": unet_params},
            jnp.asarray(inputs["unet_sample"]),
            jnp.asarray([UNET_T], jnp.int32),
            text_hidden,
            id_ctx,
        )
        out["unet_eps"] = np.asarray(eps)
    return out


def nhwc_keys() -> set:
    """Outputs that are image-layout (torch records them NCHW)."""
    return {"vae_enc_mean", "vae_enc_logvar", "vae_decode", "unet_eps"}
