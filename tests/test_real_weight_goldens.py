"""Offline consumer of the real-weight goldens recorded by
scripts/verify_real_weights.py.

Needs BOTH a recorded tests/fixtures/real_weight_goldens.json AND a local
real SD-1.5 checkpoint (env PHOTOVERSE_SD15_PATH, plus optional
PHOTOVERSE_CLIP_VISION_PATH); skips with a single clearly-labeled
"needs network" gate otherwise. Protocol: photoverse_tpu/convert/
real_goldens.py (ground truth: the diffusers/transformers models the torch
reference loads, /root/reference/models/modeling_utils.py:55-60).
"""

import json
import os

import pytest

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "real_weight_goldens.json"
)

TOLERANCES = {"text": 2e-5, "vision": 2e-5, "vae": 5e-5, "unet": 1e-4}


def _gate():
    sd_path = os.environ.get("PHOTOVERSE_SD15_PATH")
    if not os.path.exists(FIXTURE) or not sd_path:
        pytest.skip(
            "needs network: record tests/fixtures/real_weight_goldens.json "
            "with scripts/verify_real_weights.py on a networked machine and "
            "set PHOTOVERSE_SD15_PATH to a local SD-1.5 checkout"
        )
    clip_path = os.environ.get("PHOTOVERSE_CLIP_VISION_PATH")
    if clip_path is None and not os.path.isdir(
        os.path.join(sd_path, "image_encoder")
    ):
        # a stock SD-1.5 checkout has no image_encoder/ subfolder and
        # load_models needs the CLIP ViT-L/14 vision weights to build the
        # conditioning stack
        pytest.skip(
            "set PHOTOVERSE_CLIP_VISION_PATH to a local "
            "openai/clip-vit-large-patch14 checkout (the SD checkout has "
            "no image_encoder/ subfolder)"
        )
    return sd_path, clip_path


def test_real_weight_parity():
    sd_path, clip_path = _gate()
    from photoverse_tpu.convert.real_goldens import compare_digest, jax_outputs

    with open(FIXTURE) as f:
        goldens = json.load(f)["digests"]
    mine = jax_outputs(sd_path, clip_vision_path=clip_path)
    failures = []
    for key, dig in goldens.items():
        fam = key.split("_")[0]
        tol = TOLERANCES.get(fam, 1e-4)
        cmp = compare_digest(mine[key], dig)
        if not cmp.get("ok") or cmp["max_rel"] > tol:
            failures.append((key, cmp))
    assert not failures, f"real-weight parity failures: {failures}"


def test_jax_outputs_protocol_smoke(tmp_path):
    """The JAX side of the real-weight protocol must RUN (it is otherwise
    exercised only on a networked machine with real weights — a shape bug
    here once made every verify_real_weights run report 'jax side failed')."""
    from photoverse_tpu.convert.real_goldens import jax_outputs
    from tests.test_cli_e2e import _make_checkpoint

    root = _make_checkpoint(tmp_path)
    out = jax_outputs(root, families=("text", "vae", "unet"))
    assert out["text_hidden"].shape[0] == 1
    assert out["text_pooled"].shape[0] == 1
    assert out["vae_decode"].shape[0] == 1
    assert out["unet_eps"].shape == (1, 32, 32, 4)
