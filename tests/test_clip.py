"""CLIP text/vision parity vs transformers (random-weight small configs)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
from transformers import CLIPTextConfig as HFTextConfig
from transformers import CLIPTextModel
from transformers import CLIPVisionConfig as HFVisionConfig
from transformers import CLIPVisionModel

from photoverse_tpu.convert.torch_to_jax import convert_clip_text, convert_clip_vision
from photoverse_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextEncoder,
    CLIPVisionConfig,
    CLIPVisionEncoder,
)


@pytest.fixture(scope="module")
def text_pair():
    torch.manual_seed(0)
    hf_cfg = HFTextConfig(
        vocab_size=99,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=16,
        hidden_act="quick_gelu",
        eos_token_id=98,
        bos_token_id=97,
    )
    hf = CLIPTextModel(hf_cfg).eval()
    cfg = CLIPTextConfig(
        vocab_size=99,
        hidden_size=32,
        num_layers=2,
        num_heads=4,
        intermediate_size=64,
        max_position_embeddings=16,
    )
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_clip_text(sd, num_layers=2)
    return hf, CLIPTextEncoder(config=cfg), params


def test_clip_text_parity(text_pair):
    hf, enc, params = text_pair
    rng = np.random.RandomState(0)
    ids = rng.randint(1, 97, size=(3, 16)).astype(np.int64)
    ids[:, -1] = 98  # eos = highest id, so argmax pooling matches HF
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(ids))
    got_last, got_pooled = enc.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(got_last), out.last_hidden_state.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_pooled), out.pooler_output.numpy(), rtol=1e-4, atol=1e-5
    )


def test_clip_text_injection_changes_only_spliced_region(text_pair):
    _, enc, params = text_pair
    rng = np.random.RandomState(1)
    ids = rng.randint(1, 97, size=(2, 16)).astype(np.int64)
    concept = jnp.asarray(rng.randn(2, 3, 32).astype(np.float32))
    idx = jnp.asarray([4, 2])
    last, _ = enc.apply({"params": params}, jnp.asarray(ids), concept, idx)
    base, _ = enc.apply({"params": params}, jnp.asarray(ids))
    assert last.shape == base.shape
    # causal masking: positions before the splice point are unaffected
    np.testing.assert_allclose(
        np.asarray(last[0, :4]), np.asarray(base[0, :4]), rtol=1e-5, atol=1e-6
    )
    assert not np.allclose(np.asarray(last[0, 4:]), np.asarray(base[0, 4:]))


@pytest.fixture(scope="module")
def vision_pair():
    torch.manual_seed(0)
    hf_cfg = HFVisionConfig(
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=64,
        image_size=28,
        patch_size=14,
        hidden_act="quick_gelu",
    )
    hf = CLIPVisionModel(hf_cfg).eval()
    cfg = CLIPVisionConfig(
        hidden_size=32,
        num_layers=3,
        num_heads=4,
        intermediate_size=64,
        image_size=28,
        patch_size=14,
    )
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_clip_vision(sd, num_layers=3)
    return hf, CLIPVisionEncoder(config=cfg), params


def test_clip_vision_parity(vision_pair):
    hf, enc, params = vision_pair
    rng = np.random.RandomState(2)
    px = rng.randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(px), output_hidden_states=True)
    px_nhwc = jnp.asarray(px.transpose(0, 2, 3, 1))
    last, collected = enc.apply({"params": params}, px_nhwc, collect_layers=(0, 1, 2))
    np.testing.assert_allclose(
        np.asarray(last), out.last_hidden_state.numpy(), rtol=1e-4, atol=1e-5
    )
    for j, i in enumerate((0, 1, 2)):
        np.testing.assert_allclose(
            np.asarray(collected[j]),
            out.hidden_states[i].numpy(),
            rtol=1e-4,
            atol=1e-5,
            err_msg=f"hidden state {i}",
        )
