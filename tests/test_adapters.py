"""Adapter parity vs a torch replica of the reference module
(/root/reference/models/adapters.py:5-44)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
from torch import nn

from photoverse_tpu.convert.torch_to_jax import convert_adapter
from photoverse_tpu.models.adapters import PhotoVerseAdapter


def _torch_ref_adapter(clip_dim=1024, cross_dim=768, num_tokens=5):
    """Torch module with the reference's parameter layout, for golden outputs."""

    class RefAdapter(nn.Module):
        def __init__(self):
            super().__init__()
            for i in range(num_tokens):
                for prefix in ("mapping", "mapping_patch"):
                    setattr(
                        self,
                        f"{prefix}_{i}",
                        nn.Sequential(
                            nn.Linear(clip_dim, 1024),
                            nn.LayerNorm(1024),
                            nn.LeakyReLU(),
                            nn.Linear(1024, 1024),
                            nn.LayerNorm(1024),
                            nn.LeakyReLU(),
                            nn.Linear(1024, cross_dim),
                        ),
                    )

        def forward(self, embs, token_index=None):
            if token_index is not None:
                e = embs[token_index]
                return getattr(self, f"mapping_{token_index}")(e[:, :1]) + getattr(
                    self, f"mapping_patch_{token_index}"
                )(e[:, 1:]).mean(dim=1, keepdim=True)
            outs = []
            for i, e in enumerate(embs):
                outs.append(
                    getattr(self, f"mapping_{i}")(e[:, :1])
                    + getattr(self, f"mapping_patch_{i}")(e[:, 1:]).mean(
                        dim=1, keepdim=True
                    )
                )
            return torch.cat(outs, dim=1)

    return RefAdapter()


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    num_tokens, B, S, D = 5, 2, 9, 1024
    ref = _torch_ref_adapter(num_tokens=num_tokens).eval()
    embs_t = [torch.randn(B, S, D) for _ in range(num_tokens)]
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = convert_adapter(sd, num_tokens=num_tokens)
    embs_j = jnp.stack([jnp.asarray(e.numpy()) for e in embs_t], axis=0)
    model = PhotoVerseAdapter(num_tokens=num_tokens)
    return ref, embs_t, model, params, embs_j


def test_adapter_full_parity(setup):
    ref, embs_t, model, params, embs_j = setup
    with torch.no_grad():
        want = ref(embs_t).numpy()  # (B, 5, 768)
    got = model.apply({"params": params}, embs_j)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_adapter_token_index_parity(setup):
    ref, embs_t, model, params, embs_j = setup
    with torch.no_grad():
        want = ref(embs_t, token_index=0).numpy()  # (B, 1, 768)
    got = model.apply({"params": params}, embs_j, token_index=0)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_adapter_init_shapes():
    model = PhotoVerseAdapter(num_tokens=5)
    embs = jnp.zeros((5, 2, 257, 1024))
    params = model.init(jax.random.PRNGKey(0), embs)["params"]
    assert params["mapping"]["fc0_w"].shape == (5, 1024, 1024)
    assert params["mapping"]["fc2_w"].shape == (5, 1024, 768)
    out = model.apply({"params": params}, embs)
    assert out.shape == (2, 5, 768)
