"""VAE parity vs torch golden replica (reference usage: train.py:471-472,
infer.py:62-64,121-122)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from photoverse_tpu.convert.torch_to_jax import convert_vae
from photoverse_tpu.models.vae import AutoencoderKL, VAEConfig


@pytest.fixture(scope="module")
def pair():
    torch.manual_seed(0)
    from tests.torch_ref_vae import RefVAE

    ref = RefVAE(ch=(32, 64), layers=2, latent=4, groups=8).eval()
    cfg = VAEConfig(block_out_channels=(32, 64), norm_num_groups=8)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = convert_vae(sd, block_out_channels=(32, 64))
    return ref, AutoencoderKL(config=cfg), params


def test_vae_encode_parity(pair):
    ref, vae, params = pair
    rng = np.random.RandomState(0)
    px = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = ref.encode_moments(torch.from_numpy(px)).numpy()
    mean, logvar = vae.apply(
        {"params": params},
        jnp.asarray(px.transpose(0, 2, 3, 1)),
        method=AutoencoderKL.encode_moments,
    )
    got = np.concatenate(
        [np.asarray(mean).transpose(0, 3, 1, 2), np.asarray(logvar).transpose(0, 3, 1, 2)],
        axis=1,
    )
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


def test_vae_decode_parity(pair):
    ref, vae, params = pair
    rng = np.random.RandomState(1)
    z = rng.randn(2, 4, 8, 8).astype(np.float32)
    with torch.no_grad():
        want = ref.decode(torch.from_numpy(z)).numpy()
    got = vae.apply(
        {"params": params},
        jnp.asarray(z.transpose(0, 2, 3, 1)),
        method=AutoencoderKL.decode,
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=5e-4, atol=5e-5
    )


def test_vae_decoder_remat_value_and_grad_parity(pair):
    """VAEConfig.remat changes memory, not math: decode values AND the
    gradient of a decode-based loss w.r.t. the latents (the face-loss
    backward path, engine/training.py:_face_loss) must match the
    non-remat decoder bit-for-bit-ish. Params are shared — nn.remat keeps
    module names, so checkpoints are layout-identical."""
    import dataclasses

    _, vae, params = pair
    vae_r = AutoencoderKL(config=dataclasses.replace(vae.config, remat=True))
    rng = np.random.RandomState(3)
    z = jnp.asarray(rng.randn(2, 8, 8, 4).astype(np.float32))

    def loss(v):
        def f(zz):
            px = v.apply({"params": params}, zz, method=AutoencoderKL.decode)
            return jnp.sum(jnp.square(px)), px

        (val, px), g = jax.value_and_grad(f, has_aux=True)(z)
        return val, px, g

    v0, px0, g0 = loss(vae)
    v1, px1, g1 = loss(vae_r)
    np.testing.assert_allclose(np.asarray(px1), np.asarray(px0), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), rtol=1e-5, atol=1e-6)


def test_vae_sample_uses_moments(pair):
    _, vae, params = pair
    rng = np.random.RandomState(2)
    px = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    z1 = vae.apply(
        {"params": params}, px, jax.random.PRNGKey(0), method=AutoencoderKL.encode_sample
    )
    z2 = vae.apply(
        {"params": params}, px, jax.random.PRNGKey(1), method=AutoencoderKL.encode_sample
    )
    mean, _ = vae.apply({"params": params}, px, method=AutoencoderKL.encode_moments)
    assert z1.shape == mean.shape
    assert not np.allclose(np.asarray(z1), np.asarray(z2))
