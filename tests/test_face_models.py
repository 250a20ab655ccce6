"""ArcFace / FaceNet parity vs functional-torch golden evaluation.

The goldens are computed directly from a synthetic torch state dict with
torch.nn.functional ops (no module classes), exercising the exact key schema
of the published checkpoints the converters consume."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from photoverse_tpu.models.arcface import ArcFaceConfig, ArcFaceResNet18, convert_arcface
from photoverse_tpu.models.face_loss import FaceLoss, face_preprocess, rgb_to_grayscale


def _rand(shape, g):
    return torch.randn(*shape, generator=g) * 0.1


def _bn_stats(c, g, prefix, sd):
    sd[prefix + ".weight"] = _rand((c,), g) + 1.0
    sd[prefix + ".bias"] = _rand((c,), g)
    sd[prefix + ".running_mean"] = _rand((c,), g)
    sd[prefix + ".running_var"] = torch.rand(c, generator=g) + 0.5


def _make_arcface_sd(cfg: ArcFaceConfig):
    g = torch.Generator().manual_seed(0)
    sd = {}
    sd["conv1.weight"] = _rand((64, 1, 3, 3), g)
    _bn_stats(64, g, "bn1", sd)
    sd["prelu.weight"] = _rand((1,), g) + 0.25
    in_ch = 64
    for si, (planes, blocks) in enumerate(zip(cfg.channels, cfg.layers)):
        stride = 1 if si == 0 else 2
        for bi in range(blocks):
            p = f"layer{si+1}.{bi}"
            s = stride if bi == 0 else 1
            cin = in_ch if bi == 0 else planes
            _bn_stats(cin, g, p + ".bn0", sd)
            sd[p + ".conv1.weight"] = _rand((cin, cin, 3, 3), g)
            _bn_stats(cin, g, p + ".bn1", sd)
            sd[p + ".prelu.weight"] = _rand((1,), g) + 0.25
            sd[p + ".conv2.weight"] = _rand((planes, cin, 3, 3), g)
            _bn_stats(planes, g, p + ".bn2", sd)
            if bi == 0 and (s != 1 or cin != planes):
                sd[p + ".downsample.0.weight"] = _rand((planes, cin, 1, 1), g)
                _bn_stats(planes, g, p + ".downsample.1", sd)
        in_ch = planes
    _bn_stats(cfg.channels[-1], g, "bn4", sd)
    hw = cfg.input_size // 16
    sd["fc5.weight"] = _rand((512, cfg.channels[-1] * hw * hw), g)
    sd["fc5.bias"] = _rand((512,), g)
    _bn_stats(512, g, "bn5", sd)
    return sd


def _torch_arcface(sd, x, cfg: ArcFaceConfig):
    """Functional golden forward (NCHW), eval-mode BN."""

    def bn(p, h, d=2):
        return F.batch_norm(
            h, sd[p + ".running_mean"], sd[p + ".running_var"],
            sd[p + ".weight"], sd[p + ".bias"], False, 0.0, 1e-5,
        )

    def prelu(p, h):
        return F.prelu(h, sd[p + ".weight"])

    h = F.conv2d(x, sd["conv1.weight"], None, 1, 1)
    h = prelu("prelu", bn("bn1", h))
    h = F.max_pool2d(h, 2, 2)
    in_ch = 64
    for si, (planes, blocks) in enumerate(zip(cfg.channels, cfg.layers)):
        stride = 1 if si == 0 else 2
        for bi in range(blocks):
            p = f"layer{si+1}.{bi}"
            s = stride if bi == 0 else 1
            r = h
            o = bn(p + ".bn0", h)
            o = F.conv2d(o, sd[p + ".conv1.weight"], None, 1, 1)
            o = prelu(p + ".prelu", bn(p + ".bn1", o))
            o = F.conv2d(o, sd[p + ".conv2.weight"], None, s, 1)
            o = bn(p + ".bn2", o)
            if p + ".downsample.0.weight" in sd:
                r = F.conv2d(h, sd[p + ".downsample.0.weight"], None, s, 0)
                r = bn(p + ".downsample.1", r)
            h = prelu(p + ".prelu", o + r)
        in_ch = planes
    h = bn("bn4", h)
    h = h.reshape(h.shape[0], -1)
    h = F.linear(h, sd["fc5.weight"], sd["fc5.bias"])
    return F.batch_norm(
        h, sd["bn5.running_mean"], sd["bn5.running_var"],
        sd["bn5.weight"], sd["bn5.bias"], False, 0.0, 1e-5,
    )


@pytest.fixture(scope="module")
def arc_pair():
    cfg = ArcFaceConfig(input_size=32)  # 32px input -> 2x2 final grid
    sd = _make_arcface_sd(cfg)
    params = convert_arcface({k: v.numpy() for k, v in sd.items()}, cfg)
    return cfg, sd, params


def test_arcface_parity(arc_pair):
    cfg, sd, params = arc_pair
    rng = np.random.RandomState(0)
    x = rng.randn(2, 1, 32, 32).astype(np.float32)
    with torch.no_grad():
        want = _torch_arcface(sd, torch.from_numpy(x), cfg).numpy()
    model = ArcFaceResNet18(cfg)
    got = model.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)


def test_arcface_dataparallel_prefix(arc_pair):
    cfg, sd, params = arc_pair
    sd2 = {"module." + k: v.numpy() for k, v in sd.items()}
    params2 = convert_arcface(sd2, cfg)
    np.testing.assert_allclose(
        np.asarray(params2["fc5"]["kernel"]), np.asarray(params["fc5"]["kernel"])
    )


def test_rgb_to_grayscale_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.rand(2, 8, 8, 3).astype(np.float32)
    got = rgb_to_grayscale(jnp.asarray(x))
    w = np.array([0.2989, 0.5870, 0.1140], dtype=np.float32)
    want = (x * w).sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_face_preprocess_matches_torch_interpolate():
    rng = np.random.RandomState(2)
    x = rng.rand(1, 37, 53, 3).astype(np.float32)
    got = face_preprocess(jnp.asarray(x), "facenet", normalize=False)
    want = F.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(160, 160),
        mode="bilinear", align_corners=False,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_face_loss_self_similarity(arc_pair):
    """Same-image loss with maximize=True must be ~0 (cos=1), matching the
    reference smoke block (loss.py:81-110)."""
    cfg, _, params = arc_pair
    loss = FaceLoss("arcface", params)
    loss.model = ArcFaceResNet18(cfg)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    # bypass the resize mismatch: use 32px inputs directly via embed
    e = loss.embed(x, normalize=False)
    assert e.shape == (2, 512)
    val = loss(x, x, maximize=True, normalize=False)
    np.testing.assert_allclose(float(val), 0.0, atol=1e-5)
    sim = loss(x, x, maximize=False, normalize=False)
    np.testing.assert_allclose(float(sim), 1.0, atol=1e-5)
