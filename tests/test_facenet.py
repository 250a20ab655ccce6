"""InceptionResnetV1 parity vs a functional-torch golden forward using the
facenet_pytorch state-dict key schema (reference models/loss.py:4,24)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from photoverse_tpu.models.facenet import InceptionResnetV1, convert_facenet


def _rand(shape, g):
    return torch.randn(*shape, generator=g) * 0.05


class _SD(dict):
    def basic(self, p, cin, cout, k, g):
        kh, kw = (k, k) if isinstance(k, int) else k
        self[p + ".conv.weight"] = _rand((cout, cin, kh, kw), g)
        self[p + ".bn.weight"] = _rand((cout,), g) + 1.0
        self[p + ".bn.bias"] = _rand((cout,), g)
        self[p + ".bn.running_mean"] = _rand((cout,), g)
        self[p + ".bn.running_var"] = torch.rand(cout, generator=g) + 0.5


def _make_sd():
    g = torch.Generator().manual_seed(0)
    sd = _SD()
    sd.basic("conv2d_1a", 3, 32, 3, g)
    sd.basic("conv2d_2a", 32, 32, 3, g)
    sd.basic("conv2d_2b", 32, 64, 3, g)
    sd.basic("conv2d_3b", 64, 80, 1, g)
    sd.basic("conv2d_4a", 80, 192, 3, g)
    sd.basic("conv2d_4b", 192, 256, 3, g)
    for i in range(5):
        p = f"repeat_1.{i}"
        sd.basic(p + ".branch0", 256, 32, 1, g)
        sd.basic(p + ".branch1.0", 256, 32, 1, g)
        sd.basic(p + ".branch1.1", 32, 32, 3, g)
        sd.basic(p + ".branch2.0", 256, 32, 1, g)
        sd.basic(p + ".branch2.1", 32, 32, 3, g)
        sd.basic(p + ".branch2.2", 32, 32, 3, g)
        sd[p + ".conv2d.weight"] = _rand((256, 96, 1, 1), g)
        sd[p + ".conv2d.bias"] = _rand((256,), g)
    sd.basic("mixed_6a.branch0", 256, 384, 3, g)
    sd.basic("mixed_6a.branch1.0", 256, 192, 1, g)
    sd.basic("mixed_6a.branch1.1", 192, 192, 3, g)
    sd.basic("mixed_6a.branch1.2", 192, 256, 3, g)
    for i in range(10):
        p = f"repeat_2.{i}"
        sd.basic(p + ".branch0", 896, 128, 1, g)
        sd.basic(p + ".branch1.0", 896, 128, 1, g)
        sd.basic(p + ".branch1.1", 128, 128, (1, 7), g)
        sd.basic(p + ".branch1.2", 128, 128, (7, 1), g)
        sd[p + ".conv2d.weight"] = _rand((896, 256, 1, 1), g)
        sd[p + ".conv2d.bias"] = _rand((896,), g)
    sd.basic("mixed_7a.branch0.0", 896, 256, 1, g)
    sd.basic("mixed_7a.branch0.1", 256, 384, 3, g)
    sd.basic("mixed_7a.branch1.0", 896, 256, 1, g)
    sd.basic("mixed_7a.branch1.1", 256, 256, 3, g)
    sd.basic("mixed_7a.branch2.0", 896, 256, 1, g)
    sd.basic("mixed_7a.branch2.1", 256, 256, 3, g)
    sd.basic("mixed_7a.branch2.2", 256, 256, 3, g)
    for i in range(5):
        p = f"repeat_3.{i}"
        sd.basic(p + ".branch0", 1792, 192, 1, g)
        sd.basic(p + ".branch1.0", 1792, 192, 1, g)
        sd.basic(p + ".branch1.1", 192, 192, (1, 3), g)
        sd.basic(p + ".branch1.2", 192, 192, (3, 1), g)
        sd[p + ".conv2d.weight"] = _rand((1792, 384, 1, 1), g)
        sd[p + ".conv2d.bias"] = _rand((1792,), g)
    p = "block8"
    sd.basic(p + ".branch0", 1792, 192, 1, g)
    sd.basic(p + ".branch1.0", 1792, 192, 1, g)
    sd.basic(p + ".branch1.1", 192, 192, (1, 3), g)
    sd.basic(p + ".branch1.2", 192, 192, (3, 1), g)
    sd[p + ".conv2d.weight"] = _rand((1792, 384, 1, 1), g)
    sd[p + ".conv2d.bias"] = _rand((1792,), g)
    sd["last_linear.weight"] = _rand((512, 1792), g)
    sd["last_bn.weight"] = _rand((512,), g) + 1.0
    sd["last_bn.bias"] = _rand((512,), g)
    sd["last_bn.running_mean"] = _rand((512,), g)
    sd["last_bn.running_var"] = torch.rand(512, generator=g) + 0.5
    return sd


def _bc(sd, p, x, stride=1, padding=0):
    h = F.conv2d(x, sd[p + ".conv.weight"], None, stride, padding)
    h = F.batch_norm(
        h, sd[p + ".bn.running_mean"], sd[p + ".bn.running_var"],
        sd[p + ".bn.weight"], sd[p + ".bn.bias"], False, 0.0, 1e-3,
    )
    return F.relu(h)


def _torch_facenet(sd, x):
    h = _bc(sd, "conv2d_1a", x, 2)
    h = _bc(sd, "conv2d_2a", h)
    h = _bc(sd, "conv2d_2b", h, padding=1)
    h = F.max_pool2d(h, 3, 2)
    h = _bc(sd, "conv2d_3b", h)
    h = _bc(sd, "conv2d_4a", h)
    h = _bc(sd, "conv2d_4b", h, 2)
    for i in range(5):
        p = f"repeat_1.{i}"
        b0 = _bc(sd, p + ".branch0", h)
        b1 = _bc(sd, p + ".branch1.1", _bc(sd, p + ".branch1.0", h), padding=1)
        b2 = _bc(sd, p + ".branch2.0", h)
        b2 = _bc(sd, p + ".branch2.1", b2, padding=1)
        b2 = _bc(sd, p + ".branch2.2", b2, padding=1)
        up = F.conv2d(torch.cat([b0, b1, b2], 1), sd[p + ".conv2d.weight"],
                      sd[p + ".conv2d.bias"])
        h = F.relu(h + 0.17 * up)
    b0 = _bc(sd, "mixed_6a.branch0", h, 2)
    b1 = _bc(sd, "mixed_6a.branch1.0", h)
    b1 = _bc(sd, "mixed_6a.branch1.1", b1, padding=1)
    b1 = _bc(sd, "mixed_6a.branch1.2", b1, 2)
    h = torch.cat([b0, b1, F.max_pool2d(h, 3, 2)], 1)
    for i in range(10):
        p = f"repeat_2.{i}"
        b0 = _bc(sd, p + ".branch0", h)
        b1 = _bc(sd, p + ".branch1.0", h)
        b1 = _bc(sd, p + ".branch1.1", b1, padding=(0, 3))
        b1 = _bc(sd, p + ".branch1.2", b1, padding=(3, 0))
        up = F.conv2d(torch.cat([b0, b1], 1), sd[p + ".conv2d.weight"],
                      sd[p + ".conv2d.bias"])
        h = F.relu(h + 0.10 * up)
    b0 = _bc(sd, "mixed_7a.branch0.1", _bc(sd, "mixed_7a.branch0.0", h), 2)
    b1 = _bc(sd, "mixed_7a.branch1.1", _bc(sd, "mixed_7a.branch1.0", h), 2)
    b2 = _bc(sd, "mixed_7a.branch2.0", h)
    b2 = _bc(sd, "mixed_7a.branch2.1", b2, padding=1)
    b2 = _bc(sd, "mixed_7a.branch2.2", b2, 2)
    h = torch.cat([b0, b1, b2, F.max_pool2d(h, 3, 2)], 1)

    def block8(p, h, scale=0.20, relu=True):
        b0 = _bc(sd, p + ".branch0", h)
        b1 = _bc(sd, p + ".branch1.0", h)
        b1 = _bc(sd, p + ".branch1.1", b1, padding=(0, 1))
        b1 = _bc(sd, p + ".branch1.2", b1, padding=(1, 0))
        up = F.conv2d(torch.cat([b0, b1], 1), sd[p + ".conv2d.weight"],
                      sd[p + ".conv2d.bias"])
        out = h + scale * up
        return F.relu(out) if relu else out

    for i in range(5):
        h = block8(f"repeat_3.{i}", h)
    h = block8("block8", h, scale=1.0, relu=False)
    h = F.adaptive_avg_pool2d(h, 1).flatten(1)
    h = F.linear(h, sd["last_linear.weight"])
    h = F.batch_norm(
        h, sd["last_bn.running_mean"], sd["last_bn.running_var"],
        sd["last_bn.weight"], sd["last_bn.bias"], False, 0.0, 1e-3,
    )
    return F.normalize(h, p=2, dim=1)


def test_facenet_parity():
    sd = _make_sd()
    params = convert_facenet({k: v.numpy() for k, v in sd.items()})
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 160, 160).astype(np.float32)
    with torch.no_grad():
        want = _torch_facenet(sd, torch.from_numpy(x)).numpy()
    got = InceptionResnetV1().apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    assert got.shape == (1, 512)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(got), axis=-1), 1.0, atol=1e-5)
