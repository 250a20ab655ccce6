"""FaceNet InceptionResnetV1 (VGGFace2) embedder, flax/NHWC (inference-mode).

Capability parity with facenet_pytorch.InceptionResnetV1('vggface2') used by
the reference face loss (/root/reference/models/loss.py:4,24): stem convs,
5x Block35, Mixed_6a, 10x Block17, Mixed_7a, 5x Block8, final no-ReLU
Block8, global average pool, 512-d linear + BatchNorm1d, then L2
normalization of the embedding (facenet_pytorch forward). 160x160 RGB input
in [-1, 1]. Frozen loss/metric network: BatchNorm in eval mode.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from photoverse_tpu.models.arcface import _BatchNorm

__all__ = ["InceptionResnetV1", "convert_facenet"]


class _BasicConv(nn.Module):
    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(
            self.features, self.kernel, strides=(self.stride, self.stride),
            padding=self.padding, use_bias=False, name="conv",
        )(x)
        h = _BatchNorm(self.features, eps=1e-3, name="bn")(h)
        return jax.nn.relu(h)


def _p(a: int, b: int = None):
    b = a if b is None else b
    return ((a, a), (b, b))


class _Block35(nn.Module):
    scale: float = 0.17

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b0 = _BasicConv(32, (1, 1), name="branch0")(x)
        b1 = _BasicConv(32, (1, 1), name="branch1_0")(x)
        b1 = _BasicConv(32, (3, 3), padding=_p(1), name="branch1_1")(b1)
        b2 = _BasicConv(32, (1, 1), name="branch2_0")(x)
        b2 = _BasicConv(32, (3, 3), padding=_p(1), name="branch2_1")(b2)
        b2 = _BasicConv(32, (3, 3), padding=_p(1), name="branch2_2")(b2)
        up = jnp.concatenate([b0, b1, b2], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), padding="VALID", name="conv2d")(up)
        return jax.nn.relu(x + self.scale * up)


class _Block17(nn.Module):
    scale: float = 0.10

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b0 = _BasicConv(128, (1, 1), name="branch0")(x)
        b1 = _BasicConv(128, (1, 1), name="branch1_0")(x)
        b1 = _BasicConv(128, (1, 7), padding=((0, 0), (3, 3)), name="branch1_1")(b1)
        b1 = _BasicConv(128, (7, 1), padding=((3, 3), (0, 0)), name="branch1_2")(b1)
        up = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), padding="VALID", name="conv2d")(up)
        return jax.nn.relu(x + self.scale * up)


class _Block8(nn.Module):
    scale: float = 0.20
    no_relu: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b0 = _BasicConv(192, (1, 1), name="branch0")(x)
        b1 = _BasicConv(192, (1, 1), name="branch1_0")(x)
        b1 = _BasicConv(192, (1, 3), padding=((0, 0), (1, 1)), name="branch1_1")(b1)
        b1 = _BasicConv(192, (3, 1), padding=((1, 1), (0, 0)), name="branch1_2")(b1)
        up = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), padding="VALID", name="conv2d")(up)
        out = x + self.scale * up
        return out if self.no_relu else jax.nn.relu(out)


class _Mixed6a(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b0 = _BasicConv(384, (3, 3), stride=2, name="branch0")(x)
        b1 = _BasicConv(192, (1, 1), name="branch1_0")(x)
        b1 = _BasicConv(192, (3, 3), padding=_p(1), name="branch1_1")(b1)
        b1 = _BasicConv(256, (3, 3), stride=2, name="branch1_2")(b1)
        b2 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b0, b1, b2], axis=-1)


class _Mixed7a(nn.Module):
    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b0 = _BasicConv(256, (1, 1), name="branch0_0")(x)
        b0 = _BasicConv(384, (3, 3), stride=2, name="branch0_1")(b0)
        b1 = _BasicConv(256, (1, 1), name="branch1_0")(x)
        b1 = _BasicConv(256, (3, 3), stride=2, name="branch1_1")(b1)
        b2 = _BasicConv(256, (1, 1), name="branch2_0")(x)
        b2 = _BasicConv(256, (3, 3), padding=_p(1), name="branch2_1")(b2)
        b2 = _BasicConv(256, (3, 3), stride=2, name="branch2_2")(b2)
        b3 = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionResnetV1(nn.Module):
    embedding_dim: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, 160, 160, 3) in [-1, 1] -> (B, 512) L2-normalized."""
        h = _BasicConv(32, (3, 3), stride=2, name="conv2d_1a")(x)
        h = _BasicConv(32, (3, 3), name="conv2d_2a")(h)
        h = _BasicConv(64, (3, 3), padding=_p(1), name="conv2d_2b")(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="VALID")
        h = _BasicConv(80, (1, 1), name="conv2d_3b")(h)
        h = _BasicConv(192, (3, 3), name="conv2d_4a")(h)
        h = _BasicConv(256, (3, 3), stride=2, name="conv2d_4b")(h)
        for i in range(5):
            h = _Block35(name=f"repeat_1_{i}")(h)
        h = _Mixed6a(name="mixed_6a")(h)
        for i in range(10):
            h = _Block17(name=f"repeat_2_{i}")(h)
        h = _Mixed7a(name="mixed_7a")(h)
        for i in range(5):
            h = _Block8(name=f"repeat_3_{i}")(h)
        # final Block8 uses scale 1.0 and no ReLU (facenet_pytorch default)
        h = _Block8(scale=1.0, no_relu=True, name="block8")(h)
        h = jnp.mean(h, axis=(1, 2))  # adaptive avg pool to 1x1
        h = nn.Dense(self.embedding_dim, use_bias=False, name="last_linear")(h)
        h = _BatchNorm(self.embedding_dim, eps=1e-3, name="last_bn")(h)
        return h / jnp.maximum(
            jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12
        )


def convert_facenet(sd):
    """facenet_pytorch InceptionResnetV1 state dict -> our params."""
    import numpy as np

    sd = {k: np.asarray(v) for k, v in sd.items()}

    def basic(p):
        return {
            "conv": {"kernel": sd[p + ".conv.weight"].transpose(2, 3, 1, 0)},
            "bn": {
                "scale": sd[p + ".bn.weight"],
                "bias": sd[p + ".bn.bias"],
                "mean": sd[p + ".bn.running_mean"],
                "var": sd[p + ".bn.running_var"],
            },
        }

    def seq_branch(p, n, out_name):
        return {f"{out_name}_{i}": basic(f"{p}.{i}") for i in range(n)}

    def block(p, branches):
        out = {}
        for name, spec in branches.items():
            if isinstance(spec, int):
                out.update(seq_branch(f"{p}.{name}", spec, name))
            else:
                out[name] = basic(f"{p}.{name}")
        if p + ".conv2d.weight" in sd:
            out["conv2d"] = {
                "kernel": sd[p + ".conv2d.weight"].transpose(2, 3, 1, 0),
                "bias": sd[p + ".conv2d.bias"],
            }
        return out

    params = {
        "conv2d_1a": basic("conv2d_1a"),
        "conv2d_2a": basic("conv2d_2a"),
        "conv2d_2b": basic("conv2d_2b"),
        "conv2d_3b": basic("conv2d_3b"),
        "conv2d_4a": basic("conv2d_4a"),
        "conv2d_4b": basic("conv2d_4b"),
        "mixed_6a": block("mixed_6a", {"branch0": None, "branch1": 3}),
        "mixed_7a": block(
            "mixed_7a", {"branch0": 2, "branch1": 2, "branch2": 3}
        ),
        "block8": block("block8", {"branch0": None, "branch1": 3}),
        "last_linear": {"kernel": sd["last_linear.weight"].T},
        "last_bn": {
            "scale": sd["last_bn.weight"],
            "bias": sd["last_bn.bias"],
            "mean": sd["last_bn.running_mean"],
            "var": sd["last_bn.running_var"],
        },
    }
    for i in range(5):
        params[f"repeat_1_{i}"] = block(
            f"repeat_1.{i}", {"branch0": None, "branch1": 2, "branch2": 3}
        )
    for i in range(10):
        params[f"repeat_2_{i}"] = block(
            f"repeat_2.{i}", {"branch0": None, "branch1": 3}
        )
    for i in range(5):
        params[f"repeat_3_{i}"] = block(
            f"repeat_3.{i}", {"branch0": None, "branch1": 3}
        )
    return params
