"""ArcFace ResNet-18 face embedder, flax/NHWC (inference-mode).

Capability parity with the reference's from-scratch grayscale face ResNet
(/root/reference/models/arcface_resnet.py:6-145): IRBlock stages [2,2,2,2]
at 64/128/256/512 channels, 128x128 single-channel input, 512-d embedding.
Used frozen (as a loss/metric network), so BatchNorm runs in eval mode with
running statistics stored as parameters.

Note the reference quirk kept for exactness: each IRBlock applies ONE shared
PReLU parameter at both activation sites (arcface_resnet.py:20,34,45).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["ArcFaceResNet18", "ArcFaceConfig"]


@dataclasses.dataclass(frozen=True)
class ArcFaceConfig:
    layers: Tuple[int, ...] = (2, 2, 2, 2)
    channels: Tuple[int, ...] = (64, 128, 256, 512)
    use_se: bool = False
    embedding_dim: int = 512
    input_size: int = 128


class _BatchNorm(nn.Module):
    """Eval-mode batch norm: running stats as parameters."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return x * inv + (bias - mean * inv)


class _PReLU(nn.Module):
    """torch nn.PReLU() default: one shared slope parameter."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = self.param("weight", nn.initializers.constant(0.25), (1,), jnp.float32)
        return jnp.where(x >= 0, x, a * x)


class _SEBlock(nn.Module):
    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = jnp.mean(x, axis=(1, 2))  # (B, C)
        y = nn.Dense(self.channels // self.reduction, name="fc0")(y)
        y = _PReLU(name="prelu")(y)
        y = nn.Dense(self.channels, name="fc1")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class _IRBlock(nn.Module):
    out_channels: int
    stride: int = 1
    use_se: bool = False
    has_downsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        prelu = _PReLU(name="prelu")  # shared at both sites, like the reference
        h = _BatchNorm(in_ch, name="bn0")(x)
        h = nn.Conv(in_ch, (3, 3), padding=1, use_bias=False, name="conv1")(h)
        h = _BatchNorm(in_ch, name="bn1")(h)
        h = prelu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, name="conv2",
        )(h)
        h = _BatchNorm(self.out_channels, name="bn2")(h)
        if self.use_se:
            h = _SEBlock(self.out_channels, name="se")(h)
        residual = x
        if self.has_downsample:
            residual = nn.Conv(
                self.out_channels, (1, 1), strides=(self.stride, self.stride),
                padding="VALID", use_bias=False, name="downsample_conv",
            )(x)
            residual = _BatchNorm(self.out_channels, name="downsample_bn")(residual)
        return prelu(h + residual)


class ArcFaceResNet18(nn.Module):
    config: ArcFaceConfig = ArcFaceConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, 128, 128, 1) grayscale in [-1, 1] -> (B, 512) embedding."""
        cfg = self.config
        h = nn.Conv(64, (3, 3), padding=1, use_bias=False, name="conv1")(x)
        h = _BatchNorm(64, name="bn1")(h)
        h = _PReLU(name="prelu")(h)
        h = nn.max_pool(h, (2, 2), strides=(2, 2))

        in_ch = 64
        for si, (planes, blocks) in enumerate(zip(cfg.channels, cfg.layers)):
            stride = 1 if si == 0 else 2
            for bi in range(blocks):
                s = stride if bi == 0 else 1
                has_ds = bi == 0 and (s != 1 or in_ch != planes)
                h = _IRBlock(
                    planes, stride=s, use_se=cfg.use_se, has_downsample=has_ds,
                    name=f"layer{si + 1}_{bi}",
                )(h)
                in_ch = planes

        h = _BatchNorm(cfg.channels[-1], name="bn4")(h)
        # torch flattens NCHW (C,H,W); we flatten NHWC and the converter
        # permutes fc5 columns to match.
        B = h.shape[0]
        h = h.reshape(B, -1)
        h = nn.Dense(cfg.embedding_dim, name="fc5")(h)
        return _BatchNorm(cfg.embedding_dim, name="bn5")(h)


def convert_arcface(sd, config: ArcFaceConfig = ArcFaceConfig()):
    """Torch ResNetFace state dict -> ArcFaceResNet18 params.

    Accepts keys with or without the DataParallel "module." prefix
    (the published checkpoint is saved from nn.DataParallel,
    reference arcface_resnet.py:136-140).
    """
    import numpy as np

    sd = {k[len("module."):] if k.startswith("module.") else k: np.asarray(v)
          for k, v in sd.items()}

    def conv(p):
        return {"kernel": sd[p + ".weight"].transpose(2, 3, 1, 0)}

    def bn(p):
        return {
            "scale": sd[p + ".weight"],
            "bias": sd[p + ".bias"],
            "mean": sd[p + ".running_mean"],
            "var": sd[p + ".running_var"],
        }

    def prelu(p):
        return {"weight": sd[p + ".weight"].reshape(-1)[:1]}

    params = {
        "conv1": conv("conv1"),
        "bn1": bn("bn1"),
        "prelu": prelu("prelu"),
        "bn4": bn("bn4"),
        "bn5": bn("bn5"),
    }
    # fc5: torch input layout (C=512, H=8, W=8) flattened C-major; ours is
    # (H, W, C) flattened — permute columns accordingly.
    w = sd["fc5.weight"]  # (512, 512*8*8)
    c, hw = config.channels[-1], config.input_size // 16
    w = w.reshape(-1, c, hw, hw).transpose(0, 2, 3, 1).reshape(w.shape[0], -1)
    params["fc5"] = {"kernel": w.T, "bias": sd["fc5.bias"]}

    in_ch = 64
    for si, (planes, blocks) in enumerate(zip(config.channels, config.layers)):
        stride = 1 if si == 0 else 2
        for bi in range(blocks):
            p = f"layer{si + 1}.{bi}"
            s = stride if bi == 0 else 1
            blk = {
                "bn0": bn(p + ".bn0"),
                "conv1": conv(p + ".conv1"),
                "bn1": bn(p + ".bn1"),
                "prelu": prelu(p + ".prelu"),
                "conv2": conv(p + ".conv2"),
                "bn2": bn(p + ".bn2"),
            }
            if bi == 0 and (s != 1 or in_ch != planes):
                blk["downsample_conv"] = conv(p + ".downsample.0")
                blk["downsample_bn"] = bn(p + ".downsample.1")
            if config.use_se:
                blk["se"] = {
                    "fc0": {"kernel": sd[p + ".se.fc.0.weight"].T,
                            "bias": sd[p + ".se.fc.0.bias"]},
                    "prelu": prelu(p + ".se.fc.1"),
                    "fc1": {"kernel": sd[p + ".se.fc.2.weight"].T,
                            "bias": sd[p + ".se.fc.2.bias"]},
                }
            params[f"layer{si + 1}_{bi}"] = blk
            in_ch = planes
    return params
