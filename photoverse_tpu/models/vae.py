"""SD-1.5 VAE (AutoencoderKL equivalent), TPU-native flax/NHWC.

Capability parity with the diffusers AutoencoderKL the reference loads at
/root/reference/models/modeling_utils.py:57 and uses for:
  - training latents: encode(pixels).latent_dist.sample() * 0.18215
    (/root/reference/train.py:471-472)
  - from_noised_image inference (/root/reference/models/infer.py:62-64)
  - decoding generated latents (/root/reference/models/infer.py:121-122)

Everything runs NHWC (TPU conv layout); the encode output is the diagonal
Gaussian (mean, logvar) so sampling stays a pure function of an explicit key.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["VAEConfig", "Encoder", "Decoder", "AutoencoderKL"]


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    # streaming flash kernel for the mid-block 4096-token single-head
    # attention (d=512): avoids the (B, S, S) score materialization.
    # Differentiable (chunked-recompute VJP) — safe for the face-loss path.
    use_flash_attention: bool = False
    # run GroupNorm statistics in the compute dtype instead of f32 (halves
    # the cast traffic around every norm — inference fast path, mirrors
    # UNetConfig.fast_norms)
    fast_norms: bool = False
    # additionally lift flax's forced-f32 stats reductions (see
    # UNetConfig.fast_norm_reductions)
    fast_norm_reductions: bool = False
    # per-block rematerialization in the decoder. The face loss backprops
    # through decode() at full resolution (reference train.py:531-532 via
    # infer.py:121-122); without remat the decoder backward keeps every
    # silu/conv input live — ~10 GB of f32 HLO temps at 512px, which OOMs
    # a 16 GB v5e (measured: TRAIN_SOAK phase A, round 4). With remat each
    # up-level recomputes its activations in the backward instead.
    remat: bool = False


def _gn(name: str, groups: int = 32, dtype: jnp.dtype = jnp.float32,
        fast_reductions: bool = False) -> nn.GroupNorm:
    # norm statistics default to f32 regardless of compute dtype;
    # fast_norms keeps them in the compute dtype (inference fast path) and
    # fast_reductions additionally lifts flax's forced-f32 stats reductions
    return nn.GroupNorm(num_groups=groups, epsilon=1e-6, name=name, dtype=dtype,
                        force_float32_reductions=not fast_reductions)


def _conv(features: int, kernel: int, name: str, stride: int = 1, padding=None,
          dtype=jnp.float32):
    if padding is None:
        padding = kernel // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=padding if isinstance(padding, str) else [(padding, padding)] * 2,
        name=name,
        dtype=dtype,
    )


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype = jnp.float32
    fast_reductions: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = jax.nn.silu(_gn("norm1", self.groups, dtype=self.norm_dtype, fast_reductions=self.fast_reductions)(x)).astype(self.dtype)
        h = _conv(self.out_channels, 3, "conv1", dtype=self.dtype)(h)
        h = jax.nn.silu(_gn("norm2", self.groups, dtype=self.norm_dtype, fast_reductions=self.fast_reductions)(h)).astype(self.dtype)
        h = _conv(self.out_channels, 3, "conv2", dtype=self.dtype)(h)
        if x.shape[-1] != self.out_channels:
            x = _conv(self.out_channels, 1, "conv_shortcut", padding=0,
                      dtype=self.dtype)(x)
        return x.astype(self.dtype) + h


class AttnBlock(nn.Module):
    """Single-head full spatial self-attention (VAE mid block).

    With use_flash and a long sequence, the (B, S, S) score materialization
    (64 MB/image f32 at the 64x64 latent level) is replaced by the streaming
    Pallas flash kernel (ops.flash_sdpa.flash_sdpa_stream_diff): K/V chunks
    ride the grid, accumulators live in VMEM scratch."""

    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    flash_min_seq: int = 1024
    norm_dtype: jnp.dtype = jnp.float32
    fast_reductions: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        S = H * W
        h = _gn("group_norm", self.groups, dtype=self.norm_dtype, fast_reductions=self.fast_reductions)(x).reshape(B, S, C).astype(self.dtype)
        q = nn.Dense(C, name="to_q", dtype=self.dtype)(h)
        k = nn.Dense(C, name="to_k", dtype=self.dtype)(h)
        v = nn.Dense(C, name="to_v", dtype=self.dtype)(h)
        if self.use_flash and S >= self.flash_min_seq:
            from photoverse_tpu.ops.flash_sdpa import flash_sdpa_stream_diff

            ctx = flash_sdpa_stream_diff(
                q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
            )[:, :, 0, :]
        else:
            scores = jnp.einsum(
                "bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32
            )
            probs = jax.nn.softmax(scores * (C**-0.5), axis=-1).astype(x.dtype)
            ctx = jnp.einsum(
                "bqk,bkc->bqc", probs, v, preferred_element_type=jnp.float32
            ).astype(self.dtype)
        out = nn.Dense(C, name="to_out", dtype=self.dtype)(ctx.astype(self.dtype))
        return x.astype(self.dtype) + out.reshape(B, H, W, C)


class Downsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # asymmetric (0,1) spatial pad then stride-2 valid conv, matching the
        # SD VAE downsampler exactly
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding="VALID", name="conv",
            dtype=self.dtype,
        )(x)


class Upsample(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="nearest")
        return _conv(self.channels, 3, "conv", dtype=self.dtype)(x)


class MidBlock(nn.Module):
    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False
    norm_dtype: jnp.dtype = jnp.float32
    fast_reductions: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        nd = self.norm_dtype
        fr = self.fast_reductions
        x = ResnetBlock(
            self.channels, self.groups, self.dtype, nd, fr, name="resnet_0"
        )(x)
        x = AttnBlock(
            self.channels, self.groups, self.dtype, use_flash=self.use_flash,
            norm_dtype=nd, fast_reductions=fr, name="attn",
        )(x)
        return ResnetBlock(
            self.channels, self.groups, self.dtype, nd, fr, name="resnet_1"
        )(x)


class Encoder(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        dt = self.dtype
        ch = cfg.block_out_channels
        nd = dt if cfg.fast_norms else jnp.float32
        fr = cfg.fast_norms and cfg.fast_norm_reductions
        x = _conv(ch[0], 3, "conv_in", dtype=dt)(x.astype(dt))
        for i, c in enumerate(ch):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock(
                    c, cfg.norm_num_groups, dt, nd, fr, name=f"down_{i}_res_{j}"
                )(x)
            if i < len(ch) - 1:
                x = Downsample(c, dt, name=f"down_{i}_downsample")(x)
        x = MidBlock(ch[-1], cfg.norm_num_groups, dt,
             use_flash=cfg.use_flash_attention, norm_dtype=nd,
             fast_reductions=fr, name="mid")(x)
        x = jax.nn.silu(
            _gn("conv_norm_out", cfg.norm_num_groups, dtype=nd,
                fast_reductions=fr)(x)
        ).astype(dt)
        # moments in f32: logvar feeds exp()
        return _conv(2 * cfg.latent_channels, 3, "conv_out", dtype=jnp.float32)(
            x.astype(jnp.float32)
        )


class Decoder(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        dt = self.dtype
        ch = list(reversed(cfg.block_out_channels))  # (512, 512, 256, 128)
        nd = dt if cfg.fast_norms else jnp.float32
        fr = cfg.fast_norms and cfg.fast_norm_reductions
        # nn.remat keeps module names, so checkpoints are layout-identical
        Res = nn.remat(ResnetBlock) if cfg.remat else ResnetBlock
        Mid = nn.remat(MidBlock) if cfg.remat else MidBlock
        Up = nn.remat(Upsample) if cfg.remat else Upsample
        x = _conv(ch[0], 3, "conv_in", dtype=dt)(z.astype(dt))
        x = Mid(ch[0], cfg.norm_num_groups, dt,
             use_flash=cfg.use_flash_attention, norm_dtype=nd,
             fast_reductions=fr, name="mid")(x)
        for i, c in enumerate(ch):
            for j in range(cfg.layers_per_block + 1):
                x = Res(
                    c, cfg.norm_num_groups, dt, nd, fr, name=f"up_{i}_res_{j}"
                )(x)
            if i < len(ch) - 1:
                x = Up(c, dt, name=f"up_{i}_upsample")(x)
        x = jax.nn.silu(
            _gn("conv_norm_out", cfg.norm_num_groups, dtype=nd,
                fast_reductions=fr)(x)
        ).astype(dt)
        return _conv(cfg.out_channels, 3, "conv_out", dtype=jnp.float32)(
            x.astype(jnp.float32)
        )


class AutoencoderKL(nn.Module):
    config: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype, name="encoder")
        self.decoder = Decoder(self.config, self.dtype, name="decoder")
        self.quant_conv = nn.Conv(
            2 * self.config.latent_channels, (1, 1), padding="VALID", name="quant_conv"
        )
        self.post_quant_conv = nn.Conv(
            self.config.latent_channels, (1, 1), padding="VALID", name="post_quant_conv"
        )

    def encode_moments(self, pixels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """pixels (B,H,W,3) in [-1,1] -> (mean, logvar) each (B,h,w,4)."""
        moments = self.quant_conv(self.encoder(pixels))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode_sample(self, pixels: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        """latent_dist.sample() equivalent (unscaled latents)."""
        mean, logvar = self.encode_moments(pixels)
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(rng, mean.shape, dtype=mean.dtype)

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """unscaled latents (B,h,w,4) -> pixels (B,H,W,3)."""
        return self.decoder(self.post_quant_conv(latents))

    def __call__(self, pixels: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        return self.decode(self.encode_sample(pixels, rng))
