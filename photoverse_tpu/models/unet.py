"""SD-1.5 UNet with native dual-context (text + identity) cross-attention.

Capability parity with the reference's patched UNet2DConditionModel:
  - the diffusers UNet loaded at /root/reference/models/modeling_utils.py:58,
  - with every attn2 replaced by a PhotoVerse processor installed via
    set_visual_cross_attention_adapter (/root/reference/models/unet.py:8-35),
  - plus optional peft LoRA on attn2.to_q/to_k/to_v
    (/root/reference/train.py:346-354).

TPU-first differences from that design:
  - the dual conditioning is a first-class forward argument
    `(text_ctx, id_ctx)` consumed by the attention op
    (photoverse_tpu.ops.attention.dual_context_attention), not a tuple
    smuggled through `encoder_hidden_states` and unpacked by a processor;
  - the per-layer `to_v_ip_norm` side channel
    (/root/reference/models/attention_processor.py:397, models/unet.py:38-47)
    is an auxiliary *output* threaded functionally through the blocks;
  - stochastic fusion randomness comes from an explicit key, folded per
    cross-attn layer (train/eval is a static argument, not a grad-mode probe);
  - NHWC layout throughout; LoRA deltas are computed as two thin matmuls on
    activations (rank << width), which XLA fuses with the base projection.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from photoverse_tpu.ops.attention import dual_context_attention, sdpa

__all__ = ["UNetConfig", "UNet2DCondition"]


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    num_heads: int = 8  # SD-1.5 "attention_head_dim": 8 means 8 heads
    norm_num_groups: int = 32
    lora_rank: int = 0  # 0 disables LoRA
    lora_alpha: float = 1.0
    lora_dropout: float = 0.0
    fusion_scale: float = 2.0
    fusion_rule1: float = 1.0 / 3.0
    fusion_rule2: float = 2.0 / 3.0
    # rematerialize resnet/transformer blocks (activation checkpointing) —
    # trades FLOPs for HBM in large-batch training
    remat: bool = False
    # selective checkpointing: "" = recompute everything in the block;
    # "dots" = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    # (save matmul/conv outputs, recompute only elementwise/norms — less
    # recompute FLOPs for modestly more HBM)
    remat_policy: str = ""
    # Pallas flash attention for long self-attention sequences (TPU)
    use_flash_attention: bool = False
    # engage flash only at sequence lengths >= this (short levels are
    # cheaper on the jnp path); lowered by tiny-config tests/dryruns
    flash_min_seq: int = 1024
    # custom flash callable with the flash_sdpa_diff signature
    # (q, k, v, fast_scores) -> out. Installed by
    # parallel.flash.enable_sharded_flash so TP/SP keeps the Pallas fast
    # path via shard_map (None = the stock single-device kernel).
    # Tensor mode is differentiable (TP training uses it, cli/train.py);
    # spatial mode is inference-only — differentiating it fails loudly at
    # the kernel's equal-length check (parallel/flash.py).
    flash_fn: Optional[Callable] = None
    # store attention scores/probs in bf16 (halves self-attention HBM
    # traffic; ~6e-5 output deviation — inference fast path)
    fast_attention_scores: bool = False
    # run Group/LayerNorms in the compute dtype instead of f32 (halves the
    # cast traffic around every norm — inference fast path)
    fast_norms: bool = False
    # ALSO run the norm statistics *reductions* in the compute dtype
    # (flax forces float32 reductions by default for stability —
    # force_float32_reductions; the round-3 profile shows those
    # convert+reduce fusions are the single largest non-attention device
    # cost, ~50-70 ms/step). bf16 tree-reductions over ~40k elements carry
    # real rounding error — measured end-to-end before shipping anywhere.
    fast_norm_reductions: bool = False
    # fuse LN2+dual-cross-attn+LN3+GEGLU of each eligible transformer block
    # into ONE Pallas call (ops/fused_block.py) — pays the custom-call
    # layout boundary once per block instead of XLA's ~6 relayout points.
    # Eval-only; the engine builds per-layer weight bundles per denoise
    # call. Eligibility is weight-set-fits-VMEM (fused_block_max_channels).
    fused_blocks: bool = False
    fused_block_max_channels: int = 320
    # query-tile rows per kernel program (ablated in PERFORMANCE.md round 3:
    # 512 > 256; 1024 needs the bf16 GEGLU temporaries of fast mode)
    fused_block_q_tile: int = 512
    # stream each transformer block in the flattened (B, S, C) sequence
    # layout: collapse NHWC -> (B, S, C) ONCE at block entry, take the
    # GroupNorm statistics there, and run proj_in/proj_out as matmuls on
    # the SAME conv params (a 1x1 conv IS x @ kernel[0,0] + bias, so the
    # param tree and the numerics are bit-identical). This removes the
    # NHWC<->sequence relayout points XLA otherwise inserts between the
    # GN/conv pair and the attention stack — the round-3 profile's
    # convert_reduce/generic-fusion HBM pool (VERDICT r3 #1, layout-level
    # attack). Measured end-to-end before any default flip.
    seq_transformer: bool = False
    # compute the GEGLU value/gate halves as two weight-slice matmuls
    # instead of one matmul + activation split — numerically identical
    # (every output column is an independent dot product) and param-tree
    # identical, but under tensor parallelism (parallel/tp.py) it keeps
    # both halves cleanly column-sharded: slicing the *weight* is a
    # scan-invariant op GSPMD hoists out of the denoise loop, while
    # slicing the projected (B, S, 8C) activation would reshard it
    # inside every step. Enabled by the CLIs whenever tp > 1.
    tp_friendly_ffn: bool = False

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0
) -> jnp.ndarray:
    """Sinusoidal embedding, flip_sin_to_cos=True / freq_shift=0 (SD-1.5)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _downsample_ip_mask(
    ip_mask: Optional[jnp.ndarray], B: int, Hh: int, Ww: int
) -> Optional[jnp.ndarray]:
    """(B, Hm, Wm) -> (B, Hh*Ww) resized to this block's latent resolution
    (IPAdapterMaskProcessor.downsample equivalent, reference
    attention_processor.py:382-390)."""
    if ip_mask is None:
        return None
    # bicubic like the reference: IPAdapterMaskProcessor.downsample calls
    # F.interpolate(mode="bicubic"). jax "cubic" is the Keys kernel with
    # a=-0.5 vs torch's a=-0.75 — the closest available method (bilinear
    # visibly softened mask boundaries vs the reference)
    m = jax.image.resize(
        ip_mask.astype(jnp.float32), (B, Hh, Ww), method="cubic"
    )
    return m.reshape(B, Hh * Ww)


def _gn(
    name: str, groups: int, eps: float = 1e-5, dtype: jnp.dtype = jnp.float32,
    fast_reductions: bool = False,
) -> nn.GroupNorm:
    # normalization statistics default to f32 regardless of compute dtype;
    # fast_norms keeps the normalization arithmetic in the compute dtype and
    # fast_reductions additionally lifts flax's forced-f32 stats reductions
    return nn.GroupNorm(
        num_groups=groups, epsilon=eps, name=name, dtype=dtype,
        force_float32_reductions=not fast_reductions,
    )


class ResnetBlock(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype = jnp.float32
    fast_reductions: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        h = jax.nn.silu(_gn("norm1", self.groups, dtype=self.norm_dtype, fast_reductions=self.fast_reductions)(x)).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1", dtype=self.dtype)(h)
        t = nn.Dense(self.out_channels, name="time_emb_proj", dtype=self.dtype)(
            jax.nn.silu(temb).astype(self.dtype)
        )
        h = h + t[:, None, None, :]
        h = jax.nn.silu(_gn("norm2", self.groups, dtype=self.norm_dtype, fast_reductions=self.fast_reductions)(h)).astype(self.dtype)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2", dtype=self.dtype)(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(
                self.out_channels, (1, 1), padding="VALID", name="conv_shortcut",
                dtype=self.dtype,
            )(x)
        return x.astype(self.dtype) + h


class _LoraDense(nn.Module):
    """Dense (optionally bias-free) with an optional LoRA branch.

    peft convention: delta = (alpha/r) * x @ A^T @ B^T with B zero-init
    (/root/reference/train.py:346-354 targets attn2.to_q/to_k/to_v).
    """

    features: int
    use_bias: bool = False
    lora_rank: int = 0
    lora_alpha: float = 1.0
    lora_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = nn.Dense(self.features, use_bias=self.use_bias, name="base", dtype=self.dtype)(x)
        if self.lora_rank > 0:
            a = self.param(
                "lora_A",
                nn.initializers.he_uniform(),
                (x.shape[-1], self.lora_rank),
                jnp.float32,
            )
            b = self.param(
                "lora_B", nn.initializers.zeros, (self.lora_rank, self.features), jnp.float32
            )
            h = x
            if self.lora_dropout > 0.0:
                h = nn.Dropout(rate=self.lora_dropout, deterministic=not train)(h)
            delta = (h @ a.astype(self.dtype)) @ b.astype(self.dtype)
            y = y + delta * (self.lora_alpha / self.lora_rank)
        return y


class _GEGLUDense(nn.Module):
    """GEGLU up-projection returning the (value, gate) halves directly.

    Parameter-tree- and numerics-identical to
    ``nn.Dense(features)`` + ``jnp.split(.., 2, -1)`` (kernel (C, 8C),
    bias (8C,), lecun_normal/zeros init); see UNetConfig.tp_friendly_ffn
    for why the weight is sliced instead of the activation.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        half = self.features // 2
        k = kernel.astype(self.dtype)
        b = bias.astype(self.dtype)
        x = x.astype(self.dtype)
        return x @ k[:, :half] + b[:half], x @ k[:, half:] + b[half:]


class _Conv1x1AsMatmul(nn.Module):
    """A 1x1 VALID conv executed as a matmul on the (B, S, C) view.

    Declares the SAME parameters as ``nn.Conv(features, (1, 1))`` —
    kernel (1, 1, C_in, features) lecun_normal, bias (features,) zeros —
    so checkpoints are interchangeable with the NHWC conv form; the
    contraction x @ kernel[0, 0] + bias is the identical dot product.
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, S, C)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        return x @ kernel[0, 0].astype(self.dtype) + bias.astype(self.dtype)


class SelfAttention(nn.Module):
    """attn1. With use_flash, long sequences go through the Pallas TPU flash
    attention kernel — the jnp path materializes (B, H, S, S) f32 scores in
    HBM, which at the 64x64 latent level (S=4096) is ~2 GB per layer and is
    what makes the naive UNet forward bandwidth-bound."""

    channels: int
    num_heads: int
    use_flash: bool = False
    flash_min_seq: int = 1024
    fast_scores: bool = False
    flash_fn: Optional[Callable] = None  # shard_map wrapper (parallel/flash.py)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, S, C = x.shape
        H = self.num_heads
        d = C // H
        q = nn.Dense(C, use_bias=False, name="to_q", dtype=self.dtype)(x).reshape(B, S, H, d)
        k = nn.Dense(C, use_bias=False, name="to_k", dtype=self.dtype)(x).reshape(B, S, H, d)
        v = nn.Dense(C, use_bias=False, name="to_v", dtype=self.dtype)(x).reshape(B, S, H, d)
        if self.use_flash and S >= self.flash_min_seq:
            # custom flash kernel: keeps K/V in VMEM, tuned for the SD UNet's
            # small head dims (jax's stock kernel pads d 40->128 and loses);
            # fast_scores runs the kernel matmuls at the bf16 MXU rate
            # (inference only — gradients always take the f32 path).
            # flash_fn (when set) is the shard_map-wrapped kernel that keeps
            # this fast path alive under TP/SP multi-chip serving
            if self.flash_fn is not None:
                out = self.flash_fn(q, k, v, self.fast_scores)
            else:
                from photoverse_tpu.ops.flash_sdpa import flash_sdpa_diff

                out = flash_sdpa_diff(q, k, v, self.fast_scores)
        else:
            out = sdpa(q, k, v, fast_scores=self.fast_scores)
        out = out.reshape(B, S, C)
        return nn.Dense(C, name="to_out", dtype=self.dtype)(out)


class DualCrossAttention(nn.Module):
    """PhotoVerse attn2: text cross-attention + identity cross-attention.

    Matches the semantics of PhotoVerseAttnProcessor2_0.__call__
    (/root/reference/models/attention_processor.py:245-435) with LoRA folded
    into to_q/to_k/to_v. Returns (out, v_ip_norm (B, H, K)).
    """

    channels: int
    num_heads: int
    cross_dim: int
    lora_rank: int = 0
    lora_alpha: float = 1.0
    lora_dropout: float = 0.0
    fusion_scale: float = 2.0
    fusion_rule1: float = 1.0 / 3.0
    fusion_rule2: float = 2.0 / 3.0
    train: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, S, C)
        text_ctx: jnp.ndarray,  # (B, St, cross_dim)
        id_ctx: jnp.ndarray,  # (B, K, cross_dim)
        fusion_u: jnp.ndarray,  # scalar uniform (ignored in eval)
        ip_mask: Optional[jnp.ndarray] = None,  # (B, S) spatial identity mask
        ctx_kv: Optional[Tuple[jnp.ndarray, ...]] = None,  # (k, v, k_ip, v_ip)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        train = self.train
        B, S, C = x.shape
        H = self.num_heads
        d = C // H
        lora_kw = dict(
            lora_rank=self.lora_rank,
            lora_alpha=self.lora_alpha,
            lora_dropout=self.lora_dropout,
            dtype=self.dtype,
        )
        q = _LoraDense(C, name="to_q", **lora_kw)(x, train).reshape(B, S, H, d)
        if ctx_kv is not None:
            # the context K/V are loop-invariant across denoise steps —
            # precomputed once outside the scan (engine.precompute_ctx_kv)
            k, v, k_ip, v_ip = (a.astype(self.dtype) for a in ctx_kv)
        else:
            k = _LoraDense(C, name="to_k", **lora_kw)(text_ctx, train).reshape(
                B, -1, H, d
            )
            v = _LoraDense(C, name="to_v", **lora_kw)(text_ctx, train).reshape(
                B, -1, H, d
            )
            k_ip = nn.Dense(C, use_bias=False, name="to_k_ip", dtype=self.dtype)(
                id_ctx
            ).reshape(B, -1, H, d)
            v_ip = nn.Dense(C, use_bias=False, name="to_v_ip", dtype=self.dtype)(
                id_ctx
            ).reshape(B, -1, H, d)
        if ip_mask is not None:
            # masked identity attention (reference attention_processor.py:
            # 359-390): out = text_attn + scale * (id_attn * downsampled mask);
            # no stochastic fusion on the masked path
            from photoverse_tpu.ops.attention import sdpa as _sdpa

            text_out = _sdpa(q, k, v)
            id_out = _sdpa(q, k_ip, v_ip)
            mask = ip_mask.astype(text_out.dtype)[:, :, None, None]
            fused = text_out + self.fusion_scale * (id_out * mask)
            v_ip_norm = jnp.sqrt(
                jnp.sum(jnp.square(v_ip.astype(jnp.float32)), axis=-1)
            ).transpose(0, 2, 1)
        else:
            fused, v_ip_norm = dual_context_attention(
                q, k, v, k_ip, v_ip,
                train=train, fusion_u=fusion_u, scale=self.fusion_scale,
                rule1=self.fusion_rule1, rule2=self.fusion_rule2,
            )
        out = nn.Dense(C, name="to_out", dtype=self.dtype)(fused.reshape(B, S, C))
        return out, v_ip_norm


class TransformerBlock(nn.Module):
    """Spatial transformer: GN -> proj_in -> (self, dual-cross, GEGLU ff) -> proj_out."""

    channels: int
    num_heads: int
    cross_dim: int
    lora_rank: int = 0
    lora_alpha: float = 1.0
    lora_dropout: float = 0.0
    fusion_scale: float = 2.0
    fusion_rule1: float = 1.0 / 3.0
    fusion_rule2: float = 2.0 / 3.0
    use_flash: bool = False
    flash_min_seq: int = 1024
    fast_scores: bool = False
    flash_fn: Optional[Callable] = None
    train: bool = False
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype = jnp.float32
    fast_reductions: bool = False
    fused_q_tile: int = 512
    tp_friendly_ffn: bool = False
    seq_stream: bool = False  # UNetConfig.seq_transformer

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # (B, H, W, C)
        text_ctx: jnp.ndarray,
        id_ctx: jnp.ndarray,
        fusion_u: jnp.ndarray,  # scalar uniform (ignored in eval)
        ip_mask: Optional[jnp.ndarray] = None,  # (B, Hm, Wm) in [0, 1]
        ctx_kv: Optional[Tuple[jnp.ndarray, ...]] = None,
        fused_bundle: Optional[dict] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, Hh, Ww, C = x.shape
        gn = _gn(
            "norm", self.groups, eps=1e-6, dtype=self.norm_dtype,
            fast_reductions=self.fast_reductions,
        )
        if self.seq_stream:
            # whole block in the (B, S, C) sequence layout: GroupNorm
            # statistics over (S, C/G) are the same reduction as (H, W, C/G),
            # and proj_in is the identical dot via the conv params
            residual = x.reshape(B, Hh * Ww, C)
            h = _Conv1x1AsMatmul(C, name="proj_in", dtype=self.dtype)(
                gn(residual).astype(self.dtype)
            )
        else:
            residual = x
            h = gn(x).astype(self.dtype)
            h = nn.Conv(C, (1, 1), padding="VALID", name="proj_in", dtype=self.dtype)(h)
            h = h.reshape(B, Hh * Ww, C)

        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5, name=name, dtype=self.norm_dtype,
            force_float32_reductions=not self.fast_reductions,
        )
        h = h + SelfAttention(
            C, self.num_heads, use_flash=self.use_flash,
            flash_min_seq=self.flash_min_seq,
            fast_scores=self.fast_scores, flash_fn=self.flash_fn,
            name="attn1", dtype=self.dtype,
        )(ln("norm1")(h).astype(self.dtype))
        if fused_bundle is not None and not self.train and ip_mask is None:
            # the whole block tail (LN2 + dual-cross + LN3 + GEGLU + both
            # residuals) as ONE Pallas call; weights/ctx arrive pre-staged
            # from engine.precompute_fused_bundles (eval-only fast path)
            from photoverse_tpu.ops.fused_block import fused_cross_ff

            # fast = the block's compute dtype (bf16 Dense semantics);
            # fast_ln mirrors fast_norms via norm_dtype — the same two knobs
            # that control the jnp layers control the kernel
            kernel_fast = self.dtype == jnp.bfloat16
            h = fused_cross_ff(
                h, fused_bundle, self.num_heads,
                q_tile=self.fused_q_tile, fast=kernel_fast,
                fast_ln=kernel_fast and self.norm_dtype == self.dtype,
            )
            # (B, H, K, d), sublane-padded — slice back to the real tokens
            v_ip = fused_bundle["ctx"][3][:, :, : fused_bundle["id_tokens"]]
            v_ip_norm = jnp.sqrt(
                jnp.sum(jnp.square(v_ip.astype(jnp.float32)), axis=-1)
            )
        else:
            attn2_out, v_ip_norm = DualCrossAttention(
                C,
                self.num_heads,
                self.cross_dim,
                lora_rank=self.lora_rank,
                lora_alpha=self.lora_alpha,
                lora_dropout=self.lora_dropout,
                fusion_scale=self.fusion_scale,
                fusion_rule1=self.fusion_rule1,
                fusion_rule2=self.fusion_rule2,
                train=self.train,
                name="attn2",
                dtype=self.dtype,
            )(
                ln("norm2")(h).astype(self.dtype),
                text_ctx,
                id_ctx,
                fusion_u,
                _downsample_ip_mask(ip_mask, B, Hh, Ww),
                ctx_kv,
            )
            h = h + attn2_out

            # GEGLU feed-forward
            ff_in = ln("norm3")(h).astype(self.dtype)
            if self.tp_friendly_ffn:
                a, gate = _GEGLUDense(8 * C, name="ff_proj", dtype=self.dtype)(
                    ff_in
                )
            else:
                proj = nn.Dense(8 * C, name="ff_proj", dtype=self.dtype)(ff_in)
                a, gate = jnp.split(proj, 2, axis=-1)
            h = h + nn.Dense(C, name="ff_out", dtype=self.dtype)(
                a * jax.nn.gelu(gate, approximate=False)
            )

        if self.seq_stream:
            h = _Conv1x1AsMatmul(C, name="proj_out", dtype=self.dtype)(h)
            h = (h + residual.astype(self.dtype)).reshape(B, Hh, Ww, C)
            return h, v_ip_norm
        h = h.reshape(B, Hh, Ww, C)
        h = nn.Conv(C, (1, 1), padding="VALID", name="proj_out", dtype=self.dtype)(h)
        return h + residual.astype(self.dtype), v_ip_norm


class UNet2DCondition(nn.Module):
    """The SD-1.5 denoiser with dual conditioning.

    forward(sample (B,H,W,4), timesteps (B,), text_ctx (B,77,768),
            id_ctx (B,K,768)) -> (eps (B,H,W,4), v_ip_norms (B, L*heads*K))
    """

    config: UNetConfig = UNetConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        text_ctx: jnp.ndarray,
        id_ctx: jnp.ndarray,
        *,
        train: bool = False,
        fusion_rng: Optional[jax.Array] = None,
        ip_mask: Optional[jnp.ndarray] = None,
        ctx_kv: Optional[Tuple] = None,  # per-cross-layer (k, v, k_ip, v_ip)
        fused_bundles: Optional[Tuple] = None,  # per-layer bundle or None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        ch = cfg.block_out_channels
        n_blocks = len(ch)
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        if train and fusion_rng is None:
            raise ValueError("fusion_rng is required when train=True")
        layer_counter = [0]

        def next_layer_args():
            """(fusion_u, ctx_kv, fused_bundle) for the next cross-attn
            layer in call order."""
            i = layer_counter[0]
            layer_counter[0] += 1
            if train:
                u = jax.random.uniform(jax.random.fold_in(fusion_rng, i), ())
            else:
                u = jnp.zeros(())  # unused in eval (fusion is a sum)
            return (
                u,
                None if ctx_kv is None else ctx_kv[i],
                None if fused_bundles is None else fused_bundles[i],
            )

        # time embedding: sinusoid(320) -> Dense -> silu -> Dense (1280)
        temb = timestep_embedding(timesteps, ch[0])
        temb = nn.Dense(cfg.time_embed_dim, name="time_embed_1", dtype=self.dtype)(
            temb.astype(self.dtype)
        )
        temb = nn.Dense(cfg.time_embed_dim, name="time_embed_2", dtype=self.dtype)(
            jax.nn.silu(temb)
        )

        norm_dtype = self.dtype if cfg.fast_norms else jnp.float32
        fast_red = cfg.fast_norms and cfg.fast_norm_reductions
        if cfg.remat_policy not in ("", "dots"):
            # an unknown policy silently meaning "recompute everything"
            # would read as an unexplained step-time regression
            raise ValueError(
                f"unknown remat_policy {cfg.remat_policy!r}; use '' or 'dots'"
            )
        remat_kw = {}
        if cfg.remat and cfg.remat_policy == "dots":
            remat_kw = dict(
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            )
        ResnetB = nn.remat(ResnetBlock, **remat_kw) if cfg.remat else ResnetBlock
        res_kw = dict(dtype=self.dtype, norm_dtype=norm_dtype, fast_reductions=fast_red)
        TransformerB = (
            nn.remat(TransformerBlock, **remat_kw) if cfg.remat else TransformerBlock
        )
        tf_kw = dict(
            num_heads=cfg.num_heads,
            cross_dim=cfg.cross_attention_dim,
            lora_rank=cfg.lora_rank,
            lora_alpha=cfg.lora_alpha,
            lora_dropout=cfg.lora_dropout,
            fusion_scale=cfg.fusion_scale,
            fusion_rule1=cfg.fusion_rule1,
            fusion_rule2=cfg.fusion_rule2,
            use_flash=cfg.use_flash_attention,
            flash_min_seq=cfg.flash_min_seq,
            fast_scores=cfg.fast_attention_scores,
            flash_fn=cfg.flash_fn,
            train=train,
            groups=cfg.norm_num_groups,
            dtype=self.dtype,
            norm_dtype=norm_dtype,
            fast_reductions=fast_red,
            fused_q_tile=cfg.fused_block_q_tile,
            tp_friendly_ffn=cfg.tp_friendly_ffn,
            seq_stream=cfg.seq_transformer,
        )

        norms: List[jnp.ndarray] = []
        x = nn.Conv(ch[0], (3, 3), padding=1, name="conv_in", dtype=self.dtype)(
            sample.astype(self.dtype)
        )
        skips = [x]

        # down path: blocks 0..n-2 are cross-attn blocks, the last is plain
        for i, c in enumerate(ch):
            has_attn = i < n_blocks - 1
            for j in range(cfg.layers_per_block):
                x = ResnetB(
                    c, cfg.norm_num_groups, name=f"down_{i}_res_{j}", **res_kw
                )(x, temb)
                if has_attn:
                    u, kv, fb = next_layer_args()
                    x, vn = TransformerB(c, name=f"down_{i}_attn_{j}", **tf_kw)(
                        x, text_ctx, id_ctx, u, ip_mask, kv, fb
                    )
                    norms.append(vn)
                skips.append(x)
            if i < n_blocks - 1:
                x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
                x = nn.Conv(
                    c, (3, 3), strides=(2, 2), padding="VALID",
                    name=f"down_{i}_downsample", dtype=self.dtype,
                )(x)
                skips.append(x)

        # mid
        x = ResnetB(ch[-1], cfg.norm_num_groups, name="mid_res_0", **res_kw)(
            x, temb
        )
        u, kv, fb = next_layer_args()
        x, vn = TransformerB(ch[-1], name="mid_attn", **tf_kw)(
            x, text_ctx, id_ctx, u, ip_mask, kv, fb
        )
        norms.append(vn)
        x = ResnetB(ch[-1], cfg.norm_num_groups, name="mid_res_1", **res_kw)(
            x, temb
        )

        # up path: block 0 is plain, blocks 1..n-1 are cross-attn blocks
        rev = list(reversed(ch))
        for i, c in enumerate(rev):
            has_attn = i > 0
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                x = jnp.concatenate([x, skip.astype(self.dtype)], axis=-1)
                x = ResnetB(
                    c, cfg.norm_num_groups, name=f"up_{i}_res_{j}", **res_kw
                )(x, temb)
                if has_attn:
                    u, kv, fb = next_layer_args()
                    x, vn = TransformerB(c, name=f"up_{i}_attn_{j}", **tf_kw)(
                        x, text_ctx, id_ctx, u, ip_mask, kv, fb
                    )
                    norms.append(vn)
            if i < n_blocks - 1:
                B, Hh, Ww, C = x.shape
                x = jax.image.resize(x, (B, Hh * 2, Ww * 2, C), method="nearest")
                x = nn.Conv(
                    c, (3, 3), padding=1, name=f"up_{i}_upsample", dtype=self.dtype
                )(x)

        x = jax.nn.silu(
            _gn("conv_norm_out", cfg.norm_num_groups, dtype=norm_dtype, fast_reductions=fast_red)(x)
        ).astype(self.dtype)
        eps = nn.Conv(cfg.out_channels, (3, 3), padding=1, name="conv_out", dtype=self.dtype)(x)

        # (B, L, H, K) -> (B, L*H*K); order is call order (mean-invariant,
        # matching the reference regularizer at models/unet.py:38-47)
        v_ip_norms = jnp.stack(norms, axis=1)
        v_ip_norms = v_ip_norms.reshape(v_ip_norms.shape[0], -1)
        return eps.astype(jnp.float32), v_ip_norms
