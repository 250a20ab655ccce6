"""Torch golden replica of the diffusers UNet2DConditionModel semantics
(PhotoVerse-patched) for converter/architecture parity tests.

Module attribute names follow the diffusers state-dict key schema so
`convert_unet(replica.state_dict())` consumes it directly. Inference-mode
fusion only (text + identity sum), matching
/root/reference/models/attention_processor.py:411-412 under no_grad.
"""

import math

import torch
from torch import nn
import torch.nn.functional as F


def timestep_embedding(t, dim, max_period=10000.0):
    half = dim // 2
    freqs = torch.exp(
        -math.log(max_period) * torch.arange(half, dtype=torch.float32) / half
    )
    args = t.float()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class RefResnet(nn.Module):
    def __init__(self, in_ch, out_ch, temb_dim, groups=32):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=1e-5)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_dim, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=1e-5)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (
            nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None
        )

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return sc + h


def _attn(q, k, v, heads):
    B, S, C = q.shape
    d = C // heads
    q = q.view(B, S, heads, d).transpose(1, 2)
    k = k.view(B, -1, heads, d).transpose(1, 2)
    v = v.view(B, -1, heads, d).transpose(1, 2)
    out = F.scaled_dot_product_attention(q, k, v)
    return out.transpose(1, 2).reshape(B, S, C)


class RefSelfAttn(nn.Module):
    def __init__(self, ch, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(ch, ch, bias=False)
        self.to_k = nn.Linear(ch, ch, bias=False)
        self.to_v = nn.Linear(ch, ch, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch), nn.Dropout(0.0)])

    def forward(self, x):
        out = _attn(self.to_q(x), self.to_k(x), self.to_v(x), self.heads)
        return self.to_out[0](out)


class _Processor(nn.Module):
    def __init__(self, cross_dim, ch):
        super().__init__()
        self.to_k_ip = nn.ModuleList([nn.Linear(cross_dim, ch, bias=False)])
        self.to_v_ip = nn.ModuleList([nn.Linear(cross_dim, ch, bias=False)])


class RefDualCrossAttn(nn.Module):
    def __init__(self, ch, cross_dim, heads):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(ch, ch, bias=False)
        self.to_k = nn.Linear(cross_dim, ch, bias=False)
        self.to_v = nn.Linear(cross_dim, ch, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch), nn.Dropout(0.0)])
        self.processor = _Processor(cross_dim, ch)

    def forward(self, x, text_ctx, id_ctx):
        q = self.to_q(x)
        text = _attn(q, self.to_k(text_ctx), self.to_v(text_ctx), self.heads)
        ip = _attn(
            q,
            self.processor.to_k_ip[0](id_ctx),
            self.processor.to_v_ip[0](id_ctx),
            self.heads,
        )
        return self.to_out[0](text + ip)


class RefGEGLUFF(nn.Module):
    def __init__(self, ch):
        super().__init__()

        class Proj(nn.Module):
            def __init__(s):
                super().__init__()
                s.proj = nn.Linear(ch, 8 * ch)

        self.net = nn.ModuleList([Proj(), nn.Dropout(0.0), nn.Linear(4 * ch, ch)])

    def forward(self, x):
        h, gate = self.net[0].proj(x).chunk(2, dim=-1)
        return self.net[2](h * F.gelu(gate))


class RefBasicBlock(nn.Module):
    def __init__(self, ch, cross_dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(ch)
        self.attn1 = RefSelfAttn(ch, heads)
        self.norm2 = nn.LayerNorm(ch)
        self.attn2 = RefDualCrossAttn(ch, cross_dim, heads)
        self.norm3 = nn.LayerNorm(ch)
        self.ff = RefGEGLUFF(ch)

    def forward(self, x, text_ctx, id_ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), text_ctx, id_ctx)
        return x + self.ff(self.norm3(x))


class RefTransformer2D(nn.Module):
    def __init__(self, ch, cross_dim, heads, groups=32):
        super().__init__()
        self.norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.proj_in = nn.Conv2d(ch, ch, 1)
        self.transformer_blocks = nn.ModuleList([RefBasicBlock(ch, cross_dim, heads)])
        self.proj_out = nn.Conv2d(ch, ch, 1)

    def forward(self, x, text_ctx, id_ctx):
        B, C, H, W = x.shape
        residual = x
        h = self.proj_in(self.norm(x))
        h = h.permute(0, 2, 3, 1).reshape(B, H * W, C)
        h = self.transformer_blocks[0](h, text_ctx, id_ctx)
        h = h.reshape(B, H, W, C).permute(0, 3, 1, 2)
        return self.proj_out(h) + residual


class _Down(nn.Module):
    def __init__(self, conv):
        super().__init__()
        self.conv = conv


class RefUNet(nn.Module):
    def __init__(
        self,
        block_out_channels=(32, 64),
        layers_per_block=1,
        cross_dim=16,
        heads=2,
        in_ch=4,
        out_ch=4,
        groups=8,
    ):
        super().__init__()
        ch = block_out_channels
        n = len(ch)
        tdim = ch[0] * 4
        self.sin_dim = ch[0]
        self.conv_in = nn.Conv2d(in_ch, ch[0], 3, padding=1)

        class TimeEmb(nn.Module):
            def __init__(s):
                super().__init__()
                s.linear_1 = nn.Linear(ch[0], tdim)
                s.linear_2 = nn.Linear(tdim, tdim)

        self.time_embedding = TimeEmb()

        self.down_blocks = nn.ModuleList()
        in_c = ch[0]
        for i, c in enumerate(ch):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            blk.attentions = nn.ModuleList() if i < n - 1 else None
            for j in range(layers_per_block):
                blk.resnets.append(RefResnet(in_c if j == 0 else c, c, tdim, groups))
                if i < n - 1:
                    blk.attentions.append(RefTransformer2D(c, cross_dim, heads, groups))
            if i < n - 1:
                blk.downsamplers = nn.ModuleList(
                    [_Down(nn.Conv2d(c, c, 3, stride=2, padding=1))]
                )
            in_c = c
            self.down_blocks.append(blk)

        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [RefResnet(ch[-1], ch[-1], tdim, groups), RefResnet(ch[-1], ch[-1], tdim, groups)]
        )
        self.mid_block.attentions = nn.ModuleList(
            [RefTransformer2D(ch[-1], cross_dim, heads, groups)]
        )

        rev = list(reversed(ch))
        self.up_blocks = nn.ModuleList()
        prev = ch[-1]
        for i, c in enumerate(rev):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            blk.attentions = nn.ModuleList() if i > 0 else None
            input_channel = rev[min(i + 1, n - 1)]
            for j in range(layers_per_block + 1):
                skip_c = input_channel if j == layers_per_block else c
                res_in = prev if j == 0 else c
                blk.resnets.append(RefResnet(res_in + skip_c, c, tdim, groups))
                if i > 0:
                    blk.attentions.append(RefTransformer2D(c, cross_dim, heads, groups))
            if i < n - 1:
                blk.upsamplers = nn.ModuleList(
                    [_Down(nn.Conv2d(c, c, 3, padding=1))]
                )
            prev = c
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(groups, ch[0], eps=1e-5)
        self.conv_out = nn.Conv2d(ch[0], out_ch, 3, padding=1)

    def forward(self, sample, t, text_ctx, id_ctx):
        temb = timestep_embedding(t, self.sin_dim)
        temb = self.time_embedding.linear_2(F.silu(self.time_embedding.linear_1(temb)))

        x = self.conv_in(sample)
        skips = [x]
        for blk in self.down_blocks:
            for j, res in enumerate(blk.resnets):
                x = res(x, temb)
                if blk.attentions is not None:
                    x = blk.attentions[j](x, text_ctx, id_ctx)
                skips.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0].conv(x)
                skips.append(x)

        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, text_ctx, id_ctx)
        x = self.mid_block.resnets[1](x, temb)

        for blk in self.up_blocks:
            for j, res in enumerate(blk.resnets):
                x = torch.cat([x, skips.pop()], dim=1)
                x = res(x, temb)
                if blk.attentions is not None:
                    x = blk.attentions[j](x, text_ctx, id_ctx)
            if hasattr(blk, "upsamplers"):
                x = F.interpolate(x, scale_factor=2.0, mode="nearest")
                x = blk.upsamplers[0].conv(x)

        return self.conv_out(F.silu(self.conv_norm_out(x)))
