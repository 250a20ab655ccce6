"""Torch golden replica of the diffusers AutoencoderKL semantics for
converter/architecture parity tests (state-dict keys match diffusers)."""

import torch
from torch import nn
import torch.nn.functional as F


class RefVAEResnet(nn.Module):
    def __init__(self, in_ch, out_ch, groups=32):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=1e-6)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=1e-6)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return sc + h


class RefVAEAttn(nn.Module):
    def __init__(self, ch, groups=32):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch), nn.Dropout(0.0)])

    def forward(self, x):
        B, C, H, W = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(B, H * W, C)
        q, k, v = self.to_q(h), self.to_k(h), self.to_v(h)
        out = F.scaled_dot_product_attention(
            q.unsqueeze(1), k.unsqueeze(1), v.unsqueeze(1)
        ).squeeze(1)
        out = self.to_out[0](out).reshape(B, H, W, C).permute(0, 3, 1, 2)
        return x + out


class _Mid(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.resnets = nn.ModuleList(
            [RefVAEResnet(ch, ch, groups), RefVAEResnet(ch, ch, groups)]
        )
        self.attentions = nn.ModuleList([RefVAEAttn(ch, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class _Wrap(nn.Module):
    def __init__(self, conv):
        super().__init__()
        self.conv = conv


class RefEncoder(nn.Module):
    def __init__(self, ch=(32, 64), layers=2, latent=4, groups=8):
        super().__init__()
        n = len(ch)
        self.conv_in = nn.Conv2d(3, ch[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        in_c = ch[0]
        for i, c in enumerate(ch):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for j in range(layers):
                blk.resnets.append(RefVAEResnet(in_c if j == 0 else c, c, groups))
            if i < n - 1:
                blk.downsamplers = nn.ModuleList(
                    [_Wrap(nn.Conv2d(c, c, 3, stride=2, padding=0))]
                )
            in_c = c
            self.down_blocks.append(blk)
        self.mid_block = _Mid(ch[-1], groups)
        self.conv_norm_out = nn.GroupNorm(groups, ch[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(ch[-1], 2 * latent, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            for res in blk.resnets:
                x = res(x)
            if hasattr(blk, "downsamplers"):
                x = F.pad(x, (0, 1, 0, 1))
                x = blk.downsamplers[0].conv(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class RefDecoder(nn.Module):
    def __init__(self, ch=(32, 64), layers=2, latent=4, groups=8):
        super().__init__()
        rev = list(reversed(ch))
        n = len(rev)
        self.conv_in = nn.Conv2d(latent, rev[0], 3, padding=1)
        self.mid_block = _Mid(rev[0], groups)
        self.up_blocks = nn.ModuleList()
        in_c = rev[0]
        for i, c in enumerate(rev):
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for j in range(layers + 1):
                blk.resnets.append(RefVAEResnet(in_c if j == 0 else c, c, groups))
            if i < n - 1:
                blk.upsamplers = nn.ModuleList([_Wrap(nn.Conv2d(c, c, 3, padding=1))])
            in_c = c
            self.up_blocks.append(blk)
        self.conv_norm_out = nn.GroupNorm(groups, rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], 3, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block(x)
        for blk in self.up_blocks:
            for res in blk.resnets:
                x = res(x)
            if hasattr(blk, "upsamplers"):
                x = F.interpolate(x, scale_factor=2.0, mode="nearest")
                x = blk.upsamplers[0].conv(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class RefVAE(nn.Module):
    def __init__(self, ch=(32, 64), layers=2, latent=4, groups=8):
        super().__init__()
        self.encoder = RefEncoder(ch, layers, latent, groups)
        self.decoder = RefDecoder(ch, layers, latent, groups)
        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = nn.Conv2d(latent, latent, 1)

    def encode_moments(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))
