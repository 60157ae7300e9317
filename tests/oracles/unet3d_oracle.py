"""Torch oracle for the video UNet3D: independently implements the
reference semantics (modules/video_unet_temporal/*) with the reference's
state-dict key layout, at fixture scale, to golden-test the Flax port and
converter. Test fixture only.

Layout convention here is torch-style (b, c, f, h, w); the test adapter
transposes at the boundary.
"""

import math

import torch
import torch.nn.functional as F
from torch import nn
from einops import rearrange, repeat


class OTimestepEmbedding(nn.Module):
    def __init__(self, cin, dim):
        super().__init__()
        self.linear_1 = nn.Linear(cin, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(F.silu(self.linear_1(x)))


def sinusoid_t(t, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None]
    emb = torch.cat([torch.sin(args), torch.cos(args)], dim=-1)
    return torch.cat([emb[:, half:], emb[:, :half]], dim=-1)  # flip_sin_to_cos


class OInflatedConv(nn.Conv2d):
    def forward(self, x):
        f = x.shape[2]
        x = rearrange(x, "b c f h w -> (b f) c h w")
        x = super().forward(x)
        return rearrange(x, "(b f) c h w -> b c f h w", f=f)


class OResnetBlock3D(nn.Module):
    def __init__(self, cin, cout, temb_dim, groups, eps):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = OInflatedConv(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = OInflatedConv(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = OInflatedConv(cin, cout, 1)
        self.has_short = cin != cout

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.has_short:
            x = self.conv_shortcut(x)
        return x + h


class OAttention(nn.Module):
    """diffusers Attention: to_q/k/v no bias, to_out.0 with bias."""

    def __init__(self, dim, heads, head_dim, context_dim=None):
        super().__init__()
        inner = heads * head_dim
        ctx = context_dim or dim
        self.heads = heads
        self.scale = head_dim ** -0.5
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(ctx, inner, bias=False)
        self.to_v = nn.Linear(ctx, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, dim), nn.Identity()])

    def forward(self, x, context=None):
        context = x if context is None else context
        q, k, v = self.to_q(x), self.to_k(context), self.to_v(context)
        b, s, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, s, self.heads, -1).transpose(1, 2)
        k = k.reshape(b, sk, self.heads, -1).transpose(1, 2)
        v = v.reshape(b, sk, self.heads, -1).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, s, -1)
        return self.to_out[0](o)


class OFeedForward(nn.Module):
    def __init__(self, dim, mult=4):
        super().__init__()
        proj = nn.Linear(dim, dim * mult * 2)
        self.net = nn.ModuleList([nn.Module(), nn.Identity(), nn.Linear(dim * mult, dim)])
        self.net[0].proj = proj

    def forward(self, x):
        h = self.net[0].proj(x)
        h, gate = h.chunk(2, dim=-1)
        return self.net[2](h * F.gelu(gate))


class OBasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, head_dim, context_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = OAttention(dim, heads, head_dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = OAttention(dim, heads, head_dim, context_dim=context_dim)
        self.norm3 = nn.LayerNorm(dim)
        self.ff = OFeedForward(dim)

    def forward(self, x, context):
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), context) + x
        return self.ff(self.norm3(x)) + x


class OTransformer3D(nn.Module):
    def __init__(self, c, heads, head_dim, groups, context_dim):
        super().__init__()
        inner = heads * head_dim
        self.norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.proj_in = nn.Conv2d(c, inner, 1)
        self.transformer_blocks = nn.ModuleList(
            [OBasicTransformerBlock(inner, heads, head_dim, context_dim)]
        )
        self.proj_out = nn.Conv2d(inner, c, 1)

    def forward(self, x, context):
        f = x.shape[2]
        x2 = rearrange(x, "b c f h w -> (b f) c h w")
        ctx = repeat(context, "b n c -> (b f) n c", f=f)
        b, c, h, w = x2.shape
        res = x2
        h_ = self.proj_in(self.norm(x2))
        h_ = h_.permute(0, 2, 3, 1).reshape(b, h * w, -1)
        h_ = self.transformer_blocks[0](h_, ctx)
        h_ = h_.reshape(b, h, w, -1).permute(0, 3, 1, 2)
        out = self.proj_out(h_) + res
        return rearrange(out, "(b f) c h w -> b c f h w", f=f)


class OPositionalEncoding(nn.Module):
    def __init__(self, d, max_len):
        super().__init__()
        position = torch.arange(max_len).unsqueeze(1)
        div = torch.exp(torch.arange(0, d, 2) * (-math.log(10000.0) / d))
        pe = torch.zeros(1, max_len, d)
        pe[0, :, 0::2] = torch.sin(position * div)
        pe[0, :, 1::2] = torch.cos(position * div)
        self.register_buffer("pe", pe)

    def forward(self, x, start):
        if start + x.size(1) > self.pe.size(1):
            start = start - self.pe.size(1)
        return x + self.pe[:, start: start + x.size(1)]


class OVersatileAttention(OAttention):
    def __init__(self, dim, heads, head_dim, max_len):
        super().__init__(dim, heads, head_dim)
        self.pos_encoder = OPositionalEncoding(dim, max_len)

    def forward(self, x, video_length, start):
        d = x.shape[1]
        x = rearrange(x, "(b f) d c -> (b d) f c", f=video_length)
        x = self.pos_encoder(x, start)
        out = super().forward(x)
        return rearrange(out, "(b d) f c -> (b f) d c", d=d)


class OTemporalBlock(nn.Module):
    def __init__(self, dim, heads, head_dim, max_len, n_attn=2):
        super().__init__()
        self.attention_blocks = nn.ModuleList(
            [OVersatileAttention(dim, heads, head_dim, max_len) for _ in range(n_attn)]
        )
        self.norms = nn.ModuleList([nn.LayerNorm(dim) for _ in range(n_attn)])
        self.ff = OFeedForward(dim)
        self.ff_norm = nn.LayerNorm(dim)

    def forward(self, x, video_length, start):
        for attn, norm in zip(self.attention_blocks, self.norms):
            x = attn(norm(x), video_length, start) + x
        return self.ff(self.ff_norm(x)) + x


class OTemporalTransformer(nn.Module):
    def __init__(self, c, heads, groups, max_len, n_blocks=1):
        super().__init__()
        self.norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.proj_in = nn.Linear(c, c)
        self.transformer_blocks = nn.ModuleList(
            [OTemporalBlock(c, heads, c // heads, max_len) for _ in range(n_blocks)]
        )
        self.proj_out = nn.Linear(c, c)

    def forward(self, x, start):
        f = x.shape[2]
        x2 = rearrange(x, "b c f h w -> (b f) c h w")
        b, c, h, w = x2.shape
        res = x2
        h_ = self.norm(x2).permute(0, 2, 3, 1).reshape(b, h * w, c)
        h_ = self.proj_in(h_)
        for blk in self.transformer_blocks:
            h_ = blk(h_, f, start)
        h_ = self.proj_out(h_)
        h_ = h_.reshape(b, h, w, c).permute(0, 3, 1, 2)
        out = h_ + res
        return rearrange(out, "(b f) c h w -> b c f h w", f=f)


class OMotionModule(nn.Module):
    def __init__(self, c, heads, groups, max_len):
        super().__init__()
        self.temporal_transformer = OTemporalTransformer(c, heads, groups, max_len)
        nn.init.zeros_(self.temporal_transformer.proj_out.weight)
        nn.init.zeros_(self.temporal_transformer.proj_out.bias)

    def forward(self, x, start):
        return self.temporal_transformer(x, start)


class ODownsample(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = OInflatedConv(c, c, 3, stride=2, padding=1)

    def forward(self, x):
        return self.conv(x)


class OUpsample(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = OInflatedConv(c, c, 3, padding=1)

    def forward(self, x):
        f = x.shape[2]
        x = rearrange(x, "b c f h w -> (b f) c h w")
        x = F.interpolate(x, scale_factor=2.0, mode="nearest")
        x = rearrange(x, "(b f) c h w -> b c f h w", f=f)
        return self.conv(x)


class OracleUNet3D(nn.Module):
    """Tiny UNet mirroring configs/instruct_v2v.yaml structure."""

    def __init__(self, cin=8, cout=4, chans=(8, 16, 16, 16), heads=2, ctx_dim=12,
                 groups=4, eps=1e-5, m_heads=2, max_len=8, layers=2,
                 mid_motion=False):
        super().__init__()
        temb_dim = chans[0] * 4
        self.chans = chans
        self.layers = layers
        self.conv_in = OInflatedConv(cin, chans[0], 3, padding=1)
        self.time_embedding = OTimestepEmbedding(chans[0], temb_dim)

        self.down_blocks = nn.ModuleList()
        out_ch = chans[0]
        for i in range(4):
            in_ch, out_ch = out_ch, chans[i]
            blk = nn.Module()
            blk.is_cross = i < 3
            blk.resnets = nn.ModuleList()
            blk.motion_modules = nn.ModuleList()
            if blk.is_cross:
                blk.attentions = nn.ModuleList()
            for j in range(layers):
                blk.resnets.append(
                    OResnetBlock3D(in_ch if j == 0 else out_ch, out_ch, temb_dim, groups, eps))
                if blk.is_cross:
                    blk.attentions.append(
                        OTransformer3D(out_ch, heads, out_ch // heads, groups, ctx_dim))
                blk.motion_modules.append(OMotionModule(out_ch, m_heads, groups, max_len))
            if i < 3:
                blk.downsamplers = nn.ModuleList([ODownsample(out_ch)])
            self.down_blocks.append(blk)

        mb = nn.Module()
        mb.resnets = nn.ModuleList([
            OResnetBlock3D(chans[-1], chans[-1], temb_dim, groups, eps),
            OResnetBlock3D(chans[-1], chans[-1], temb_dim, groups, eps),
        ])
        mb.attentions = nn.ModuleList([
            OTransformer3D(chans[-1], heads, chans[-1] // heads, groups, ctx_dim)])
        self.mid_block = mb

        rev = list(reversed(chans))
        self.up_blocks = nn.ModuleList()
        prev_ch = rev[0]
        for i in range(4):
            out_ch = rev[i]
            in_ch = rev[min(i + 1, 3)]
            blk = nn.Module()
            blk.is_cross = i > 0
            blk.resnets = nn.ModuleList()
            blk.motion_modules = nn.ModuleList()
            if blk.is_cross:
                blk.attentions = nn.ModuleList()
            for j in range(layers + 1):
                skip_ch = in_ch if j == layers else out_ch
                res_in = prev_ch if j == 0 else out_ch
                blk.resnets.append(
                    OResnetBlock3D(res_in + skip_ch, out_ch, temb_dim, groups, eps))
                if blk.is_cross:
                    blk.attentions.append(
                        OTransformer3D(out_ch, heads, out_ch // heads, groups, ctx_dim))
                blk.motion_modules.append(OMotionModule(out_ch, m_heads, groups, max_len))
            if i < 3:
                blk.upsamplers = nn.ModuleList([OUpsample(out_ch)])
            self.up_blocks.append(blk)
            prev_ch = out_ch

        self.conv_norm_out = nn.GroupNorm(groups, chans[0], eps=eps)
        self.conv_out = OInflatedConv(chans[0], cout, 3, padding=1)

    def forward(self, sample, t, context, start=0):
        temb = self.time_embedding(sinusoid_t(t, self.chans[0]))
        x = self.conv_in(sample)
        skips = [x]
        for blk in self.down_blocks:
            for j in range(self.layers):
                x = blk.resnets[j](x, temb)
                if blk.is_cross:
                    x = blk.attentions[j](x, context)
                x = blk.motion_modules[j](x, start)
                skips.append(x)
            if hasattr(blk, "downsamplers"):
                x = blk.downsamplers[0](x)
                skips.append(x)
        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, context)
        x = self.mid_block.resnets[1](x, temb)
        for blk in self.up_blocks:
            for j in range(self.layers + 1):
                x = torch.cat([x, skips.pop()], dim=1)
                x = blk.resnets[j](x, temb)
                if blk.is_cross:
                    x = blk.attentions[j](x, context)
                x = blk.motion_modules[j](x, start)
            if hasattr(blk, "upsamplers"):
                x = blk.upsamplers[0](x)
        x = F.silu(self.conv_norm_out(x))
        return self.conv_out(x)
