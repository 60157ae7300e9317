"""Torch oracle for the ModelScope T2V UNet (modules/damo_text_to_video/
unet_sd.py) at fixture scale, with the reference's state-dict key layout
(input_blocks/middle_block/output_blocks Sequential numbering). Test
fixture only."""

import math

import torch
import torch.nn.functional as F
from torch import nn
from einops import rearrange


def gn(c):
    g = min(32, c)
    while c % g:
        g -= 1
    return nn.GroupNorm(g, c)


def gn_eps(c, eps):
    g = min(32, c)
    while c % g:
        g -= 1
    return nn.GroupNorm(g, c, eps=eps)


class OCrossAttention(nn.Module):
    def __init__(self, qdim, ctx_dim=None, heads=2, dim_head=8):
        super().__init__()
        inner = heads * dim_head
        ctx = ctx_dim or qdim
        self.heads, self.scale = heads, dim_head ** -0.5
        self.to_q = nn.Linear(qdim, inner, bias=False)
        self.to_k = nn.Linear(ctx, inner, bias=False)
        self.to_v = nn.Linear(ctx, inner, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, qdim), nn.Identity())

    def forward(self, x, context=None, sa_share=False):
        h = self.heads
        is_self = context is None
        context = x if context is None else context
        q = self.to_q(x)
        if isinstance(context, (tuple, list)):
            k, v = self.to_k(context[0]), self.to_v(context[1])
        else:
            k, v = self.to_k(context), self.to_v(context)
        q, k, v = (rearrange(t, "b n (h d) -> (b h) n d", h=h) for t in (q, k, v))
        sim = torch.einsum("bid,bjd->bij", q, k) * self.scale
        if is_self and sa_share:
            sims = rearrange(sim, "(b r) i j -> b r i j", b=4).chunk(4)
            sim = torch.cat((sims[0], sims[0], sims[2], sims[2]))
            sim = rearrange(sim, "b r i j -> (b r) i j")
        attn = sim.softmax(dim=-1)
        out = torch.einsum("bij,bjd->bid", attn, v)
        return self.to_out(rearrange(out, "(b h) n d -> b n (h d)", h=h))


class OGEGLU(nn.Module):
    def __init__(self, din, dout):
        super().__init__()
        self.proj = nn.Linear(din, dout * 2)

    def forward(self, x):
        a, gate = self.proj(x).chunk(2, dim=-1)
        return a * F.gelu(gate)


class OFF(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.net = nn.Sequential(OGEGLU(dim, dim * 4), nn.Identity(),
                                 nn.Linear(dim * 4, dim))

    def forward(self, x):
        return self.net(x)


class OBasicBlock(nn.Module):
    def __init__(self, dim, heads, dim_head, ctx_dim):
        super().__init__()
        self.attn1 = OCrossAttention(dim, None, heads, dim_head)
        self.ff = OFF(dim)
        self.attn2 = OCrossAttention(dim, ctx_dim, heads, dim_head)
        self.norm1, self.norm2, self.norm3 = (nn.LayerNorm(dim) for _ in range(3))

    def forward(self, x, context=None, sa_share=False):
        x = self.attn1(self.norm1(x), None, sa_share) + x
        x = self.attn2(self.norm2(x), context) + x
        return self.ff(self.norm3(x)) + x


class OSpatial(nn.Module):
    """use_linear=True spatial transformer."""

    def __init__(self, c, heads, dim_head, ctx_dim):
        super().__init__()
        inner = heads * dim_head
        self.norm = gn_eps(c, 1e-6)
        self.proj_in = nn.Linear(c, inner)
        self.transformer_blocks = nn.ModuleList(
            [OBasicBlock(inner, heads, dim_head, ctx_dim)])
        self.proj_out = nn.Linear(inner, c)
        nn.init.zeros_(self.proj_out.weight)
        nn.init.zeros_(self.proj_out.bias)

    def forward(self, x, context, sa_share=False):
        b, c, h, w = x.shape
        x_in = x
        h_ = self.norm(x)
        h_ = rearrange(h_, "b c h w -> b (h w) c")
        h_ = self.proj_in(h_)
        h_ = self.transformer_blocks[0](h_, context, sa_share)
        h_ = self.proj_out(h_)
        return rearrange(h_, "b (h w) c -> b c h w", h=h) + x_in


class OTemporal(nn.Module):
    """only_self_att, conv1d-proj temporal transformer."""

    def __init__(self, c, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.norm = gn_eps(c, 1e-6)
        self.proj_in = nn.Conv1d(c, inner, 1)
        self.transformer_blocks = nn.ModuleList(
            [OBasicBlock(inner, heads, dim_head, None)])
        self.proj_out = nn.Conv1d(inner, c, 1)
        nn.init.zeros_(self.proj_out.weight)
        nn.init.zeros_(self.proj_out.bias)

    def forward(self, x, sa_share=False):
        b, c, f, h, w = x.shape
        x_in = x
        h_ = self.norm(x)
        h_ = rearrange(h_, "b c f h w -> (b h w) c f")
        h_ = self.proj_in(h_)
        h_ = rearrange(h_, "bhw c f -> bhw f c")
        h_ = self.transformer_blocks[0](h_, None, sa_share)
        h_ = rearrange(h_, "bhw f c -> bhw c f")
        h_ = self.proj_out(h_)
        h_ = rearrange(h_, "(b h w) c f -> b c f h w", b=b, h=h, w=w)
        return h_ + x_in


class OTemporalConv(nn.Module):
    def __init__(self, c):
        super().__init__()
        mk = lambda zero: nn.Sequential(
            gn(c), nn.SiLU(),
            nn.Conv3d(c, c, (3, 1, 1), padding=(1, 0, 0)))
        self.conv1, self.conv2, self.conv3, self.conv4 = (
            mk(False), mk(False), mk(False), mk(True))
        nn.init.zeros_(self.conv4[-1].weight)
        nn.init.zeros_(self.conv4[-1].bias)

    def forward(self, x):
        identity = x
        x = self.conv4(self.conv3(self.conv2(self.conv1(x))))
        return identity + x


class OResBlock(nn.Module):
    def __init__(self, cin, emb, cout):
        super().__init__()
        self.in_layers = nn.Sequential(gn(cin), nn.SiLU(),
                                       nn.Conv2d(cin, cout, 3, padding=1))
        self.emb_layers = nn.Sequential(nn.SiLU(), nn.Linear(emb, cout))
        self.out_layers = nn.Sequential(
            gn(cout), nn.SiLU(), nn.Identity(),
            nn.Conv2d(cout, cout, 3, padding=1))
        nn.init.zeros_(self.out_layers[-1].weight)
        nn.init.zeros_(self.out_layers[-1].bias)
        if cin != cout:
            self.skip_connection = nn.Conv2d(cin, cout, 1)
        self.has_skip = cin != cout
        self.temopral_conv = OTemporalConv(cout)  # sic, reference typo

    def forward(self, x, emb, batch):
        h = self.in_layers(x)
        h = h + self.emb_layers(emb)[..., None, None]
        h = self.out_layers(h)
        x = self.skip_connection(x) if self.has_skip else x
        h = x + h
        h = rearrange(h, "(b f) c h w -> b c f h w", b=batch)
        h = self.temopral_conv(h)
        return rearrange(h, "b c f h w -> (b f) c h w")


def sinusoid(t, dim):
    half = dim // 2
    s = torch.outer(t.float(), torch.pow(
        10000, -torch.arange(half).float().div(half)))
    return torch.cat([torch.cos(s), torch.sin(s)], dim=1)


class OracleUNetSD(nn.Module):
    """Tiny UNetSD: dim_mult (1,2), 1 res block, attn at scales (1, .5)."""

    def __init__(self, in_dim=4, dim=16, ctx_dim=12, out_dim=4,
                 dim_mult=(1, 2), head_dim=8, num_res=1,
                 attn_scales=(1.0, 0.5)):
        super().__init__()
        embed = dim * 4
        self.dim = dim
        self.num_res = num_res
        heads_of = lambda c: c // head_dim
        self.time_embed = nn.Sequential(nn.Linear(dim, embed), nn.SiLU(),
                                        nn.Linear(embed, embed))
        enc = [dim * u for u in (1,) + tuple(dim_mult)]

        self.input_blocks = nn.ModuleList()
        init_block = nn.ModuleList([nn.Conv2d(in_dim, dim, 3, padding=1),
                                    OTemporal(dim, heads_of(dim), head_dim)])
        self.input_blocks.append(init_block)
        shortcut = [dim]
        scale = 1.0
        for i, (cin, cout) in enumerate(zip(enc[:-1], enc[1:])):
            for j in range(num_res):
                block = nn.ModuleList([OResBlock(cin, embed, cout)])
                if scale in attn_scales:
                    block.append(OSpatial(cout, heads_of(cout), head_dim, ctx_dim))
                    block.append(OTemporal(cout, heads_of(cout), head_dim))
                cin = cout
                self.input_blocks.append(block)
                shortcut.append(cout)
                if i != len(dim_mult) - 1 and j == num_res - 1:
                    ds = nn.Module()
                    ds.op = nn.Conv2d(cout, cout, 3, stride=2, padding=1)
                    self.input_blocks.append(ds)
                    shortcut.append(cout)
                    scale /= 2.0
        self.shortcut = shortcut

        ch = enc[-1]
        self.middle_block = nn.ModuleList([
            OResBlock(ch, embed, ch),
            OSpatial(ch, heads_of(ch), head_dim, ctx_dim),
            OTemporal(ch, heads_of(ch), head_dim),
            OResBlock(ch, embed, ch),
        ])

        dec = [dim * u for u in (dim_mult[-1],) + tuple(dim_mult[::-1])]
        self.output_blocks = nn.ModuleList()
        sc = list(shortcut)
        for i, (cin, cout) in enumerate(zip(dec[:-1], dec[1:])):
            for j in range(num_res + 1):
                block = nn.ModuleList([OResBlock(cin + sc.pop(), embed, cout)])
                if scale in attn_scales:
                    block.append(OSpatial(cout, heads_of(cout), head_dim, ctx_dim))
                    block.append(OTemporal(cout, heads_of(cout), head_dim))
                cin = cout
                if i != len(dim_mult) - 1 and j == num_res:
                    up = nn.Module()
                    up.conv = nn.Conv2d(cout, cout, 3, padding=1)
                    block.append(up)
                    scale *= 2.0
                self.output_blocks.append(block)

        self.out = nn.Sequential(gn(cout), nn.SiLU(),
                                 nn.Conv2d(cout, out_dim, 3, padding=1))
        nn.init.zeros_(self.out[-1].weight)
        nn.init.zeros_(self.out[-1].bias)

    def _run(self, mod, x, e, ctx, batch, sa_share):
        if isinstance(mod, OResBlock):
            return mod(x, e, batch)
        if isinstance(mod, OSpatial):
            return mod(x, ctx, sa_share)
        if isinstance(mod, OTemporal):
            x = rearrange(x, "(b f) c h w -> b c f h w", b=batch)
            x = mod(x, sa_share)
            return rearrange(x, "b c f h w -> (b f) c h w")
        if isinstance(mod, nn.Conv2d):
            return mod(x)
        if hasattr(mod, "op"):
            return mod.op(x)
        if hasattr(mod, "conv"):  # upsample
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            return mod.conv(x)
        if isinstance(mod, nn.ModuleList):
            for m in mod:
                x = self._run(m, x, e, ctx, batch, sa_share)
            return x
        return mod(x)

    def forward(self, x, t, context, sa_share=False):
        batch = x.shape[0]
        f = x.shape[2]
        e = self.time_embed(sinusoid(t, self.dim))
        e = e.repeat_interleave(f, dim=0)
        if isinstance(context, (tuple, list)):
            ctx = tuple(c.repeat_interleave(f, dim=0) for c in context)
        else:
            ctx = context.repeat_interleave(f, dim=0)
        x = rearrange(x, "b c f h w -> (b f) c h w")
        xs = []
        for blk in self.input_blocks:
            x = self._run(blk, x, e, ctx, batch, sa_share)
            xs.append(x)
        for blk in self.middle_block:
            x = self._run(blk, x, e, ctx, batch, sa_share)
        for blk in self.output_blocks:
            x = torch.cat([x, xs.pop()], dim=1)
            x = self._run(blk, x, e, ctx, batch, sa_share)
        x = self.out(x)
        return rearrange(x, "(b f) c h w -> b c f h w", b=batch)
