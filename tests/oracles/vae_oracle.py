"""Minimal torch oracle reproducing the reference VAE's computation graph
and state-dict key layout (modules/vqvae/model.py + kl_autoencoder), used
to golden-test the Flax port and the checkpoint converter on tiny configs.

This is a test fixture, not product code: it exists so parity is checked
against independently-written torch semantics (torch GroupNorm, conv
padding conventions, asymmetric downsample pad, nearest upsample).
"""

import torch
import torch.nn.functional as F
from torch import nn


def norm(c):
    return nn.GroupNorm(num_groups=min(32, c), num_channels=c, eps=1e-6, affine=True)


class OracleResBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = norm(cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = norm(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.nin_shortcut = nn.Conv2d(cin, cout, 1)
        self.has_short = cin != cout

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if self.has_short:
            x = self.nin_shortcut(x)
        return x + h


class OracleAttn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = norm(c)
        self.q, self.k, self.v = (nn.Conv2d(c, c, 1) for _ in range(3))
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        hn = self.norm(x)
        q = self.q(hn).reshape(b, c, h * w).permute(0, 2, 1)
        k = self.k(hn).reshape(b, c, h * w)
        v = self.v(hn).reshape(b, c, h * w)
        a = torch.softmax(torch.bmm(q, k) * c ** -0.5, dim=2)
        o = torch.bmm(v, a.permute(0, 2, 1)).reshape(b, c, h, w)
        return x + self.proj_out(o)


class OracleDown(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, (0, 1, 0, 1)))


class OracleUp(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


class OracleEncoder(nn.Module):
    def __init__(self, ch, ch_mult, num_res, cin, z):
        super().__init__()
        self.conv_in = nn.Conv2d(cin, ch, 3, padding=1)
        self.down = nn.ModuleList()
        block_in = ch
        for i, m in enumerate(ch_mult):
            lvl = nn.Module()
            lvl.block = nn.ModuleList()
            for _ in range(num_res):
                lvl.block.append(OracleResBlock(block_in, ch * m))
                block_in = ch * m
            if i != len(ch_mult) - 1:
                lvl.downsample = OracleDown(block_in)
            self.down.append(lvl)
        self.mid = nn.Module()
        self.mid.block_1 = OracleResBlock(block_in, block_in)
        self.mid.attn_1 = OracleAttn(block_in)
        self.mid.block_2 = OracleResBlock(block_in, block_in)
        self.norm_out = norm(block_in)
        self.conv_out = nn.Conv2d(block_in, 2 * z, 3, padding=1)
        self.n_levels = len(ch_mult)

    def forward(self, x):
        h = self.conv_in(x)
        for i, lvl in enumerate(self.down):
            for blk in lvl.block:
                h = blk(h)
            if i != self.n_levels - 1:
                h = lvl.downsample(h)
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        return self.conv_out(F.silu(self.norm_out(h)))


class OracleDecoder(nn.Module):
    def __init__(self, ch, ch_mult, num_res, cout, z):
        super().__init__()
        block_in = ch * ch_mult[-1]
        self.conv_in = nn.Conv2d(z, block_in, 3, padding=1)
        self.mid = nn.Module()
        self.mid.block_1 = OracleResBlock(block_in, block_in)
        self.mid.attn_1 = OracleAttn(block_in)
        self.mid.block_2 = OracleResBlock(block_in, block_in)
        ups = []
        for i in reversed(range(len(ch_mult))):
            lvl = nn.Module()
            lvl.block = nn.ModuleList()
            for _ in range(num_res + 1):
                lvl.block.append(OracleResBlock(block_in, ch * ch_mult[i]))
                block_in = ch * ch_mult[i]
            if i != 0:
                lvl.upsample = OracleUp(block_in)
            ups.insert(0, lvl)
        self.up = nn.ModuleList(ups)
        self.norm_out = norm(block_in)
        self.conv_out = nn.Conv2d(block_in, cout, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(z)
        h = self.mid.block_2(self.mid.attn_1(self.mid.block_1(h)))
        for i in reversed(range(len(self.up))):
            for blk in self.up[i].block:
                h = blk(h)
            if i != 0:
                h = self.up[i].upsample(h)
        return self.conv_out(F.silu(self.norm_out(h)))


class OracleAutoencoderKL(nn.Module):
    def __init__(self, ch=8, ch_mult=(1, 2), num_res=1, cin=3, cout=3, z=2, embed_dim=2):
        super().__init__()
        self.encoder = OracleEncoder(ch, ch_mult, num_res, cin, z)
        self.decoder = OracleDecoder(ch, ch_mult, num_res, cout, z)
        self.quant_conv = nn.Conv2d(2 * z, 2 * embed_dim, 1)
        self.post_quant_conv = nn.Conv2d(embed_dim, z, 1)

    def moments(self, x):
        return self.quant_conv(self.encoder(x))

    def encode_mode(self, x):
        mean, _ = torch.chunk(self.moments(x), 2, dim=1)
        return mean

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))
