"""Torch oracle for RAFT (princeton-vl architecture, raft_large), with the
original state-dict key layout — independent cross-framework validation
of insv2v_tpu/models/raft.py. Test fixture only."""

import torch
import torch.nn.functional as F
from torch import nn


class OResidualBlock(nn.Module):
    def __init__(self, cin, planes, norm, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, padding=1, stride=stride)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1)
        mk = (lambda c: nn.InstanceNorm2d(c)) if norm == "instance" else (
            lambda c: nn.BatchNorm2d(c))
        self.norm1 = mk(planes)
        self.norm2 = mk(planes)
        if stride != 1 or cin != planes:
            self.norm3 = mk(planes)
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes, 1, stride=stride), self.norm3)
        else:
            self.downsample = None

    def forward(self, x):
        y = F.relu(self.norm1(self.conv1(x)))
        y = F.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return F.relu(x + y)


class OBasicEncoder(nn.Module):
    def __init__(self, output_dim, norm, base=64):
        super().__init__()
        self.norm_kind = norm
        self.conv1 = nn.Conv2d(3, base, 7, stride=2, padding=3)
        self.norm1 = (nn.InstanceNorm2d(base) if norm == "instance"
                      else nn.BatchNorm2d(base))
        dims = (base, base * 3 // 2, base * 2)
        cin = base
        for li, (planes, stride) in enumerate(zip(dims, (1, 2, 2)), start=1):
            setattr(self, f"layer{li}", nn.Sequential(
                OResidualBlock(cin, planes, norm, stride),
                OResidualBlock(planes, planes, norm, 1)))
            cin = planes
        self.conv2 = nn.Conv2d(cin, output_dim, 1)

    def forward(self, x):
        x = F.relu(self.norm1(self.conv1(x)))
        x = self.layer3(self.layer2(self.layer1(x)))
        return self.conv2(x)


def bilinear_sampler(img, coords):
    """img (N, 1, H, W); coords (N, h, w, 2) pixel coords -> zero-padded."""
    H, W = img.shape[-2:]
    xgrid, ygrid = coords.split([1, 1], dim=-1)
    xgrid = 2 * xgrid / (W - 1) - 1
    ygrid = 2 * ygrid / (H - 1) - 1
    grid = torch.cat([xgrid, ygrid], dim=-1)
    return F.grid_sample(img, grid, align_corners=True)


class OCorrBlock:
    def __init__(self, f1, f2, levels=4, radius=4):
        self.radius = radius
        b, d, h, w = f1.shape
        corr = torch.einsum("bdij,bdkl->bijkl", f1, f2) / (d ** 0.5)
        corr = corr.reshape(b * h * w, 1, h, w)
        self.pyramid = [corr]
        for _ in range(levels - 1):
            corr = F.avg_pool2d(corr, 2, stride=2)
            self.pyramid.append(corr)
        self.shape = (b, h, w)

    def __call__(self, coords):
        r = self.radius
        b, h, w = self.shape
        coords = coords.permute(0, 2, 3, 1)  # (b, h, w, 2) as (x, y)
        out = []
        for i, corr in enumerate(self.pyramid):
            dx = torch.linspace(-r, r, 2 * r + 1)
            dy = torch.linspace(-r, r, 2 * r + 1)
            delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), dim=-1)
            centroid = coords.reshape(b * h * w, 1, 1, 2) / 2 ** i
            coords_lvl = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
            sampled = bilinear_sampler(corr, coords_lvl)
            out.append(sampled.view(b, h, w, -1))
        return torch.cat(out, dim=-1).permute(0, 3, 1, 2).contiguous()


class OMotionEncoder(nn.Module):
    def __init__(self, corr_ch):
        super().__init__()
        self.convc1 = nn.Conv2d(corr_ch, 256, 1)
        self.convc2 = nn.Conv2d(256, 192, 3, padding=1)
        self.convf1 = nn.Conv2d(2, 128, 7, padding=3)
        self.convf2 = nn.Conv2d(128, 64, 3, padding=1)
        self.conv = nn.Conv2d(192 + 64, 126, 3, padding=1)

    def forward(self, flow, corr):
        c = F.relu(self.convc1(corr))
        c = F.relu(self.convc2(c))
        f = F.relu(self.convf1(flow))
        f = F.relu(self.convf2(f))
        out = F.relu(self.conv(torch.cat([c, f], dim=1)))
        return torch.cat([out, flow], dim=1)


class OSepConvGRU(nn.Module):
    def __init__(self, hidden=128, inp=256):
        super().__init__()
        self.convz1 = nn.Conv2d(hidden + inp, hidden, (1, 5), padding=(0, 2))
        self.convr1 = nn.Conv2d(hidden + inp, hidden, (1, 5), padding=(0, 2))
        self.convq1 = nn.Conv2d(hidden + inp, hidden, (1, 5), padding=(0, 2))
        self.convz2 = nn.Conv2d(hidden + inp, hidden, (5, 1), padding=(2, 0))
        self.convr2 = nn.Conv2d(hidden + inp, hidden, (5, 1), padding=(2, 0))
        self.convq2 = nn.Conv2d(hidden + inp, hidden, (5, 1), padding=(2, 0))

    def forward(self, h, x):
        for z_c, r_c, q_c in ((self.convz1, self.convr1, self.convq1),
                              (self.convz2, self.convr2, self.convq2)):
            hx = torch.cat([h, x], dim=1)
            z = torch.sigmoid(z_c(hx))
            r = torch.sigmoid(r_c(hx))
            q = torch.tanh(q_c(torch.cat([r * h, x], dim=1)))
            h = (1 - z) * h + z * q
        return h


class OFlowHead(nn.Module):
    def __init__(self, hidden=128):
        super().__init__()
        self.conv1 = nn.Conv2d(hidden, 256, 3, padding=1)
        self.conv2 = nn.Conv2d(256, 2, 3, padding=1)

    def forward(self, h):
        return self.conv2(F.relu(self.conv1(h)))


class OUpdateBlock(nn.Module):
    def __init__(self, corr_ch, hidden=128, ctx=128):
        super().__init__()
        self.encoder = OMotionEncoder(corr_ch)
        self.gru = OSepConvGRU(hidden, ctx + 128)
        self.flow_head = OFlowHead(hidden)
        self.mask = nn.Sequential(
            nn.Conv2d(hidden, 256, 3, padding=1), nn.ReLU(inplace=True),
            nn.Conv2d(256, 64 * 9, 1))

    def forward(self, h, ctx, corr, flow):
        motion = self.encoder(flow, corr)
        h = self.gru(h, torch.cat([ctx, motion], dim=1))
        return h, self.flow_head(h), 0.25 * self.mask(h)


class OracleRAFT(nn.Module):
    def __init__(self, levels=4, radius=4, hidden=128, ctx=128, base=64):
        super().__init__()
        self.levels, self.radius = levels, radius
        self.hidden, self.ctx = hidden, ctx
        self.fnet = OBasicEncoder(256, "instance", base)
        self.cnet = OBasicEncoder(hidden + ctx, "batch", base)
        corr_ch = levels * (2 * radius + 1) ** 2
        self.update_block = OUpdateBlock(corr_ch, hidden, ctx)

    def upsample_flow(self, flow, mask):
        b, _, h, w = flow.shape
        mask = mask.view(b, 1, 9, 8, 8, h, w).softmax(dim=2)
        up = F.unfold(8 * flow, (3, 3), padding=1).view(b, 2, 9, 1, 1, h, w)
        up = torch.sum(mask * up, dim=2)
        up = up.permute(0, 1, 4, 2, 5, 3)
        return up.reshape(b, 2, 8 * h, 8 * w)

    def forward(self, im1, im2, iters=3):
        f = self.fnet(torch.cat([im1, im2], dim=0))
        f1, f2 = f.chunk(2, dim=0)
        corr_fn = OCorrBlock(f1.float(), f2.float(), self.levels, self.radius)
        c = self.cnet(im1)
        h = torch.tanh(c[:, : self.hidden])
        ctx = F.relu(c[:, self.hidden:])
        b, _, hh, ww = f1.shape
        gy, gx = torch.meshgrid(torch.arange(hh).float(),
                                torch.arange(ww).float(), indexing="ij")
        coords0 = torch.stack([gx, gy])[None].repeat(b, 1, 1, 1)
        flow = torch.zeros(b, 2, hh, ww)
        for _ in range(iters):
            corr = corr_fn(coords0 + flow)
            h, delta, mask = self.update_block(h, ctx, corr, flow)
            flow = flow + delta
        return self.upsample_flow(flow, mask)
