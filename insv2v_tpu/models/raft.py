"""RAFT optical flow (Teed & Deng, ECCV 2020) in Flax — the on-device
replacement for torchvision's CUDA ``raft_large``
(misc_utils/flow_utils.py:134-189), used by motion-compensated stitching.

TPU-native formulation:
  * the all-pairs correlation volume is one einsum; the 4-level pyramid
    is average pooling over the *target* spatial dims;
  * the per-iteration neighborhood lookup is a batched bilinear gather
    (XLA take_along_axis) over a static (2r+1)^2 offset grid;
  * the 12 GRU refinement iterations run as a ``lax.scan``;
  * convex upsampling is an unfold+weighted-sum einsum.

Param naming follows the original princeton-vl/RAFT checkpoints
(raft-things.pth: fnet/cnet/update_block trees) via
``convert_raft_state_dict``; fnet InstanceNorms carry no parameters and
cnet BatchNorms convert their running statistics into constants.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["RaftConfig", "RAFT", "correlation_pyramid", "corr_lookup",
           "convex_upsample"]


@dataclasses.dataclass(frozen=True)
class RaftConfig:
    feature_dim: int = 256
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 12
    # fixture scaling
    base_width: int = 64

    @classmethod
    def tiny(cls) -> "RaftConfig":
        return cls(feature_dim=32, hidden_dim=16, context_dim=16,
                   corr_levels=2, corr_radius=2, iters=3, base_width=8)


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False): per-(sample, channel) stats over HW."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class FrozenBatchNorm(nn.Module):
    """BatchNorm2d in eval mode: running stats stored as params."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        xf = x.astype(jnp.float32)
        out = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return out.astype(x.dtype)


class ResidualUnit(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "instance"  # instance | batch
    dtype: jnp.dtype = jnp.float32

    def _norm(self, x, name):
        if self.norm == "instance":
            return instance_norm(x)
        return FrozenBatchNorm(name=name)(x)

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    dtype=self.dtype, name="conv1")(x)
        y = jax.nn.relu(self._norm(y, "norm1"))
        y = nn.Conv(self.planes, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(y)
        y = jax.nn.relu(self._norm(y, "norm2"))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        dtype=self.dtype, name="downsample")(x)
            x = self._norm(x, "norm3")
        return jax.nn.relu(x + y)


class BasicEncoder(nn.Module):
    """conv7x7/2 -> 3 residual stages (/2, /2) -> 1x1 head: 1/8-res features."""

    output_dim: int
    norm: str
    base_width: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.base_width
        x = nn.Conv(w, (7, 7), strides=2, padding=3, dtype=self.dtype,
                    name="conv1")(x)
        if self.norm == "instance":
            x = instance_norm(x)
        else:
            x = FrozenBatchNorm(name="norm1")(x)
        x = jax.nn.relu(x)
        dims = (w, (w * 3) // 2, w * 2)  # 64, 96, 128 at base 64
        for li, (planes, stride) in enumerate(
                zip(dims, (1, 2, 2)), start=1):
            x = ResidualUnit(planes, stride, self.norm, dtype=self.dtype,
                             name=f"layer{li}_0")(x)
            x = ResidualUnit(planes, 1, self.norm, dtype=self.dtype,
                             name=f"layer{li}_1")(x)
        return nn.Conv(self.output_dim, (1, 1), dtype=self.dtype,
                       name="conv2")(x)


def correlation_pyramid(f1: jnp.ndarray, f2: jnp.ndarray,
                        levels: int) -> Tuple[jnp.ndarray, ...]:
    """All-pairs correlation: f1, f2 (B, H, W, D) ->
    tuple of (B*H*W, H/2^l, W/2^l) volumes."""
    b, h, w, d = f1.shape
    corr = jnp.einsum("bijd,bkld->bijkl", f1, f2,
                      preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.float32(d))
    corr = corr.reshape(b * h * w, h, w)
    pyr = [corr]
    for _ in range(levels - 1):
        c = pyr[-1]
        # avg_pool2d floor semantics; dims clamp at 1 so tiny maps survive
        kh = 2 if c.shape[1] >= 2 else 1
        kw = 2 if c.shape[2] >= 2 else 1
        c = jax.lax.reduce_window(
            c, 0.0, jax.lax.add, (1, kh, kw), (1, kh, kw), "VALID"
        ) / (kh * kw)
        pyr.append(c)
    return tuple(pyr)


def _bilinear_gather(vol: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """vol (N, H, W); ys/xs (N, K) sample coords -> (N, K). Zero padding."""
    n, h, w = vol.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = ys - y0
    fx = xs - x0

    def at(yi, xi):
        inb = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = yc * w + xc
        vals = jnp.take_along_axis(vol.reshape(n, h * w), flat, axis=1)
        return vals * inb.astype(vol.dtype)

    return (at(y0, x0) * (1 - fy) * (1 - fx)
            + at(y0, x0 + 1) * (1 - fy) * fx
            + at(y0 + 1, x0) * fy * (1 - fx)
            + at(y0 + 1, x0 + 1) * fy * fx)


def corr_lookup(pyramid: Tuple[jnp.ndarray, ...], coords: jnp.ndarray,
                radius: int) -> jnp.ndarray:
    """Sample (2r+1)^2 neighborhoods around ``coords`` at every level.

    coords: (B, H, W, 2) absolute target positions (x, y) at 1/8 res.
    Returns (B, H, W, levels*(2r+1)^2).
    """
    b, h, w, _ = coords.shape
    n = b * h * w
    k = 2 * radius + 1
    # NOTE: channel enumeration follows the original RAFT exactly — its
    # delta grid comes from meshgrid(dy, dx) stacked as (dy, dx) and ADDED
    # to (x, y), so the x offset varies with the MAJOR index. Keeping that
    # (transposed-looking) order makes pretrained convc1 weights line up.
    major, minor = jnp.meshgrid(
        jnp.arange(-radius, radius + 1, dtype=jnp.float32),
        jnp.arange(-radius, radius + 1, dtype=jnp.float32),
        indexing="ij")
    offs_x = major.reshape(1, -1)
    offs_y = minor.reshape(1, -1)
    outs = []
    cx = coords[..., 0].reshape(n, 1)
    cy = coords[..., 1].reshape(n, 1)
    for lvl, vol in enumerate(pyramid):
        scale = 0.5 ** lvl
        ys = cy * scale + offs_y
        xs = cx * scale + offs_x
        outs.append(_bilinear_gather(vol, ys, xs))  # (n, k*k)
    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(b, h, w, len(pyramid) * k * k)


class MotionEncoder(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        c = jax.nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="convc1")(corr))
        c = jax.nn.relu(nn.Conv(192, (3, 3), padding=1, dtype=self.dtype,
                                name="convc2")(c))
        f = jax.nn.relu(nn.Conv(128, (7, 7), padding=3, dtype=self.dtype,
                                name="convf1")(flow))
        f = jax.nn.relu(nn.Conv(64, (3, 3), padding=1, dtype=self.dtype,
                                name="convf2")(f))
        m = jax.nn.relu(nn.Conv(126, (3, 3), padding=1, dtype=self.dtype,
                                name="conv")(jnp.concatenate([c, f], axis=-1)))
        return jnp.concatenate([m, flow], axis=-1)  # 128


class SepConvGRU(nn.Module):
    hidden: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        def gru(h, x, ks, pad, suffix):
            hx = jnp.concatenate([h, x], axis=-1)
            z = jax.nn.sigmoid(nn.Conv(self.hidden, ks, padding=pad,
                                       dtype=self.dtype, name=f"convz{suffix}")(hx))
            r = jax.nn.sigmoid(nn.Conv(self.hidden, ks, padding=pad,
                                       dtype=self.dtype, name=f"convr{suffix}")(hx))
            q = jnp.tanh(nn.Conv(self.hidden, ks, padding=pad, dtype=self.dtype,
                                 name=f"convq{suffix}")(
                jnp.concatenate([r * h, x], axis=-1)))
            return (1 - z) * h + z * q

        h = gru(h, x, (1, 5), ((0, 0), (2, 2)), "1")  # horizontal
        h = gru(h, x, (5, 1), ((2, 2), (0, 0)), "2")  # vertical
        return h


class FlowHead(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h):
        x = jax.nn.relu(nn.Conv(256, (3, 3), padding=1, dtype=self.dtype,
                                name="conv1")(h))
        return nn.Conv(2, (3, 3), padding=1, dtype=self.dtype, name="conv2")(x)


class UpdateBlock(nn.Module):
    """One GRU refinement iteration, shaped for nn.scan:
    carry (hidden, flow), broadcast consts (pyramid, context, coords0)."""

    hidden: int = 128
    radius: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, consts):
        h, flow = carry
        pyramid, context, coords0 = consts
        corr = corr_lookup(pyramid, coords0 + flow, self.radius)
        motion = MotionEncoder(dtype=self.dtype, name="encoder")(
            flow.astype(self.dtype), corr.astype(self.dtype))
        inp = jnp.concatenate([context, motion], axis=-1)
        h = SepConvGRU(self.hidden, dtype=self.dtype, name="gru")(h, inp)
        delta = FlowHead(dtype=self.dtype, name="flow_head")(h)
        mask = nn.Conv(256, (3, 3), padding=1, dtype=self.dtype, name="mask_0")(h)
        mask = nn.Conv(64 * 9, (1, 1), dtype=self.dtype, name="mask_2")(
            jax.nn.relu(mask))
        flow = flow + delta.astype(jnp.float32)
        return (h, flow), 0.25 * mask


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Convex combination 8x upsampling (RAFT): flow (B, h, w, 2),
    mask (B, h, w, 64*9) -> (B, 8h, 8w, 2)."""
    b, h, w, _ = flow.shape
    mask = mask.reshape(b, h, w, 8, 8, 9)
    mask = jax.nn.softmax(mask, axis=-1)
    flow8 = flow * 8.0
    pad = jnp.pad(flow8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 3x3 neighborhoods of each coarse cell
    neigh = jnp.stack([
        pad[:, dy: dy + h, dx: dx + w] for dy in range(3) for dx in range(3)
    ], axis=-2)  # (b, h, w, 9, 2)
    up = jnp.einsum("bhwuvn,bhwne->bhwuve", mask, neigh)  # (b,h,w,8,8,2)
    up = up.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)
    return up


class RAFT(nn.Module):
    """image1/image2 (B, H, W, 3) in [-1, 1], H, W multiples of 8 ->
    flow (B, H, W, 2) mapping image1 -> image2 (forward flow)."""

    cfg: RaftConfig = RaftConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image1, image2, iters: int = None):
        cfg = self.cfg
        iters = iters or cfg.iters
        b, H, W, _ = image1.shape
        h, w = H // 8, W // 8

        fmaps = BasicEncoder(cfg.feature_dim, "instance", cfg.base_width,
                             dtype=self.dtype, name="fnet")(
            jnp.concatenate([image1, image2], axis=0))
        f1, f2 = jnp.split(fmaps, 2, axis=0)
        pyramid = correlation_pyramid(f1.astype(jnp.float32),
                                      f2.astype(jnp.float32), cfg.corr_levels)

        cmap = BasicEncoder(cfg.hidden_dim + cfg.context_dim, "batch",
                            cfg.base_width, dtype=self.dtype, name="cnet")(image1)
        hidden = jnp.tanh(cmap[..., : cfg.hidden_dim])
        context = jax.nn.relu(cmap[..., cfg.hidden_dim:])

        gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        coords0 = jnp.stack([gx, gy], axis=-1)[None].repeat(b, axis=0)

        loop = nn.scan(
            UpdateBlock,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            out_axes=0,
            length=iters,
        )(cfg.hidden_dim, cfg.corr_radius, dtype=self.dtype,
          name="update_block")
        carry0 = (hidden, jnp.zeros((b, h, w, 2), jnp.float32))
        (hidden, flow), masks = loop(carry0, (pyramid, context, coords0))
        return convex_upsample(flow, masks[-1].astype(jnp.float32))
