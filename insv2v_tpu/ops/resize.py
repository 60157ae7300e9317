"""Spatial resize and flow-warp primitives (XLA gather/lerp formulations).

Replaces torch ``F.interpolate`` uses (modules/video_unet_temporal/resnet.py:59,
modules/vqvae/model.py:48, misc_utils/flow_utils.py:84) and the CUDA
``grid_sample`` warp (misc_utils/flow_utils.py:25-57) with shape-static
jnp ops that XLA lowers to cheap reshapes/gathers on TPU.

All functions take channels-last tensors.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "nearest_upsample_2x",
    "nearest_resize",
    "bilinear_resize",
    "warp_image",
    "resize_flow",
]


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest x2 upsample over the two axes before channels.

    Exactly matches torch ``F.interpolate(scale_factor=2, mode='nearest')``
    (each source pixel becomes a 2x2 block).  x: (..., H, W, C).
    """
    x = jnp.repeat(x, 2, axis=-3)
    x = jnp.repeat(x, 2, axis=-2)
    return x


def nearest_resize(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Nearest resize to (h, w), matching torch's floor-index convention:
    src = floor(dst * src_size / dst_size). x: (..., H, W, C)."""
    H, W = x.shape[-3], x.shape[-2]
    rows = jnp.floor(jnp.arange(h) * (H / h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(w) * (W / w)).astype(jnp.int32)
    return x[..., rows, :, :][..., :, cols, :]


def bilinear_resize(x: jnp.ndarray, h: int, w: int, align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize, torch semantics. x: (..., H, W, C)."""
    H, W = x.shape[-3], x.shape[-2]
    xf = x.astype(jnp.float32)
    if align_corners and h > 1 and w > 1:
        ys = jnp.linspace(0.0, H - 1.0, h)
        xs = jnp.linspace(0.0, W - 1.0, w)
    else:
        ys = (jnp.arange(h) + 0.5) * (H / h) - 0.5
        xs = (jnp.arange(w) + 0.5) * (W / w) - 0.5
    y0 = jnp.clip(jnp.floor(ys), 0, H - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, W - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = jnp.clip(ys - y0, 0.0, 1.0)
    wx = jnp.clip(xs - x0, 0.0, 1.0)

    def gather_rows(a, idx):
        return jnp.take(a, idx, axis=-3)

    def gather_cols(a, idx):
        return jnp.take(a, idx, axis=-2)

    top = gather_rows(xf, y0)
    bot = gather_rows(xf, y1)
    tl, tr = gather_cols(top, x0), gather_cols(top, x1)
    bl, br = gather_cols(bot, x0), gather_cols(bot, x1)
    wy = wy.reshape((h, 1, 1))
    wx = wx.reshape((1, w, 1))
    out = (
        tl * (1 - wy) * (1 - wx)
        + tr * (1 - wy) * wx
        + bl * wy * (1 - wx)
        + br * wy * wx
    )
    return out.astype(x.dtype)


def warp_image(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp an image by optical flow, matching the reference
    ``warp_image`` (misc_utils/flow_utils.py:25-57): bilinear sampling at
    ``(x + u, y + v)`` with align_corners=True and zero padding outside.

    Args:
      image: (N, H, W, C)
      flow:  (N, H, W, 2) — (u, v) displacement in pixels.
    Returns: (N, H, W, C)
    """
    n, h, w, _ = image.shape
    imf = image.astype(jnp.float32)
    gy, gx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    sx = gx[None] + flow[..., 0].astype(jnp.float32)  # sample x coord
    sy = gy[None] + flow[..., 1].astype(jnp.float32)  # sample y coord

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def sample(yi, xi):
        inb = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = (yc * w + xc).reshape(n, -1)
        vals = jnp.take_along_axis(
            imf.reshape(n, h * w, -1), flat[..., None], axis=1
        ).reshape(n, h, w, -1)
        return vals * inb[..., None].astype(jnp.float32)

    out = (
        sample(y0, x0) * ((1 - fx) * (1 - fy))[..., None]
        + sample(y0, x0 + 1) * (fx * (1 - fy))[..., None]
        + sample(y0 + 1, x0) * ((1 - fx) * fy)[..., None]
        + sample(y0 + 1, x0 + 1) * (fx * fy)[..., None]
    )
    return out.astype(image.dtype)


def resize_flow(flow: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Resize a flow field to (h, w), scaling the vectors accordingly
    (misc_utils/flow_utils.py:59-86). flow: (N, H, W, 2)."""
    H, W = flow.shape[1], flow.shape[2]
    scaled = flow.astype(jnp.float32) * jnp.array([w / W, h / H], dtype=jnp.float32)
    return bilinear_resize(scaled, h, w, align_corners=False)


def check_flow_consistency(flow_fwd: jnp.ndarray, flow_bwd: jnp.ndarray) -> jnp.ndarray:
    """Forward/backward flow consistency mask
    (misc_utils/flow_utils.py:88-131): a pixel is reliable when the
    round-trip displacement is small relative to the motion magnitude and
    it does not sit on a motion edge.

    flow_fwd/flow_bwd: (N, H, W, 2). Returns float mask (N, H, W).
    """
    f = flow_fwd.astype(jnp.float32)
    # motion-edge strength via central differences of the forward flow
    gx = (jnp.roll(f[..., 0], -1, axis=2) - jnp.roll(f[..., 0], 1, axis=2)) * 0.5
    gy = (jnp.roll(f[..., 1], -1, axis=1) - jnp.roll(f[..., 1], 1, axis=1)) * 0.5
    motion_edge = gx * gx + gy * gy

    # backward flow sampled at the forward-displaced position
    bwd_at_fwd = warp_image(flow_bwd.astype(jnp.float32), f)
    u, v = f[..., 0], f[..., 1]
    u2, v2 = bwd_at_fwd[..., 0], bwd_at_fwd[..., 1]
    roundtrip = (u + u2) ** 2 + (v + v2) ** 2
    mag = u * u + v * v + u2 * u2 + v2 * v2
    reliable = (roundtrip < 0.01 * mag + 0.5) & (
        motion_edge <= 0.01 * (u * u + v * v) + 0.002)
    return reliable.astype(jnp.float32)
