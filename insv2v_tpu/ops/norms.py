"""Normalization primitives with explicit reduction axes and f32 statistics.

The reference uses torch GroupNorm in two distinct regimes that differ in
which axes the statistics run over — a numerics-critical distinction:

  * ResnetBlock3D applies GN to the 5D video tensor (b c f h w), so the
    statistics pool over (C/G, F, H, W) — ACROSS frames
    (modules/video_unet_temporal/resnet.py:141,157).
  * Transformer3DModel / TemporalTransformer3DModel fold frames into the
    batch first, so their GN statistics are per-frame
    (modules/video_unet_temporal/attention.py:95,101;
    motion_module.py:131,136).

Here the channel axis is always last and the caller chooses the reduction
axes explicitly.  Statistics accumulate in float32 regardless of the
activation dtype (the bf16-safe policy for TPU).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = ["group_norm", "layer_norm"]


def group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-6,
    reduce_axes: Optional[Sequence[int]] = None,
) -> jnp.ndarray:
    """GroupNorm over channels-last input.

    Args:
      x: (..., C). Typically (B, H, W, C) for per-frame stats or
        (B, F, H, W, C) for across-frame stats.
      scale, bias: (C,) affine parameters.
      reduce_axes: axes (besides the group-channel axis) to pool stats
        over. Default: all axes except axis 0 (batch) and the channel axis.
    """
    orig_dtype = x.dtype
    C = x.shape[-1]
    assert C % num_groups == 0, f"channels {C} not divisible by groups {num_groups}"
    gs = C // num_groups
    xf = x.astype(jnp.float32)
    # split channels into (groups, group_size)
    xg = xf.reshape(x.shape[:-1] + (num_groups, gs))
    if reduce_axes is None:
        reduce_axes = tuple(range(1, x.ndim - 1))
    axes = tuple(reduce_axes) + (xg.ndim - 1,)  # spatial/temporal axes + group chans
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=axes, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    xf = xg.reshape(x.shape)
    out = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


import os as _os

_PALLAS_NORM = _os.environ.get("INSV2V_PALLAS_NORM", "0") == "1"


def layer_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm over the last axis with f32 statistics (torch default eps).

    With INSV2V_PALLAS_NORM=1 (and on TPU) dispatches to the fused Pallas
    kernel (ops/fused_norm.py) — experimental, see PERF.md.
    """
    if _PALLAS_NORM and x.ndim >= 2:
        try:
            if jax.default_backend() == "tpu":
                from insv2v_tpu.ops.fused_norm import fused_layer_norm

                return fused_layer_norm(x, scale, bias, eps)
        except RuntimeError:
            pass
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * (var + eps) ** -0.5
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)
