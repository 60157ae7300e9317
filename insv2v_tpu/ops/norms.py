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

__all__ = ["group_norm", "group_norm_split_pair", "layer_norm"]


import os as _os0

_GN_MATMUL_STATS = _os0.environ.get("INSV2V_GN_MATMUL_STATS", "1") != "0"
# A/B switch: 0 reverts to bf16 x*x squaring (cheaper by one contraction,
# but (mean/std)^2-amplified variance error — see _group_norm_matmul_stats)
_GN_EXACT_SQ = _os0.environ.get("INSV2V_GN_EXACT_SQ", "1") != "0"


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def _group_norm_matmul_stats(x, scale, bias, num_groups, eps, reduce_axes):
    """GN with sums computed as an MXU ones-contraction.

    The straightforward convert+reduce formulation let XLA pick a hostile
    layout on TPU ({3,0,2,1} on the (48,H,W,C) activations) and ran the
    stats passes 30-50x slower than HBM bandwidth — 17.5% of UNet step
    time in the device trace. Contracting with a ones-vector instead
    keeps the reduction on the MXU with native bf16->f32 accumulation and
    no f32 materialization of x. Variance comes from the (sum, sum-of-
    squares) moments — f32 accumulators, same policy torch's CUDA GN
    kernel uses. The E[x^2]-E[x]^2 cancellation amplifies any squaring
    error by (mean/std)^2, so x**2 is computed EXACTLY: for bf16 inputs
    x*x fits f32 (8-bit mantissa squared = 16 bits), and the f32 square is
    split into hi+lo bf16 parts contracted separately — two bf16 MXU
    matmuls whose f32-accumulated sum equals the exact sum-of-squares up
    to f32 rounding (measured: mean/std=100 error drops from ~1.3 to
    bf16-resolution; tests/test_ops.py::test_group_norm_matmul_stats_bf16).

    Requires reduce_axes to be the contiguous run of axes between the
    kept leading axes and the channel axis (true for every use in this
    model); falls back to the exact path otherwise.
    """
    nd = x.ndim
    reduce_axes = tuple(reduce_axes)
    first = min(reduce_axes)
    if reduce_axes != tuple(range(first, nd - 1)):
        return None
    lead = x.shape[:first]
    R = 1
    for s in lead:
        R *= s
    K = 1
    for a in reduce_axes:
        K *= x.shape[a]
    C = x.shape[-1]
    gs = C // num_groups
    x2 = x.reshape(R, K, C)
    ones = jnp.ones((K,), x.dtype)
    s1 = jnp.einsum("rkc,k->rc", x2, ones,
                    preferred_element_type=jnp.float32)
    contract = lambda t: jnp.einsum("rkc,k->rc", t, ones.astype(t.dtype),
                                    preferred_element_type=jnp.float32)
    if x.dtype == jnp.bfloat16 and _GN_EXACT_SQ:
        # exact square in f32 (bf16*bf16 fits f32), hi/lo-split back to
        # bf16 so both contractions stay on the bf16 MXU path
        sq = x2.astype(jnp.float32) ** 2
        hi = sq.astype(jnp.bfloat16)
        lo = (sq - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        s2 = contract(hi) + contract(lo)
    else:
        s2 = contract(x2 * x2)
    n = K * gs
    s1g = jnp.sum(s1.reshape(R, num_groups, gs), axis=-1)
    s2g = jnp.sum(s2.reshape(R, num_groups, gs), axis=-1)
    mean = s1g / n
    var = jnp.maximum(s2g / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    # per-(row, channel) affine: y = x * a + b, fused into consumers
    expand = lambda t: jnp.repeat(t, gs, axis=-1)  # (R, G) -> (R, C)
    a = expand(rstd) * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - expand(mean * rstd) * scale.astype(
        jnp.float32)[None, :]
    bshape = lead + (1,) * len(reduce_axes) + (C,)
    y = x.astype(jnp.float32) * a.reshape(bshape) + b.reshape(bshape)
    return y.astype(x.dtype)


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
    if reduce_axes is None:
        reduce_axes = tuple(range(1, x.ndim - 1))
    if _GN_MATMUL_STATS and _on_tpu():
        out = _group_norm_matmul_stats(x, scale, bias, num_groups, eps,
                                       reduce_axes)
        if out is not None:
            return out
    xf = x.astype(jnp.float32)
    # split channels into (groups, group_size)
    xg = xf.reshape(x.shape[:-1] + (num_groups, gs))
    axes = tuple(reduce_axes) + (xg.ndim - 1,)  # spatial/temporal axes + group chans
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=axes, keepdims=True)
    xg = (xg - mean) * jax.lax.rsqrt(var + eps)
    xf = xg.reshape(x.shape)
    out = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(orig_dtype)


def group_norm_split_pair(
    x: jnp.ndarray,
    skip: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-6,
) -> tuple:
    """GroupNorm of the VIRTUAL ``concat([x, skip], -1)`` without ever
    materializing the concat (unet3d.py INSV2V_SPLIT_SKIP up-block path).

    Per-part f32 channel moments (sum, sum-of-squares over all non-batch,
    non-channel axes — the ACROSS-frames regime of ResnetBlock3D) are
    combined into per-group statistics, then each part is normalized and
    affined in place with its slice of ``scale``/``bias``. Groups may
    straddle the part boundary (e.g. 1280+640 channels at group size 60).

    Uses the one-pass E[x^2] - mean^2 variance (the two-pass form of
    :func:`group_norm` cannot compose across parts); on O(1) activations
    the f32 difference is ~1e-6 relative — below the bf16 quantization
    already on this path.

    Returns ``(x_n, skip_n)`` in the inputs' dtype.
    """
    assert x.shape[:-1] == skip.shape[:-1], (x.shape, skip.shape)
    c1, c2 = x.shape[-1], skip.shape[-1]
    ct = c1 + c2
    assert ct % num_groups == 0, f"channels {ct} not divisible by {num_groups}"
    gs = ct // num_groups
    red = tuple(range(1, x.ndim - 1))
    n = gs
    for a in red:
        n *= x.shape[a]

    def mom(p):
        pf = p.astype(jnp.float32)
        return jnp.sum(pf, red), jnp.sum(jnp.square(pf), red)  # (B, c_part)

    s1, q1 = mom(x)
    s2, q2 = mom(skip)
    b_dim = x.shape[0]
    s = jnp.concatenate([s1, s2], -1).reshape(b_dim, num_groups, gs).sum(-1)
    q = jnp.concatenate([q1, q2], -1).reshape(b_dim, num_groups, gs).sum(-1)
    mean = s / n
    var = jnp.maximum(q / n - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)  # (B, G)
    # fold the affine: out = p * (inv * scale) + (bias - mean * inv * scale)
    mean_c = jnp.repeat(mean, gs, axis=-1)  # (B, C_total)
    inv_c = jnp.repeat(inv, gs, axis=-1)
    sc = inv_c * scale.astype(jnp.float32)[None]
    off = bias.astype(jnp.float32)[None] - mean_c * sc
    bshape = (b_dim,) + (1,) * len(red)

    def apply(p, lo, hi):
        scp = sc[:, lo:hi].reshape(bshape + (hi - lo,))
        offp = off[:, lo:hi].reshape(bshape + (hi - lo,))
        return (p.astype(jnp.float32) * scp + offp).astype(p.dtype)

    return apply(x, 0, c1), apply(skip, c1, ct)


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
