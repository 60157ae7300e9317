"""Fused LayerNorm + GEGLU feed-forward + residual as one Pallas kernel.

The transformer FF block — ``x + proj_out(h * gelu(gate))`` with
``[h | gate] = geglu_proj(LN(x))`` (diffusers ``FeedForward``; reference
modules/video_unet_temporal/attention.py:268-270 and
motion_module.py:208-216) — is a top HBM-traffic region of the UNet:
XLA materializes the 8C-wide GEGLU intermediate to HBM twice (write +
read) plus separate LN and residual passes. This kernel keeps everything
in VMEM:

  * grid (row-block i, inner-block j), j fastest;
  * at j==0 the LN of the row block is computed once into scratch and the
    f32 accumulator starts from the residual + output bias;
  * each j computes a ``blk_n`` column slice of both GEGLU halves
    (addressed as two views of the same weight array via block index
    maps — no pre-split copy), gates them, and accumulates the second
    matmul's partial product — the 8C intermediate never exists in HBM;
  * weights stream block-by-block, so C=1280 (39 MB of FF weights) works
    within the ~16 MB VMEM budget.

Backward recomputes with the plain-XLA path (same trade as the flash
attention kernel in ops/attention.py).
"""

from __future__ import annotations

import functools
import os as _os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # importable on CPU builds too; guard anyway
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

__all__ = ["geglu_ff_reference", "fused_geglu_ff", "geglu_ff"]


def geglu_ff_reference(x, ln_scale, ln_bias, w1, b1, w2, b2,
                       *, eps: float = 1e-5):
    """Plain-XLA LN + GEGLU FF + residual; the kernel's numerics oracle.

    Mirrors LayerNorm(...) -> Dense(2*inner) -> split -> h*gelu(gate) ->
    Dense(dim) -> +x exactly as composed in models/unet3d.py.
    """
    from insv2v_tpu.ops.norms import layer_norm

    dt = x.dtype
    xn = layer_norm(x, ln_scale, ln_bias, eps)
    h = jnp.dot(xn, w1.astype(dt)) + b1.astype(dt)
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * jax.nn.gelu(gate, approximate=False)
    out = jnp.dot(h, w2.astype(dt)) + b2.astype(dt)
    return x + out


# INSV2V_FF_GELU — in-kernel gelu flavor. r3 v5e probe A/B (16f/10-step):
#   "as"   (A-S 7.1.25 erf, |err|<=2.5e-5; exp + reciprocal)   1.91 s
#   "poly" (clamped odd minimax erf, |err|<=3.3e-4, 7 FMAs)    1.90 s
#   "tanh" (torch approximate='tanh'; |gelu err|<=~3e-3 abs)   1.825 s
#   "linear" (PERF PROBE ONLY — wrong math: the gelu ceiling)  1.80 s
# Default "tanh": jnp.tanh lowers to a fast hardware transcendental while
# the poly's 7-FMA Horner chain is latency-serial on the VPU; the ~3e-3
# abs gelu deviation is below the bf16 activation quantization (~4e-3
# relative) already present on the production path. The XLA/CPU reference
# path keeps exact erf gelu.
_FF_GELU = _os.environ.get("INSV2V_FF_GELU", "tanh")

# minimax odd-polynomial erf on [0, 3.45] (clamped outside; erf(3.45) is
# 1 - 1e-6): max |err| 3.3e-4 — well under bf16 output resolution
_ERF_POLY_B = 3.45
_ERF_POLY_C = (1.1266477729354312, -0.367974329471419, 0.10144315429401926,
               -0.019428695071619408, 0.00245863823099253,
               -0.0001936765952060101, 8.532946786589518e-06,
               -1.5980650168595728e-07)


def _erf_poly(x):
    """Odd deg-15 polynomial erf; naturally odd, so no sign/abs handling."""
    x = jnp.clip(x, -_ERF_POLY_B, _ERF_POLY_B)
    x2 = x * x
    p = _ERF_POLY_C[-1]
    for c in _ERF_POLY_C[-2::-1]:
        p = p * x2 + c
    return x * p
_FF_INTERLEAVE = _os.environ.get("INSV2V_FF_INTERLEAVE", "0") == "1"
_FF_BLKM_RES_SMALL = int(_os.environ.get("INSV2V_FF_BLKM_RES_SMALL", "512"))
_FF_BLKM_RES = int(_os.environ.get("INSV2V_FF_BLKM_RES", "128"))
_FF_BLKM_STREAM = int(_os.environ.get("INSV2V_FF_BLKM_STREAM", "512"))


def _gelu_inkernel(g):
    if _FF_GELU == "linear":  # perf probe only
        return g
    if _FF_GELU == "tanh":
        c = 0.7978845608028654  # sqrt(2/pi)
        u = c * (g + 0.044715 * g * g * g)
        return 0.5 * g * (1.0 + jnp.tanh(u))
    if _FF_GELU == "as":
        return 0.5 * g * (1.0 + _erf_approx(g * (2.0 ** -0.5)))
    return 0.5 * g * (1.0 + _erf_poly(g * (2.0 ** -0.5)))


def _erf_approx(x):
    """Abramowitz-Stegun 7.1.25 rational erf, |err| <= 2.5e-5 — an order
    of magnitude below bf16 resolution, and ~half the VPU cost of the
    5-term 7.1.26 form (the device trace showed the gelu polynomial
    rivalling the kernel's matmuls). Mosaic has no erf/erfc lowering in
    this jax version."""
    a1, a2, a3, p = 0.3480242, -0.0958798, 0.7478556, 0.47047
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * a3))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    # sign via f32: Mosaic has no bf16 vector compare ("Target does not
    # support this comparison")
    sgn = jnp.sign(x.astype(jnp.float32)).astype(x.dtype)
    return sgn * y


def _ff_kernel(x_ref, s_ref, b_ref, w1h_ref, b1h_ref, w1g_ref, b1g_ref,
               w2_ref, b2_ref, o_ref, xn_ref, acc_ref, *, eps: float, nj: int):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        xf = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        xn = (xf - mu) * jax.lax.rsqrt(var + eps)
        xn = xn * s_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
        xn_ref[:] = xn.astype(xn_ref.dtype)
        # residual + final bias seed the accumulator
        acc_ref[:] = xf + b2_ref[:].astype(jnp.float32)

    xn = xn_ref[:]
    dt = xn.dtype
    h = jnp.dot(xn, w1h_ref[:], preferred_element_type=jnp.float32)
    h = (h + b1h_ref[:].astype(jnp.float32)).astype(dt)
    g = jnp.dot(xn, w1g_ref[:], preferred_element_type=jnp.float32)
    g = (g + b1g_ref[:].astype(jnp.float32)).astype(dt)
    # gelu via the A-S erf (no Mosaic erf/erfc lowering), in activation dtype
    gated = (h * _gelu_inkernel(g)).astype(w2_ref.dtype)
    acc_ref[:] += jnp.dot(gated, w2_ref[:], preferred_element_type=jnp.float32)

    @pl.when(j == nj - 1)
    def _done():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def _ff_kernel_resident(x_ref, s_ref, b_ref, w1h_ref, b1h_ref, w1g_ref,
                        b1g_ref, w2_ref, b2_ref, o_ref, *, eps: float):
    """Single-pass variant with ALL weights resident in VMEM (C <= 640).

    The streamed (i, j) grid re-DMAs every weight block once per ROW
    block (j is the fast dim), which measured ~0.4 ms/call of pure weight
    refetch at level 0; with 2.5-10 MB of total FF weights there is no
    reason to stream them.

    INSV2V_FF_INTERLEAVE=1 splits the row block into two halves with the
    second half's GEGLU matmuls issued before the first half's gelu, so
    the scheduler can overlap MXU (dots) with VPU (gelu) across halves
    (r3: the gelu was measured at ~6% of the whole chain).
    """
    xf = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    xn = (xf - mu) * jax.lax.rsqrt(var + eps)
    xn = (xn * s_ref[:].astype(jnp.float32)
          + b_ref[:].astype(jnp.float32)).astype(x_ref.dtype)
    # h/gate arithmetic in the activation dtype (the XLA reference path
    # also gates in bf16: Dense(dtype=bf16)); the ~12-pass gelu polynomial
    # on f32 rivalled the kernel's matmuls on the VPU
    dt = x_ref.dtype
    b1h = b1h_ref[:].astype(jnp.float32)
    b1g = b1g_ref[:].astype(jnp.float32)

    def geglu(xn_half):
        h = jnp.dot(xn_half, w1h_ref[:], preferred_element_type=jnp.float32)
        h = (h + b1h).astype(dt)
        g = jnp.dot(xn_half, w1g_ref[:], preferred_element_type=jnp.float32)
        g = (g + b1g).astype(dt)
        return h, g

    rows = xn.shape[0]
    if _FF_INTERLEAVE and rows % 16 == 0:
        half = rows // 2
        h0, g0 = geglu(xn[:half])
        h1, g1 = geglu(xn[half:])  # MXU work available during gelu(g0)
        gated0 = (h0 * _gelu_inkernel(g0)).astype(w2_ref.dtype)
        out0 = jnp.dot(gated0, w2_ref[:], preferred_element_type=jnp.float32)
        gated1 = (h1 * _gelu_inkernel(g1)).astype(w2_ref.dtype)
        out1 = jnp.dot(gated1, w2_ref[:], preferred_element_type=jnp.float32)
        out = jnp.concatenate([out0, out1], axis=0)
    else:
        h, g = geglu(xn)
        gated = (h * _gelu_inkernel(g)).astype(w2_ref.dtype)
        out = jnp.dot(gated, w2_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = (xf + b2_ref[:].astype(jnp.float32) + out).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def fused_geglu_ff(x, ln_scale, ln_bias, w1, b1, w2, b2,
                   *, eps: float = 1e-5,
                   blk_m: Optional[int] = None, blk_n: int = 256,
                   interpret: bool = False):
    """x: (..., C); w1/b1: (C, 2*inner)/(2*inner,); w2/b2: (inner, C)/(C,).

    Returns ``x + FF(LN(x))`` with the same math as the XLA reference.
    """
    orig_shape = x.shape
    c = x.shape[-1]
    inner = w2.shape[0]
    assert w1.shape == (c, 2 * inner), (w1.shape, c, inner)
    blk_n = min(blk_n, inner)
    while inner % blk_n:  # inner is 4*C; all model widths divide cleanly
        blk_n //= 2
    blk_m_default = blk_m is None
    if blk_m_default:
        # default row-block sizes (env knobs for on-device A/B); an
        # explicit caller blk_m wins on both paths (ADVICE r3)
        blk_m = _FF_BLKM_STREAM if c > 640 else 512
    blk_m = min(blk_m, _round_up(max(int(x.size // c), 1), 8))

    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, c)
    rows_p = _round_up(rows, blk_m)
    if rows_p != rows:
        x2 = jnp.pad(x2, ((0, rows_p - rows), (0, 0)))

    dt = x.dtype
    # match dtypes so the MXU runs its native bf16 path (no-op when the
    # params are already served in the compute dtype)
    w1 = w1 if w1.dtype == dt else w1.astype(dt)
    w2 = w2 if w2.dtype == dt else w2.astype(dt)
    b1r = b1.reshape(1, 2 * inner).astype(dt)
    b2r = b2.reshape(1, c).astype(dt)
    sc = ln_scale.reshape(1, c)
    bc = ln_bias.reshape(1, c)

    if not interpret:
        try:
            interpret = jax.default_backend() != "tpu"
        except RuntimeError:  # pragma: no cover
            interpret = True

    if c <= 640:
        # weights fully resident; one pass per row block. blk_m trades
        # the (rows, 4C) f32 GEGLU intermediate against VMEM.
        # (env knobs for on-device A/B; defaults are the r2-tuned values)
        if blk_m_default:
            blk_m = min(blk_m, _FF_BLKM_RES_SMALL if c <= 384 else _FF_BLKM_RES)
        rows_p2 = _round_up(rows_p, blk_m)
        if rows_p2 != x2.shape[0]:
            x2 = jnp.pad(x2, ((0, rows_p2 - x2.shape[0]), (0, 0)))
        out = pl.pallas_call(
            functools.partial(_ff_kernel_resident, eps=eps),
            grid=(rows_p2 // blk_m,),
            in_specs=[
                pl.BlockSpec((blk_m, c), lambda i: (i, 0)),   # x rows
                pl.BlockSpec((1, c), lambda i: (0, 0)),       # ln scale
                pl.BlockSpec((1, c), lambda i: (0, 0)),       # ln bias
                # two views of the same GEGLU weight: h half, gate half
                pl.BlockSpec((c, inner), lambda i: (0, 0)),
                pl.BlockSpec((1, inner), lambda i: (0, 0)),
                pl.BlockSpec((c, inner), lambda i: (0, 1)),
                pl.BlockSpec((1, inner), lambda i: (0, 1)),
                pl.BlockSpec((inner, c), lambda i: (0, 0)),   # w2
                pl.BlockSpec((1, c), lambda i: (0, 0)),       # b2
            ],
            out_specs=pl.BlockSpec((blk_m, c), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows_p2, c), dt),
            interpret=interpret,
        )(x2, sc, bc, w1, b1r, w1, b1r, w2, b2r)
        return out[:rows].reshape(orig_shape)

    nj = inner // blk_n
    kernel = functools.partial(_ff_kernel, eps=eps, nj=nj)
    out = pl.pallas_call(
        kernel,
        grid=(rows_p // blk_m, nj),
        in_specs=[
            pl.BlockSpec((blk_m, c), lambda i, j: (i, 0)),        # x rows
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),            # ln scale
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),            # ln bias
            # two views of the same GEGLU weight: h half then gate half
            pl.BlockSpec((c, blk_n), lambda i, j, _nj=nj: (0, j)),
            pl.BlockSpec((1, blk_n), lambda i, j, _nj=nj: (0, j)),
            pl.BlockSpec((c, blk_n), lambda i, j, _nj=nj: (0, _nj + j)),
            pl.BlockSpec((1, blk_n), lambda i, j, _nj=nj: (0, _nj + j)),
            pl.BlockSpec((blk_n, c), lambda i, j: (j, 0)),        # w2
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),            # b2
        ],
        out_specs=pl.BlockSpec((blk_m, c), lambda i, j: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows_p, c), dt),
        scratch_shapes=[
            # LN output, reused across all inner blocks of a row block
            pltpu.VMEM((blk_m, c), dt),
            pltpu.VMEM((blk_m, c), jnp.float32),
        ],
        interpret=interpret,
    )(x2, sc, bc, w1, b1r, w1, b1r, w2, b2r)
    return out[:rows].reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _ff_with_vjp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps):
    return fused_geglu_ff(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=eps)


def _ff_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2, eps):
    out = fused_geglu_ff(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=eps)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def _ff_bwd(eps, res, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: geglu_ff_reference(*a, eps=eps),
        x, ln_scale, ln_bias, w1, b1, w2, b2)
    return vjp(g)


_ff_with_vjp.defvjp(_ff_fwd, _ff_bwd)

_FUSED_FF = _os.environ.get("INSV2V_FUSED_FF", "1") != "0"
# shared with ops/attention.py: dispatch to the kernel off-TPU in
# interpret mode so sharded CPU-mesh tests cover the kernel path
_PALLAS_INTERPRET = _os.environ.get("INSV2V_FLASH_INTERPRET", "0") == "1"


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def geglu_ff(x, ln_scale, ln_bias, w1, b1, w2, b2, *, eps: float = 1e-5):
    """Auto-dispatching LN+GEGLU-FF+residual: Pallas on TPU, XLA elsewhere.

    The kernel streams w1 in (c, blk_n) blocks, and Mosaic requires the
    block's lane dim to be a 128-multiple (or the full array dim), so
    tiny test-sized widths fall back to the XLA path.
    """
    inner = w2.shape[0]
    if _FUSED_FF and (_on_tpu() or _PALLAS_INTERPRET) and inner % 128 == 0:
        return _ff_with_vjp(x, ln_scale, ln_bias, w1, b1, w2, b2, eps)
    return geglu_ff_reference(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=eps)
