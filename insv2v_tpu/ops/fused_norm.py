"""Pallas fused row-wise LayerNorm (experimental, env-gated).

The norm stack costs ~10% of a denoise step (PERF.md ablations); XLA
lowers LayerNorm as several passes over the activation. This kernel does
one read + one write per row block: stats, normalize, and affine in VMEM.

Enabled with INSV2V_PALLAS_NORM=1 (off by default until the on-device A/B
shows a win); golden snapshots (tests/test_golden.py) guard numerics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["fused_layer_norm"]


def _ln_kernel(x_ref, scale_ref, bias_ref, o_ref, *, eps: float):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    o_ref[:] = y.astype(o_ref.dtype)


def fused_layer_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """LayerNorm over the last axis. x: (..., C); returns x.dtype."""
    orig_shape = x.shape
    c = orig_shape[-1]
    n = 1
    for s in orig_shape[:-1]:
        n *= s
    xr = x.reshape(n, c)
    blk = min(block_rows, n)
    pad = (-n) % blk
    if pad:
        xr = jnp.pad(xr, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=((n + pad) // blk,),
        in_specs=[
            pl.BlockSpec((blk, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((blk, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n + pad, c), x.dtype),
        interpret=interpret,
    )(xr, scale, bias)
    return out[:n].reshape(orig_shape)
