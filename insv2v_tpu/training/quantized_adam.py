"""Block-wise int8-quantized Adam — the bitsandbytes ``Adam8bit`` parity
item (pl_trainer/instruct_p2p_video.py:199,244) as a pure-optax
GradientTransformation.

Both Adam moments are stored as int8 codes with one f32 absmax scale per
block of 256 values (dynamic blockwise quantization, the same scheme
bnb uses): state memory drops ~3.5x vs f32 Adam while update math runs in
f32 after dequantization. On TPU this is pure XLA (cast/scale ops fuse
into the update), no custom kernel needed.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["adam8bit", "quantize_blockwise", "dequantize_blockwise"]

BLOCK = 256


# bnb-style dynamic log codes: log-spaced magnitudes give ~3.6% relative
# resolution across 4+ decades — linear absmax codes would zero out the
# small entries of the second moment and blow up 1/sqrt(v).
#
# The code<->value maps are CLOSED-FORM (code i in [1..N] represents
# exp(ln_min + (i-1) * (-ln_min) / (N-1)), code 0 is exactly 0), so both
# quantize and dequantize are pure elementwise exp/log — no searchsorted
# and no table gathers. The gather-based r1 formulation compiled but
# FAULTED the v5e at full production scale (520-leaf optimizer program;
# plain adam ran fine) and the elementwise form is faster anyway.
_S_LNMIN = float(jnp.log(1e-4))   # signed: 127 magnitude codes
_S_STEP = -_S_LNMIN / 126.0
_U_LNMIN = float(jnp.log(1e-8))   # unsigned: 255 codes
_U_STEP = -_U_LNMIN / 254.0


def _log_code(y: jnp.ndarray, ln_min: float, step: float, top: int
              ) -> jnp.ndarray:
    """Nearest-in-log-space code index for y in [0, 1]; 0 below half the
    smallest representable magnitude (matching nearest-to-zero)."""
    cutoff = 0.5 * jnp.exp(ln_min)
    safe = jnp.maximum(y, cutoff)
    idx = jnp.round(1.0 + (jnp.log(safe) - ln_min) / step)
    idx = jnp.clip(idx, 1, top)
    return jnp.where(y < cutoff, 0, idx.astype(jnp.int32))


def _log_value(idx: jnp.ndarray, ln_min: float, step: float) -> jnp.ndarray:
    i = idx.astype(jnp.float32)
    val = jnp.exp(ln_min + (i - 1.0) * step)
    return jnp.where(idx == 0, 0.0, val)


def quantize_blockwise(x: jnp.ndarray, signed: bool = True
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """f32 array -> (int8 codes, f32 per-block absmax scales).

    signed=True: sign + 7-bit log-magnitude code (Adam m).
    signed=False: 8-bit log code for non-negative values (Adam v),
    stored biased by -128 to fit int8.
    """
    flat = x.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % BLOCK
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, BLOCK)
    absmax = jnp.max(jnp.abs(blocks), axis=1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax, 1.0).astype(jnp.float32)
    y = blocks / scale
    if signed:
        mag = _log_code(jnp.abs(y), _S_LNMIN, _S_STEP, 127)
        codes = (jnp.sign(y) * mag.astype(jnp.float32)).astype(jnp.int8)
    else:
        codes = _log_code(jnp.maximum(y, 0.0), _U_LNMIN, _U_STEP, 255)
        codes = (codes - 128).astype(jnp.int8)  # store biased in int8
    return codes, scale


def dequantize_blockwise(codes: jnp.ndarray, scale: jnp.ndarray,
                         shape: Tuple[int, ...], signed: bool = True
                         ) -> jnp.ndarray:
    n = 1
    for s in shape:
        n *= s
    c = codes.astype(jnp.int32)
    if signed:
        vals = jnp.sign(c).astype(jnp.float32) * _log_value(
            jnp.abs(c), _S_LNMIN, _S_STEP)
    else:
        vals = _log_value(c + 128, _U_LNMIN, _U_STEP)
    flat = (vals * scale).reshape(-1)[:n]
    return flat.reshape(shape)


class _QPair(NamedTuple):
    codes: jnp.ndarray
    scale: jnp.ndarray


class Adam8bitState(NamedTuple):
    count: jnp.ndarray
    m_codes: optax.Updates
    m_scale: optax.Updates
    v_codes: optax.Updates
    v_scale: optax.Updates


def adam8bit(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    min_quant_size: int = 4096,
) -> optax.GradientTransformation:
    """Adam with int8 blockwise-quantized moments.

    Leaves smaller than ``min_quant_size`` keep f32 moments (bnb does the
    same: tiny tensors aren't worth quantizing and are precision-critical).
    """

    def should_quant(p):
        return p.size >= min_quant_size

    _SENTINEL_SHAPE = (0,)

    def q(x, signed=True):
        if should_quant(x):
            return _QPair(*quantize_blockwise(x, signed=signed))
        # unquantized leaf: f32 moment in the codes slot, empty scale sentinel
        return _QPair(x, jnp.zeros(_SENTINEL_SHAPE, jnp.float32))

    def init(params):
        zeros_like = lambda p: jnp.zeros(p.shape, jnp.float32)
        mq = jax.tree_util.tree_map(lambda p: q(zeros_like(p)), params)
        m_codes = jax.tree_util.tree_map(lambda t: t[0], mq,
                                         is_leaf=lambda t: isinstance(t, _QPair))
        m_scale = jax.tree_util.tree_map(lambda t: t[1], mq,
                                         is_leaf=lambda t: isinstance(t, _QPair))
        vq = jax.tree_util.tree_map(lambda p: q(zeros_like(p), signed=False), params)
        v_codes = jax.tree_util.tree_map(lambda t: t[0], vq,
                                         is_leaf=lambda t: isinstance(t, _QPair))
        v_scale = jax.tree_util.tree_map(lambda t: t[1], vq,
                                         is_leaf=lambda t: isinstance(t, _QPair))
        return Adam8bitState(jnp.zeros((), jnp.int32), m_codes, m_scale,
                             v_codes, v_scale)

    def update(grads, state, params=None):
        count = state.count + 1

        def leaf_update(g, mc, ms, vc, vs):
            g = g.astype(jnp.float32)
            unquant = ms.size == 0  # static
            if unquant:
                m_prev, v_prev = mc, vc  # stored f32
            else:
                m_prev = dequantize_blockwise(mc, ms, g.shape, signed=True)
                v_prev = dequantize_blockwise(vc, vs, g.shape, signed=False)
            m = b1 * m_prev + (1 - b1) * g
            v = b2 * v_prev + (1 - b2) * g * g
            mhat = m / (1 - b1 ** count.astype(jnp.float32))
            vhat = v / (1 - b2 ** count.astype(jnp.float32))
            upd = -learning_rate * mhat / (jnp.sqrt(vhat) + eps)
            if unquant:
                return upd, m, ms, v, vs
            mc2, ms2 = quantize_blockwise(m, signed=True)
            vc2, vs2 = quantize_blockwise(v, signed=False)
            return upd, mc2, ms2, vc2, vs2

        flat_g, treedef = jax.tree_util.tree_flatten(grads)
        flat_mc = treedef.flatten_up_to(state.m_codes)
        flat_ms = treedef.flatten_up_to(state.m_scale)
        flat_vc = treedef.flatten_up_to(state.v_codes)
        flat_vs = treedef.flatten_up_to(state.v_scale)
        outs = [leaf_update(*args) for args in
                zip(flat_g, flat_mc, flat_ms, flat_vc, flat_vs)]
        unflat = lambda i: jax.tree_util.tree_unflatten(
            treedef, [o[i] for o in outs])
        new_state = Adam8bitState(count, unflat(1), unflat(2), unflat(3),
                                  unflat(4))
        return unflat(0), new_state

    return optax.GradientTransformation(init, update)
