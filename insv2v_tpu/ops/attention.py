"""Multi-head attention: fused-XLA reference path + Pallas TPU flash kernel.

This replaces the reference's native attention backends — xformers CUDA
kernels (modules/video_unet_temporal/attention.py:26-30,205-231), torch SDPA
(motion_module.py:310-316) and the manual einsum fallback
(motion_module.py:338-351) — with two TPU-native paths:

  * ``attention``: softmax(q k^T / sqrt(d)) v with f32 logits/softmax,
    expressed so XLA fuses it; used for short sequences (cross-attention
    over 77 text tokens, temporal attention over <=32 frames) and as the
    recompute path for the flash kernel's backward.
  * ``flash_attention``: an online-softmax Pallas kernel tiled for the MXU,
    used for the long spatial sequences (H*W up to a few thousand) where
    materializing the logits matrix would blow HBM bandwidth.

``dot_attention`` auto-dispatches between the two and wires a custom VJP
(backward recomputes attention with the XLA path — the standard
memory/compute trade that keeps training correct without a bespoke
backward kernel).

Layouts: q: (B, H, Sq, D), k/v: (B, H, Sk, D), output (B, H, Sq, D).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu is importable on CPU builds too; guard anyway
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

__all__ = ["attention", "flash_attention", "dot_attention"]

import os as _os_top

# bf16 logits storage on the XLA attention paths. Default: ON on TPU
# (r3 A/B/A: 2.08/1.96/2.06 s probe => ~5.5% end-to-end win — the packed
# temporal (B,P,128,128) logits/probs round trip is the temporal region's
# largest HBM term), OFF elsewhere (CPU oracle/golden tests stay exact).
# INSV2V_ATTN_LOGITS_BF16=0/1 overrides either way. None = auto.
_raw_lb16 = _os_top.environ.get("INSV2V_ATTN_LOGITS_BF16")
_LOGITS_BF16 = None if _raw_lb16 is None else _raw_lb16 == "1"


def logits_bf16() -> bool:
    if _LOGITS_BF16 is not None:
        return _LOGITS_BF16
    return _on_tpu()


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Plain attention with f32 softmax; output in q.dtype.

    Logits are stored bf16 on TPU by default (MXU still accumulates f32
    internally; softmax still runs f32 after an in-register upcast) —
    halves the logits HBM round trip on the XLA attention paths at the
    cost of ~bf16-resolution logit quantization (~e^0.03 relative prob
    error at |logit|<=8; ~5.5% end-to-end win, PERF.md r3). f32 off-TPU
    (oracle-exact); INSV2V_ATTN_LOGITS_BF16 overrides (see logits_bf16).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    acc_dt = jnp.bfloat16 if logits_bf16() else jnp.float32
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=acc_dt
    ).astype(jnp.float32)
    logits = logits * jnp.float32(scale)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, blk_k: int, sk: int):
    """Online-softmax attention over one (batch*head, q-block).

    q_ref: (blk_q, Dp) VMEM; k_ref/v_ref: (Skp, Dp) VMEM; o_ref: (blk_q, Dp).
    Padded key rows (index >= sk) are masked to -inf before the softmax.
    """
    q = q_ref[:].astype(jnp.float32) * scale
    blk_q, dp = q.shape
    skp = k_ref.shape[0]
    num_k_blocks = skp // blk_k

    def body(j, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[pl.ds(j * blk_k, blk_k), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(j * blk_k, blk_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (blk_q, blk_k)
        col = jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1) + j * blk_k
        s = jnp.where(col < sk, s, -jnp.inf)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m0 = jnp.full((blk_q, 1), -jnp.inf, dtype=jnp.float32)
    l0 = jnp.zeros((blk_q, 1), dtype=jnp.float32)
    acc0 = jnp.zeros((blk_q, dp), dtype=jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_k_blocks, body, (m0, l0, acc0))
    o_ref[:] = (acc / l).astype(o_ref.dtype)


def _flash_kernel_headfold(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                           blk_k: int, sk: int):
    """VERDICT r4 #4 A/B variant: ALL heads of one q-block per grid step
    (grid (B, Sq-blocks) instead of (B*H, Sq-blocks) — 8x fewer grid
    steps, same MXU tile count; the d=40 pad itself is tile-conserved
    under any block-diagonal head packing, see PERF.md r4).

    q_ref: (1, H, blk_q, Dp); k_ref/v_ref: (1, H, Skp, Dp)."""
    _, h, blk_q, dp = q_ref.shape
    skp = k_ref.shape[2]
    num_k_blocks = skp // blk_k

    for i in range(h):  # static unroll over heads
        q = q_ref[0, i].astype(jnp.float32) * scale

        def body(j, carry):
            m_prev, l_prev, acc = carry
            k_blk = k_ref[0, i, pl.ds(j * blk_k, blk_k), :].astype(jnp.float32)
            v_blk = v_ref[0, i, pl.ds(j * blk_k, blk_k), :].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            col = jax.lax.broadcasted_iota(
                jnp.int32, (blk_q, blk_k), 1) + j * blk_k
            s = jnp.where(col < sk, s, -jnp.inf)
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jax.lax.dot_general(
                p, v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, l_new, acc

        m0 = jnp.full((blk_q, 1), -jnp.inf, dtype=jnp.float32)
        l0 = jnp.zeros((blk_q, 1), dtype=jnp.float32)
        acc0 = jnp.zeros((blk_q, dp), dtype=jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, num_k_blocks, body, (m0, l0, acc0))
        o_ref[0, i] = (acc / l).astype(o_ref.dtype)


_FLASH_HEADFOLD = _os_top.environ.get("INSV2V_FLASH_HEADFOLD", "0") == "1"


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    blk_q: Optional[int] = None,
    blk_k: Optional[int] = None,
    interpret: bool = False,
    headfold: Optional[bool] = None,
) -> jnp.ndarray:
    """Pallas flash-attention forward. q: (B,H,Sq,D); k,v: (B,H,Sk,D)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if blk_q is None:
        blk_q = _FLASH_BLK_Q
    if blk_k is None:
        blk_k = _FLASH_BLK_K

    def pick_block(s: int, target: int) -> int:
        """Largest block <= target that minimizes pad waste: split s into
        ceil(s/target) near-equal 128-aligned chunks."""
        nblk = -(-s // target)
        return min(target, _round_up(-(-s // nblk), 128))

    if not interpret:
        try:  # Mosaic only lowers on TPU; everywhere else interpret
            interpret = jax.default_backend() != "tpu"
        except RuntimeError:  # pragma: no cover
            interpret = True

    b, h, sq, d = q.shape
    sk = k.shape[2]
    blk_q = pick_block(sq, blk_q)
    blk_k = pick_block(sk, blk_k)
    sqp = _round_up(sq, blk_q)
    skp = _round_up(sk, blk_k)

    # NO d->128 lane padding in HBM: a block whose minor dim equals the
    # full array dim is legal at any size (the Mosaic (8,128) rule only
    # forbids partial lane blocks), and the VMEM tiles pad themselves.
    # The r1 jnp.pad cost ~8 ms/step of pure pad writes plus 3.2x kernel
    # DMA on the 256x384 workload; only the MXU contraction still pays
    # the d=40->128 register padding (unavoidable).
    if headfold is None:
        headfold = _FLASH_HEADFOLD
    if headfold:
        # one grid step per (batch, q-block) covering ALL heads (r4 #4 A/B)
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, sqp - sq), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, skp - sk), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, skp - sk), (0, 0)))
        kernel = functools.partial(_flash_kernel_headfold, scale=scale,
                                   blk_k=blk_k, sk=sk)
        out = pl.pallas_call(
            kernel,
            grid=(b, sqp // blk_q),
            in_specs=[
                pl.BlockSpec((1, h, blk_q, d), lambda ib, iq: (ib, 0, iq, 0)),
                pl.BlockSpec((1, h, skp, d), lambda ib, iq: (ib, 0, 0, 0)),
                pl.BlockSpec((1, h, skp, d), lambda ib, iq: (ib, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, h, blk_q, d),
                                   lambda ib, iq: (ib, 0, iq, 0)),
            out_shape=jax.ShapeDtypeStruct((b, h, sqp, d), q.dtype),
            interpret=interpret,
        )(qp, kp, vp)
        return out[:, :, :sq, :]

    qp = jnp.pad(q.reshape(b * h, sq, d), ((0, 0), (0, sqp - sq), (0, 0)))
    kp = jnp.pad(k.reshape(b * h, sk, d), ((0, 0), (0, skp - sk), (0, 0)))
    vp = jnp.pad(v.reshape(b * h, sk, d), ((0, 0), (0, skp - sk), (0, 0)))

    kernel = functools.partial(_flash_kernel, scale=scale, blk_k=blk_k, sk=sk)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, sqp // blk_q),
        in_specs=[
            pl.BlockSpec((None, blk_q, d), lambda bh, iq: (bh, iq, 0)),
            pl.BlockSpec((None, skp, d), lambda bh, iq: (bh, 0, 0)),
            pl.BlockSpec((None, skp, d), lambda bh, iq: (bh, 0, 0)),
        ],
        out_specs=pl.BlockSpec((None, blk_q, d), lambda bh, iq: (bh, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, sqp, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :sq, :].reshape(b, h, sq, d)


# Flash forward with XLA-recompute backward: the flash kernel is only used
# for the primal; gradients re-run plain attention (whose memory spike is
# acceptable under jax.checkpoint at block granularity).
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_with_vjp(q, k, v, scale):
    return flash_attention(q, k, v, scale=scale)


def _flash_fwd(q, k, v, scale):
    return flash_attention(q, k, v, scale=scale), (q, k, v)


def _flash_bwd(scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: attention(q_, k_, v_, scale=scale), q, k, v)
    return vjp(g)


_flash_with_vjp.defvjp(_flash_fwd, _flash_bwd)

# Sequences shorter than this don't benefit from tiling — the fused XLA
# path is faster and avoids padding waste (cross-attn Sk=77, temporal F<=32).
# Env knobs allow perf A/B without code edits. r2 A/B: 256 (flash for the
# level-1 S=384 spatial attention too) beat 512 by ~1% end-to-end.
import os as _os

_FLASH_MIN_SEQ = int(_os.environ.get("INSV2V_FLASH_MIN_SEQ", "256"))
# k-side threshold, separate so cross-attention (Sk=77, Sq=1536) can be
# dispatched to flash independently of the self-attn gate (r3 A/B)
_FLASH_MIN_KSEQ = int(
    _os.environ.get("INSV2V_FLASH_MIN_KSEQ", str(_FLASH_MIN_SEQ)))
_FLASH_DISABLED = _os.environ.get("INSV2V_FLASH", "1") == "0"
# defaults from v5e A/B on the 256x384 editing workload (r2: 768/1536 beat
# 512/768 by 3.5% end-to-end and the fused-XLA path by 10%; k/v fully
# resident for the level-0 S=1536 spatial attention)
_FLASH_BLK_Q = int(_os.environ.get("INSV2V_FLASH_BLKQ", "768"))
_FLASH_BLK_K = int(_os.environ.get("INSV2V_FLASH_BLKK", "1536"))
# INSV2V_FLASH_INTERPRET=1: dispatch to the Pallas kernels (flash here,
# fused FF in ops/fused_ff.py) even off-TPU, running them in Pallas
# interpret mode — lets the CPU-mesh sharding tests cover the KERNEL code
# paths instead of the XLA fallbacks (tests/test_sharded_kernels.py).
_FLASH_INTERPRET = _os.environ.get("INSV2V_FLASH_INTERPRET", "0") == "1"


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


# ---------------------------------------------------------------------------
# Fused packed temporal attention (VERDICT r3 #3).
#
# The striped-packed temporal attention (models/unet3d.py VersatileAttention:
# heads*frames merged into one m=128 axis, block-diagonal -inf mask on
# cross-head entries) runs in XLA as a batched 128x128 matmul pair whose
# (B, P, 128, 128) logits/probs round-trip HBM — the temporal region's
# largest HBM term even stored bf16 (~302 MB/layer f32 at the production
# shape, PERF.md r3). This kernel fuses qk^T + masked softmax + pv over a
# block of pixels so the logits live only in VMEM. m is just 128, so a
# plain (not online) softmax suffices; the mask is computed in-kernel from
# iota (striped packing => head id = index % heads).
# ---------------------------------------------------------------------------

_PTA_BLKP = int(_os_top.environ.get("INSV2V_PTA_BLKP", "16"))
# INSV2V_FUSED_TEMPORAL: 1 routes the packed temporal attention through the
# Pallas kernel on TPU (and under INSV2V_FLASH_INTERPRET for CPU tests).
# Default OFF: measured SLOWER than the XLA batched-matmul form on the
# v5e 16f/10-step probe in every configuration tried — batch mode 1.89 s
# (blk_p=16) / 1.94 s (blk_p=4), bigblock 1.98 s (blk_p=4) / 2.00 s
# (blk_p=8), vs 1.79 s XLA (blk_p 64/128 fail to lower). XLA pipelines
# the batched 128x128 matmuls + fused softmax better than Mosaic's
# unrolled batch dots despite the extra logits HBM round trip. See
# PERF.md r4 "Negative results".
_FUSED_TEMPORAL = _os_top.environ.get("INSV2V_FUSED_TEMPORAL", "0") == "1"
# kernel inner form: "batch" = one (blk_p, m, m) batched dot pair (Mosaic
# unrolls the batch); "bigblock" = merge blk_p pixels into ONE
# (blk_p*m, blk_p*m) masked matmul pair — blk_p x the issued FLOPs but a
# single large MXU op per block.
_PTA_MODE = _os_top.environ.get("INSV2V_PTA_MODE", "batch")


def _packed_temporal_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int,
                            scale: float):
    """One (blk_p, m, e) pixel block: per-pixel m x m attention with the
    cross-head block-diagonal mask; logits stay in VMEM."""
    q = q_ref[:]
    k = k_ref[:]
    v = v_ref[:]
    _, m, _ = q.shape
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (blk_p, m, m)
    row = jax.lax.broadcasted_iota(jnp.int32, (m, m), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (m, m), 1)
    mask = jnp.where(row % heads == col % heads, 0.0, -jnp.inf
                     ).astype(jnp.float32)
    s = s * jnp.float32(scale) + mask[None]
    mx = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - mx)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (blk_p, m, e)
    o_ref[:] = o.astype(o_ref.dtype)


def _packed_temporal_kernel_bigblock(q_ref, k_ref, v_ref, o_ref, *,
                                     heads: int, scale: float):
    """blk_p pixels merged into ONE (blk_p*m, blk_p*m) masked matmul pair:
    the mask zeroes cross-pixel AND cross-head entries, so the fused
    softmax+PV over the merged axis equals the per-pixel form. blk_p x
    issued FLOPs, but a single large MXU op per block (vs blk_p small
    batched dots the compiler unrolls)."""
    blk_p, m, e = q_ref.shape
    n = blk_p * m
    q = q_ref[:].reshape(n, e)
    k = k_ref[:].reshape(n, e)
    v = v_ref[:].reshape(n, e)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (n, n)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    ok = (row // m == col // m) & (row % heads == col % heads)
    s = jnp.where(ok, s * jnp.float32(scale), -jnp.inf)
    mx = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - mx)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[:] = o.reshape(blk_p, m, e).astype(o_ref.dtype)


def packed_temporal_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    scale: Optional[float] = None,
    blk_p: Optional[int] = None,
    interpret: bool = False,
    mode: Optional[str] = None,
) -> jnp.ndarray:
    """Fused packed temporal attention. q/k/v: (B, P, m, e) striped-packed
    (m = frames*heads, frame-major so head id = index % heads); returns
    softmax(q k^T * scale + blockdiag_mask) v in (B, P, m, e)."""
    b, p_, m, e = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(e)
    if blk_p is None:
        blk_p = _PTA_BLKP
    if not interpret:
        try:
            interpret = jax.default_backend() != "tpu"
        except RuntimeError:  # pragma: no cover
            interpret = True

    n = b * p_
    blk_p = min(blk_p, n)
    np_ = _round_up(n, blk_p)
    qf = q.reshape(n, m, e)
    kf = k.reshape(n, m, e)
    vf = v.reshape(n, m, e)
    if np_ != n:
        pad = ((0, np_ - n), (0, 0), (0, 0))
        qf, kf, vf = jnp.pad(qf, pad), jnp.pad(kf, pad), jnp.pad(vf, pad)

    if mode is None:
        mode = _PTA_MODE
    kfn = (_packed_temporal_kernel_bigblock if mode == "bigblock"
           else _packed_temporal_kernel)
    kernel = functools.partial(kfn, heads=heads, scale=scale)
    spec = pl.BlockSpec((blk_p, m, e), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        kernel,
        grid=(np_ // blk_p,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((np_, m, e), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:n].reshape(b, p_, m, e)


def packed_temporal_attention_xla(q, k, v, heads: int,
                                  scale: Optional[float] = None):
    """The XLA form of the same math (the r2/r3 production path): batched
    matmuls with the (B, P, m, m) logits in HBM (bf16 on TPU). Kept as the
    fallback for non-128 m, the CPU/golden path, and the VJP recompute."""
    m = q.shape[2]
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    head_id = jnp.arange(m) % heads
    mask = jnp.where(head_id[:, None] == head_id[None, :], 0.0,
                     -jnp.inf).astype(jnp.float32)
    acc_dt = jnp.bfloat16 if logits_bf16() else jnp.float32
    logits = jnp.einsum("bpme,bpne->bpmn", q, k,
                        preferred_element_type=acc_dt).astype(jnp.float32)
    logits = logits * jnp.float32(scale) + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bpmn,bpne->bpme", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _packed_temporal_with_vjp(q, k, v, heads, scale):
    return packed_temporal_attention(q, k, v, heads, scale=scale)


def _packed_temporal_fwd(q, k, v, heads, scale):
    return packed_temporal_attention(q, k, v, heads, scale=scale), (q, k, v)


def _packed_temporal_bwd(heads, scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: packed_temporal_attention_xla(
            q_, k_, v_, heads, scale=scale), q, k, v)
    return vjp(g)


_packed_temporal_with_vjp.defvjp(_packed_temporal_fwd, _packed_temporal_bwd)


def dispatch_packed_temporal(q, k, v, heads: int, scale: float):
    """Kernel on TPU for the MXU-shaped m=128 production packing (and under
    INSV2V_FLASH_INTERPRET so CPU tests exercise the kernel code path);
    XLA batched matmuls otherwise."""
    m = q.shape[2]
    use_kernel = (
        _FUSED_TEMPORAL
        and (_on_tpu() or _FLASH_INTERPRET)
        and m == 128
        and m % heads == 0
    )
    if use_kernel:
        return _packed_temporal_with_vjp(q, k, v, heads, scale)
    return packed_temporal_attention_xla(q, k, v, heads, scale=scale)


def dot_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Auto-dispatching attention. Flash on TPU for long sequences."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if use_flash is None:
        use_flash = (
            not _FLASH_DISABLED
            and (_on_tpu() or _FLASH_INTERPRET)
            and q.shape[2] >= _FLASH_MIN_SEQ
            and k.shape[2] >= _FLASH_MIN_KSEQ
        )
    if use_flash:
        return _flash_with_vjp(q, k, v, scale)
    return attention(q, k, v, scale=scale)


def dot_attention_bshd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    heads: int,
    use_flash: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-head attention on the raw (B, S, heads*d) projection layout.

    Reshapes/transposes to (B, H, S, d) once and calls ``dot_attention``
    (flash on TPU for long sequences, fused XLA otherwise). A kernel that
    reads the bshd layout directly via per-head lane-sliced BlockSpecs was
    attempted and does NOT lower on Mosaic (jax 0.9.0) — see PERF.md
    "Negative results"; the relayout here is the supported path.
    """
    d = q.shape[-1] // heads
    scale = 1.0 / math.sqrt(d)
    if use_flash is None:
        use_flash = (
            not _FLASH_DISABLED
            and (_on_tpu() or _FLASH_INTERPRET)
            and q.shape[1] >= _FLASH_MIN_SEQ
            and k.shape[1] >= _FLASH_MIN_KSEQ
        )
    b, sq, c = q.shape
    sk = k.shape[1]
    split = lambda t, s: t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    o = dot_attention(split(q, sq), split(k, sk), split(v, sk), scale=scale,
                      use_flash=use_flash)
    return o.transpose(0, 2, 1, 3).reshape(b, sq, c)
