"""UNet3DConditionModel: SD-1.5 UNet inflated to video + AnimateDiff motion
modules, as Flax modules over the canonical ``(B, F, H, W, C)`` layout.

Re-designs the reference model family (modules/video_unet_temporal/
{unet.py, unet_blocks.py, attention.py, motion_module.py, resnet.py})
TPU-first:

  * one canonical channels-last video layout; spatial modules see
    ``(B*F, H*W, C)`` and temporal modules ``(B*H*W, F, C)`` via pure
    reshape/transpose (the reference's einops churn collapses to this);
  * convs are 2D convs with (B, F) as a joint batch — XLA:TPU lowers this
    to its native NHWC conv, no per-frame Python loop (InflatedConv3d,
    resnet.py:10-18);
  * GroupNorm statistics match torch semantics exactly: ResnetBlock3D
    norms pool ACROSS frames (5D GN), transformer norms are per-frame
    (resnet.py:141 vs attention.py:95,101 — see ops/norms.py);
  * attention goes through ``dot_attention`` (Pallas flash on TPU for the
    long spatial sequences);
  * ``video_start_index`` is a traced scalar so sliding-window inference
    jits once (dynamic PE slice, motion_module.py:236-241).

Param-tree names mirror the torch state-dict paths through
``convert_unet3d_state_dict`` — e.g. ``down_blocks_0/attentions_1/
transformer_blocks_0/attn2/to_k/kernel``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from insv2v_tpu.ops.attention import dot_attention_bshd
from insv2v_tpu.ops.fused_ff import geglu_ff
from insv2v_tpu.ops.embeddings import (
    temporal_pe_slice,
    temporal_positional_encoding_table,
    timestep_embedding,
)
from insv2v_tpu.ops.norms import group_norm, group_norm_split_pair, layer_norm
from insv2v_tpu.ops.resize import nearest_upsample_2x
from insv2v_tpu.utils.registry import register

# Profiling-only ablation hook: INSV2V_ABLATE=attn1,attn2,motion,ff skips
# the named sublayers so bench A/Bs can attribute step time (the axon
# relay makes per-op timing unreliable — see bench.py). Never set in
# production paths.
import os as _os

_ABLATE = frozenset(
    x for x in _os.environ.get("INSV2V_ABLATE", "").split(",") if x)

# INSV2V_PACKED_TEMPORAL: 1 forces the block-diagonal packed temporal
# attention, 0 forces the per-head einsum; default = packed on TPU only
# (keeps the CPU golden snapshots bit-exact while the TPU path takes the
# MXU-shaped formulation — see VersatileAttention docstring).
_PACKED_TEMPORAL = _os.environ.get("INSV2V_PACKED_TEMPORAL", "")
# INSV2V_TIME_MINOR=0: keep the packed attention but disable the
# (B, P, F, C) resident MotionModule layout (perf A/B only)
_TIME_MINOR = _os.environ.get("INSV2V_TIME_MINOR", "1") != "0"


def _packed_temporal_attention() -> bool:
    if _PACKED_TEMPORAL in ("0", "1"):
        return _PACKED_TEMPORAL == "1"
    try:
        import jax as _jax

        return _jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """configs/instruct_v2v.yaml:40-85."""

    in_channels: int = 8
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock3D",
        "CrossAttnDownBlock3D",
        "CrossAttnDownBlock3D",
        "DownBlock3D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock3D",
        "CrossAttnUpBlock3D",
        "CrossAttnUpBlock3D",
        "CrossAttnUpBlock3D",
    )
    layers_per_block: int = 2
    attention_head_dim: int = 8  # = num heads (diffusers naming quirk)
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    use_motion_module: bool = True
    motion_module_resolutions: Tuple[int, ...] = (1, 2, 4, 8)
    motion_module_mid_block: bool = False
    motion_num_attention_heads: int = 8
    motion_num_transformer_block: int = 1
    motion_attention_block_types: Tuple[str, ...] = ("Temporal_Self", "Temporal_Self")
    motion_max_seq_length: int = 32
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    remat: bool = False
    # None -> the INSV2V_SPLIT_SKIP env default. The trainer forces False:
    # under remat the split path keeps extra per-part buffers alive and
    # pushed the production accum-256 step 47 MB over the 15.75 GiB HBM
    # (measured r5 compile OOM); inference has the headroom and the win.
    split_skip: Optional[bool] = None

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @classmethod
    def tiny(cls, **kw) -> "UNetConfig":
        """Fixture-sized config for CPU tests."""
        defaults = dict(
            block_out_channels=(8, 16, 16, 16),
            attention_head_dim=2,
            cross_attention_dim=12,
            norm_num_groups=4,
            motion_num_attention_heads=2,
            motion_max_seq_length=8,
        )
        defaults.update(kw)
        return cls(**defaults)


class GroupNorm(nn.Module):
    """Torch-compatible GN; reduce_axes=None -> all non-batch axes."""

    num_groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, reduce_axes=None):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if "norms" in _ABLATE:  # profiling only
            return x
        return group_norm(x, scale, bias, min(self.num_groups, c), self.eps,
                          reduce_axes=reduce_axes)


class LayerNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if "norms" in _ABLATE:  # profiling only
            return x
        return layer_norm(x, scale, bias, self.eps)


class TimestepEmbedding(nn.Module):
    """diffusers TimestepEmbedding MLP (unet.py:98)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb):
        h = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(t_emb)
        h = jax.nn.silu(h)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(h)


# INSV2V_SPATIAL_VIA_DOT (r3 lever, r4 measured — default ON): project
# the spatial q/k/v straight to the (B, H, S, d) flash layout via the
# kernel reshaped (C, heads, d), skipping dot_attention_bshd's explicit
# head transpose (~6.5 ms/step of copies at ops/attention.py:292 in the
# r3 trace). r4 v5e A/B, 16f/10-step probe, two paired sessions:
# ON 1.77/1.82/1.83/1.81 s vs OFF 1.82/1.81/1.84/1.83 s — ON <= OFF in
# every pairing (~1%, noise-bounded but consistent, and strictly less
# explicit data movement). 0 reverts. Param paths unchanged.
_SPATIAL_VIA_DOT = _os.environ.get("INSV2V_SPATIAL_VIA_DOT", "1") == "1"


class _BhsdProjIn(nn.Module):
    """Dense(inner, no bias) emitting (B, H, S, d) directly."""

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, S, C) -> (B, H, S, d)
        c = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (c, self.heads * self.head_dim))
        wr = w.reshape(c, self.heads, self.head_dim).astype(self.dtype)
        return jnp.einsum("bsc,chd->bhsd", x.astype(self.dtype), wr)


class _BhsdProjOut(nn.Module):
    """Dense(out) consuming (B, H, S, d) directly."""

    heads: int
    head_dim: int
    out_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, o):  # (B, H, S, d) -> (B, S, out)
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.heads * self.head_dim, self.out_features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.out_features,))
        wr = w.reshape(self.heads, self.head_dim,
                       self.out_features).astype(self.dtype)
        y = jnp.einsum("bhsd,hdc->bsc", o.astype(self.dtype), wr)
        return y + bias.astype(self.dtype)


class CrossAttention(nn.Module):
    """diffusers ``Attention``: to_q/k/v (no bias) + to_out (bias)."""

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32
    use_flash: Optional[bool] = None

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        inner = self.heads * self.head_dim
        if _SPATIAL_VIA_DOT:
            mk = lambda nm: _BhsdProjIn(self.heads, self.head_dim,
                                        dtype=self.dtype, name=nm)
            q, k, v = mk("to_q")(x), mk("to_k")(context), mk("to_v")(context)
            from insv2v_tpu.ops.attention import dot_attention

            o = dot_attention(q, k, v, use_flash=self.use_flash)
            return _BhsdProjOut(self.heads, self.head_dim, inner,
                                dtype=self.dtype, name="to_out")(o)
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)
        o = dot_attention_bshd(q, k, v, self.heads, use_flash=self.use_flash)
        return nn.Dense(inner, dtype=self.dtype, name="to_out")(o)


class FeedForward(nn.Module):
    """diffusers GEGLU FeedForward (ff.net.0.proj + ff.net.2)."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="geglu_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj_out")(h)


class _AffineParams(nn.Module):
    """Param-only LayerNorm affine; same tree as ``LayerNorm(name=...)``."""

    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class _DenseParams(nn.Module):
    """Param-only Dense; same tree/init as ``nn.Dense(name=...)``."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           (self.in_features, self.features)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class _FFParams(nn.Module):
    """Param-only FeedForward; same tree as ``FeedForward(name=...)``."""

    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self):
        inner = self.dim * self.mult
        w1, b1 = _DenseParams(self.dim, 2 * inner, name="geglu_proj")()
        w2, b2 = _DenseParams(inner, self.dim, name="proj_out")()
        return w1, b1, w2, b2


def _ff_residual_block(parent, x, ln_name: str, ablate_key: str):
    """``x + FeedForward(LN(x))`` via the fused TPU region (ops/fused_ff.py).

    Declares the identical param tree the unfused ``LayerNorm``/
    ``FeedForward`` modules would (so utils/convert.py is unaffected) and
    dispatches to the fused Pallas kernel on TPU / plain XLA elsewhere.
    Assumes ``x.dtype`` is the block's compute dtype (true everywhere in
    this model: convs and norms preserve dtype).
    """
    c = x.shape[-1]
    ls, lb = _AffineParams(c, name=ln_name, parent=parent)()
    w1, b1, w2, b2 = _FFParams(c, name="ff", parent=parent)()
    if ablate_key in _ABLATE:  # profiling only
        return x
    if "norms" in _ABLATE:  # profiling only: FF without the LN
        dt = x.dtype
        h = jnp.dot(x, w1.astype(dt)) + b1.astype(dt)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * jax.nn.gelu(gate, approximate=False)
        return x + jnp.dot(h, w2.astype(dt)) + b2.astype(dt)
    return geglu_ff(x, ls, lb, w1, b1, w2, b2, eps=1e-5)


class BasicTransformerBlock(nn.Module):
    """Spatial: self-attn + text cross-attn + GEGLU FF (attention.py:141-270)."""

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        if "attn1" not in _ABLATE:
            x = x + CrossAttention(self.heads, self.head_dim, dtype=self.dtype,
                                   name="attn1")(LayerNorm(name="norm1")(x))
        if "attn2" not in _ABLATE:
            x = x + CrossAttention(self.heads, self.head_dim, dtype=self.dtype,
                                   use_flash=False, name="attn2")(
                LayerNorm(name="norm2")(x), context)
        return _ff_residual_block(self, x, "norm3", "ff")


class Transformer3DModel(nn.Module):
    """Per-frame spatial transformer (attention.py:33-138).

    x: (B, F, H, W, C); context: (B, L, D_text). Frames fold into batch.
    """

    heads: int
    head_dim: int
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, f, h, w, c = x.shape
        residual = x
        xf = x.reshape(b * f, h, w, c)
        # per-frame GN stats (frames already folded), eps=1e-6 (attention.py:60)
        xf = GroupNorm(self.num_groups, eps=1e-6, name="norm")(xf)
        # proj_in is a 1x1 conv (use_linear_projection=False)
        xf = nn.Conv(self.heads * self.head_dim, (1, 1), dtype=self.dtype,
                     name="proj_in")(xf)
        seq = xf.reshape(b * f, h * w, -1)
        ctx = jnp.repeat(context, f, axis=0)  # (B*F, L, D)
        seq = BasicTransformerBlock(self.heads, self.head_dim, dtype=self.dtype,
                                    name="transformer_blocks_0")(seq, ctx)
        xf = seq.reshape(b * f, h, w, -1)
        xf = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(xf)
        return xf.reshape(b, f, h, w, c) + residual


# INSV2V_PACK_VIA_DOT: emit the packed-temporal q/k/v straight from the
# projection dots in (B, P, m, e) layout (kernel reshaped (C, heads, e))
# instead of projecting to (…, F, C) and re-tiling — see
# VersatileAttention. Param paths are unchanged (to_*/kernel, to_out/bias).
# Default ON (r3 probe 1.81/1.82 vs 1.825/1.83 — <=1%, noise-bounded, but
# strictly less data movement); only active on the packed time-minor
# (TPU production) path. 0 reverts.
_PACK_VIA_DOT = _os.environ.get("INSV2V_PACK_VIA_DOT", "1") == "1"


class _PackedProjIn(nn.Module):
    """Dense(inner, use_bias=False) that contracts with its kernel
    reshaped (C, heads, e) so the output is already the striped-packed
    (B, P, m=f*heads, e) layout. Same param path/shape/init as nn.Dense
    (kernel (C, heads*e), lecun_normal) — checkpoint-compatible."""

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # x: (B, P, F, C)
        b, p, f, c = x.shape
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (c, self.heads * self.head_dim))
        wr = w.reshape(c, self.heads, self.head_dim).astype(self.dtype)
        y = jnp.einsum("bpfc,che->bpfhe", x.astype(self.dtype), wr)
        return y.reshape(b, p, f * self.heads, self.head_dim)


class _PackedProjOut(nn.Module):
    """Dense(C) consuming the striped-packed (B, P, m, e) layout directly:
    contracts (heads, e) jointly with the kernel reshaped (heads, e, C).
    Same param paths/shapes/inits as nn.Dense — checkpoint-compatible."""

    heads: int
    head_dim: int
    out_features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, o, f):  # o: (B, P, m, e) -> (B, P, F, C)
        b, p, m, e = o.shape
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.heads * self.head_dim, self.out_features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.out_features,))
        wr = w.reshape(self.heads, e, self.out_features).astype(self.dtype)
        o5 = o.reshape(b, p, f, self.heads, e).astype(self.dtype)
        y = jnp.einsum("bpfhe,hec->bpfc", o5, wr)
        return y + bias.astype(self.dtype)


class VersatileAttention(nn.Module):
    """Temporal self-attention with sinusoidal PE (motion_module.py:245-336).

    Operates on (B, F, P, C) — frame axis attended, pixels stay in place
    (the reference folds pixels into batch, ``(b d) f c``).

    The per-(pixel, head) attention matrices are only F x F (<=16x16) —
    as a batched matmul that uses ~1.5% of the 128x128 MXU and was
    measured at 26% of UNet step time. On TPU the heads and frames are
    packed into ONE m = F*heads axis (= 128 for the production 8h/16f
    shape; frame-major "striped" order so the pack is a pure reshape of
    the (F, heads*e) minor dims) and attention runs as a single batched
    matmul per pixel with a constant -inf mask on the cross-head entries
    (mask[i,j] = -inf unless i%heads == j%heads): 8x the arithmetic, but
    MXU-shaped, ~10x faster end-to-end. Masked softmax over m is
    mathematically identical to per-head softmax over F (each row's
    finite entries are exactly its own head's F logits).
    """

    heads: int
    head_dim: int
    max_len: int = 32
    dtype: jnp.dtype = jnp.float32
    # time_minor: x arrives as (B, P, F, C) instead of (B, F, P, C). The
    # TPU MotionModule keeps its whole residual stream in that layout so
    # the striped (frame-major) packing makes pack/unpack pure reshapes —
    # no transpose at all — instead of moving the large P axis on every
    # pack/unpack (VERDICT r2 #1b: one relayout per MotionModule).
    time_minor: bool = False

    @nn.compact
    def __call__(self, x, video_start_index):
        if self.time_minor:
            b, p, f, c = x.shape
            pe_bc = lambda s: s[None, None, :, :]
        else:
            b, f, p, c = x.shape
            pe_bc = lambda s: s[None, :, None, :]
        pe = jnp.asarray(
            temporal_positional_encoding_table(c, self.max_len)
        )
        x = x + pe_bc(temporal_pe_slice(pe, video_start_index, f)).astype(x.dtype)
        inner = self.heads * self.head_dim
        # Packed time-minor path with INSV2V_PACK_VIA_DOT=1: emit q/k/v
        # DIRECTLY in the packed (B, P, m, e) layout by contracting with
        # the kernel reshaped (C, heads, e) — the dot's output minor dim
        # is then e, so no post-hoc (…, F, C) -> (…, m, e) lane re-tiling
        # copy is needed (that copy was ~8 ms/step in the r3 trace).
        # Param paths stay to_{q,k,v}/kernel, to_out/{kernel,bias}.
        via_dot = (_PACK_VIA_DOT and self.time_minor
                   and _packed_temporal_attention())
        if via_dot:
            mk_in = lambda nm: _PackedProjIn(self.heads, self.head_dim,
                                             dtype=self.dtype, name=nm)
            q = mk_in("to_q")(x)
            k = mk_in("to_k")(x)
            v = mk_in("to_v")(x)
            if "motion_mix" in _ABLATE:  # profiling only
                return _PackedProjOut(self.heads, self.head_dim, c,
                                      dtype=self.dtype, name="to_out")(v, f)
        else:
            q = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name="to_q")(x)
            k = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name="to_k")(x)
            v = nn.Dense(inner, use_bias=False, dtype=self.dtype,
                         name="to_v")(x)
            if "motion_mix" in _ABLATE:  # profiling only: keep projections,
                o = v                    # skip the F x F attention einsums
                return nn.Dense(c, dtype=self.dtype, name="to_out")(o)
        scale = jnp.float32(self.head_dim ** -0.5)
        if _packed_temporal_attention():
            # NOTE: expressing the same math as a 6D dot_general with the
            # (h, f) packing left as two free dims (no explicit pre/post
            # transposes) measured 80% SLOWER end-to-end — XLA fragments
            # the two-free-dim contraction back into small matmuls. The
            # explicit transpose + merged m axis below is the fast form.
            m = self.heads * f
            # STRIPED (frame-major) packing: m = f*heads + h. The (f, heads)
            # minor dims are split/merged in place, so on the time-minor
            # stream pack/unpack are pure reshapes (XLA bitcasts) — the
            # r2 H-major packing's (f,heads) transposes were ~13 ms/step
            # of pure copies in the r3 device trace. The mask rows select
            # the same F finite entries either way (same-head columns), so
            # the masked softmax is mathematically unchanged.
            if via_dot:
                pack = lambda t: t  # already (b, p, m, e) from the dot
            elif self.time_minor:
                pack = lambda t: t.reshape(b, p, m, self.head_dim)
            else:
                pack = lambda t: t.reshape(b, f, p, self.heads, self.head_dim
                                           ).transpose(0, 2, 1, 3, 4
                                           ).reshape(b, p, m, self.head_dim)
            qh, kh, vh = pack(q), pack(k), pack(v)
            # Fused Pallas kernel on TPU for the production m=128 packing:
            # qk^T + masked softmax + pv in one kernel, so the (B, P, m, m)
            # logits — the temporal region's largest HBM tensor (302
            # MB/layer f32 at the production shape) — never leave VMEM.
            # Elsewhere (CPU goldens, odd m) the XLA batched-matmul form
            # with bf16-on-TPU logits storage (PERF.md r3). Same math; the
            # kernel's softmax is exact f32 (no bf16 logits quantization).
            from insv2v_tpu.ops.attention import dispatch_packed_temporal

            o = dispatch_packed_temporal(
                qh, kh, vh, self.heads, float(self.head_dim) ** -0.5
            ).astype(x.dtype)
            if via_dot:  # contract (h, e) jointly straight back to C
                return _PackedProjOut(self.heads, self.head_dim, c,
                                      dtype=self.dtype, name="to_out")(o, f)
            if self.time_minor:  # striped: (m, e) -> (f, heads*e) in place
                o = o.reshape(b, p, f, inner)
            else:
                o = o.reshape(b, p, f, self.heads, self.head_dim
                              ).transpose(0, 2, 1, 3, 4).reshape(b, f, p, inner)
        else:
            if self.time_minor:
                split = lambda t: t.reshape(b, p, f, self.heads, self.head_dim)
                qh, kh, vh = split(q), split(k), split(v)
                logits = jnp.einsum("bpfhe,bpghe->bphfg", qh, kh,
                                    preferred_element_type=jnp.float32)
                logits = logits * scale
                probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
                o = jnp.einsum("bphfg,bpghe->bpfhe", probs, vh,
                               preferred_element_type=jnp.float32).astype(x.dtype)
                o = o.reshape(b, p, f, inner)
            else:
                split = lambda t: t.reshape(b, f, p, self.heads, self.head_dim)
                qh, kh, vh = split(q), split(k), split(v)
                logits = jnp.einsum("bfphe,bgphe->bphfg", qh, kh,
                                    preferred_element_type=jnp.float32)
                logits = logits * scale
                probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
                o = jnp.einsum("bphfg,bgphe->bfphe", probs, vh,
                               preferred_element_type=jnp.float32).astype(x.dtype)
                o = o.reshape(b, f, p, inner)
        return nn.Dense(c, dtype=self.dtype, name="to_out")(o)


class TemporalTransformerBlock(nn.Module):
    """2x (LN + temporal self-attn) + LN + FF (motion_module.py:155-217)."""

    heads: int
    head_dim: int
    attention_block_types: Tuple[str, ...]
    max_len: int
    dtype: jnp.dtype = jnp.float32
    time_minor: bool = False  # see VersatileAttention: stream is (B,P,F,C)

    @nn.compact
    def __call__(self, x, video_start_index):
        for i, block_type in enumerate(self.attention_block_types):
            assert block_type == "Temporal_Self", block_type
            if "motion_attn" in _ABLATE:  # profiling only
                continue
            h = LayerNorm(name=f"norms_{i}")(x)
            x = x + VersatileAttention(
                self.heads, self.head_dim, max_len=self.max_len,
                dtype=self.dtype, time_minor=self.time_minor,
                name=f"attention_blocks_{i}",
            )(h, video_start_index)
        return _ff_residual_block(self, x, "ff_norm", "motion_ff")


class MotionModule(nn.Module):
    """VanillaTemporalModule + TemporalTransformer3DModel flattened
    (motion_module.py:42-152). x: (B, F, H, W, C)."""

    heads: int
    num_transformer_block: int
    attention_block_types: Tuple[str, ...]
    max_len: int
    num_groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, video_start_index):
        b, f, h, w, c = x.shape
        residual = x
        head_dim = c // self.heads
        # per-frame GN stats (motion_module.py:131-136), eps 1e-6
        xf = x.reshape(b * f, h, w, c)
        xf = GroupNorm(self.num_groups, eps=1e-6, name="norm")(xf)
        seq = xf.reshape(b, f, h * w, c)
        seq = nn.Dense(c, dtype=self.dtype, name="proj_in")(seq)
        # On the packed-TPU path the residual stream lives in (B, P, F, C)
        # across ALL transformer blocks: ONE big (f,p) relayout in and one
        # out per MotionModule, with only cheap local (f,heads) transposes
        # inside each attention, instead of moving the P axis 8x per block
        # (LN/Dense/FF are last-axis ops — layout-agnostic, same params).
        tm = _packed_temporal_attention() and _TIME_MINOR
        if tm:
            seq = seq.transpose(0, 2, 1, 3)  # (B, P, F, C)
        for i in range(self.num_transformer_block):
            seq = TemporalTransformerBlock(
                self.heads, head_dim, self.attention_block_types, self.max_len,
                dtype=self.dtype, time_minor=tm,
                name=f"transformer_blocks_{i}",
            )(seq, video_start_index)
        if tm:
            seq = seq.transpose(0, 2, 1, 3)  # back to (B, F, P, C)
        seq = nn.Dense(c, dtype=self.dtype, name="proj_out",
                       kernel_init=nn.initializers.zeros)(seq)
        return seq.reshape(b, f, h, w, c) + residual


# INSV2V_SPLIT_SKIP (r5 copy-class experiment, PERF.md r5): consume the
# up-block skip WITHOUT materializing concat([x, skip], -1). The concat
# only feeds norm1 -> conv1 and conv_shortcut; GN statistics compose from
# per-part moments (ops/norms.py group_norm_split_pair) and a conv on a
# channel-concat equals the sum of convs with the kernel channel-sliced,
# so the assembly copies the concat buffer costs can be skipped entirely.
# Identical math and param tree; default ON for single-edit batches
# (measured -0.4 s/edit e2e). Gated to traced batch <= MAX_B because at
# batch 6 (two prompt-batched edits x 3-way CFG) the re-scheduled program
# pushed the motion-FF Pallas kernel's scoped-vmem accounting 752 KB over
# the 16 MB limit (compile failure, PERF.md r5) — larger batches keep the
# proven concat path.
_SPLIT_SKIP = _os.environ.get("INSV2V_SPLIT_SKIP", "1") == "1"
_SPLIT_SKIP_MAX_B = int(_os.environ.get("INSV2V_SPLIT_SKIP_MAX_B", "3"))


class _ConvParams(nn.Module):
    """Param-only nn.Conv; same tree/init as ``nn.Conv(features,
    kernel_size, name=...)`` so the converter and state dicts see no
    difference between the split and concat skip paths."""

    kernel_size: Tuple[int, int]
    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        shape = tuple(self.kernel_size) + (self.in_features, self.features)
        return (self.param("kernel", nn.initializers.lecun_normal(), shape),
                self.param("bias", nn.initializers.zeros, (self.features,)))


def _conv2d_bf(x, kernel, bias, dtype, padding):
    """(B, F, H, W, C) conv with (B, F) as joint batch — the same lowering
    nn.Conv produces for the 5D stream (one NHWC conv, no frame loop)."""
    b, f, h, w, c = x.shape
    y = jax.lax.conv_general_dilated(
        x.reshape(b * f, h, w, c).astype(dtype), kernel.astype(dtype),
        (1, 1), ((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + bias.astype(dtype)
    return y.reshape(b, f, y.shape[1], y.shape[2], y.shape[3])


class ResnetBlock3D(nn.Module):
    """resnet.py:110-204: GN(5D, across frames) -> SiLU -> conv -> +temb ->
    GN -> SiLU -> conv, with 1x1 shortcut on channel change.

    ``skip`` (up-block residual) is concatenated on the channel axis —
    or, under INSV2V_SPLIT_SKIP, consumed via the split path above."""

    out_channels: int
    num_groups: int = 32
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    split_skip: Optional[bool] = None  # None -> INSV2V_SPLIT_SKIP default

    @nn.compact
    def __call__(self, x, temb, skip=None):
        enabled = _SPLIT_SKIP if self.split_skip is None else self.split_skip
        split = (skip is not None and enabled
                 and x.shape[0] <= _SPLIT_SKIP_MAX_B
                 and "norms" not in _ABLATE)
        if skip is not None and not split:
            x = jnp.concatenate([x, skip], axis=-1)
            skip = None
        if split:
            return self._split_forward(x, temb, skip)
        h = GroupNorm(self.num_groups, eps=self.eps, name="norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
            jax.nn.silu(temb))
        h = h + t[:, None, None, None, :]
        h = GroupNorm(self.num_groups, eps=self.eps, name="norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h

    def _split_forward(self, x, temb, skip):
        """The INSV2V_SPLIT_SKIP path: same math and param tree as the
        concat path, with conv1/conv_shortcut kernels channel-sliced and
        norm1 computed from combined per-part moments."""
        c1 = x.shape[-1]
        ct = c1 + skip.shape[-1]
        assert ct != self.out_channels, "split path expects a channel change"
        scale, bias = _AffineParams(ct, name="norm1")()
        xn, sn = group_norm_split_pair(x, skip, scale, bias,
                                       min(self.num_groups, ct), self.eps)
        xn, sn = jax.nn.silu(xn), jax.nn.silu(sn)
        k1, b1 = _ConvParams((3, 3), ct, self.out_channels, name="conv1")()
        h = (_conv2d_bf(xn, k1[:, :, :c1], b1, self.dtype, 1)
             + _conv2d_bf(sn, k1[:, :, c1:], None, self.dtype, 1))
        t = nn.Dense(self.out_channels, dtype=self.dtype,
                     name="time_emb_proj")(jax.nn.silu(temb))
        h = h + t[:, None, None, None, :]
        h = GroupNorm(self.num_groups, eps=self.eps, name="norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        ks, bs = _ConvParams((1, 1), ct, self.out_channels,
                             name="conv_shortcut")()
        res = (_conv2d_bf(x, ks[:, :, :c1], bs, self.dtype, 0)
               + _conv2d_bf(skip, ks[:, :, c1:], None, self.dtype, 0))
        return res + h


class Downsample3D(nn.Module):
    """stride-2 conv, padding 1 (resnet.py:76-107)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(x.shape[-1], (3, 3), strides=2, padding=1,
                       dtype=self.dtype, name="conv")(x)


class Upsample3D(nn.Module):
    """nearest x2 spatial + conv (resnet.py:21-73)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, f, h, w, c = x.shape
        x = nearest_upsample_2x(x.reshape(b * f, h, w, c)).reshape(b, f, 2 * h, 2 * w, c)
        return nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


def _motion_kwargs(cfg: UNetConfig):
    return dict(
        heads=cfg.motion_num_attention_heads,
        num_transformer_block=cfg.motion_num_transformer_block,
        attention_block_types=cfg.motion_attention_block_types,
        max_len=cfg.motion_max_seq_length,
        num_groups=cfg.norm_num_groups,
    )


class DownBlock3D(nn.Module):
    cfg: UNetConfig
    out_channels: int
    has_cross_attention: bool
    use_motion: bool
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, video_start_index):
        cfg = self.cfg
        states = []
        for i in range(cfg.layers_per_block):
            x = ResnetBlock3D(self.out_channels, cfg.norm_num_groups, cfg.norm_eps,
                              dtype=self.dtype, name=f"resnets_{i}")(x, temb)
            if self.has_cross_attention:
                x = Transformer3DModel(
                    cfg.attention_head_dim,
                    self.out_channels // cfg.attention_head_dim,
                    cfg.norm_num_groups, dtype=self.dtype,
                    name=f"attentions_{i}",
                )(x, context)
            if self.use_motion and "motion" not in _ABLATE:
                x = MotionModule(**_motion_kwargs(cfg), dtype=self.dtype,
                                 name=f"motion_modules_{i}")(x, video_start_index)
            states.append(x)
        if self.add_downsample:
            x = Downsample3D(dtype=self.dtype, name="downsampler")(x)
            states.append(x)
        return x, states


class MidBlock3D(nn.Module):
    cfg: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, video_start_index):
        cfg = self.cfg
        ch = cfg.block_out_channels[-1]
        x = ResnetBlock3D(ch, cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype,
                          name="resnets_0")(x, temb)
        x = Transformer3DModel(
            cfg.attention_head_dim, ch // cfg.attention_head_dim,
            cfg.norm_num_groups, dtype=self.dtype, name="attentions_0",
        )(x, context)
        if cfg.use_motion_module and cfg.motion_module_mid_block:
            x = MotionModule(**_motion_kwargs(cfg), dtype=self.dtype,
                             name="motion_modules_0")(x, video_start_index)
        x = ResnetBlock3D(ch, cfg.norm_num_groups, cfg.norm_eps, dtype=self.dtype,
                          name="resnets_1")(x, temb)
        return x


class UpBlock3D(nn.Module):
    cfg: UNetConfig
    out_channels: int
    has_cross_attention: bool
    use_motion: bool
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, context, video_start_index):
        """skips: tuple of (layers_per_block + 1) residuals, consumed from
        the end (the down path's reversed order)."""
        cfg = self.cfg
        skips = list(skips)
        for i in range(cfg.layers_per_block + 1):
            x = ResnetBlock3D(self.out_channels, cfg.norm_num_groups, cfg.norm_eps,
                              dtype=self.dtype, split_skip=cfg.split_skip,
                              name=f"resnets_{i}")(
                x, temb, skip=skips.pop())
            if self.has_cross_attention:
                x = Transformer3DModel(
                    cfg.attention_head_dim,
                    self.out_channels // cfg.attention_head_dim,
                    cfg.norm_num_groups, dtype=self.dtype,
                    name=f"attentions_{i}",
                )(x, context)
            if self.use_motion and "motion" not in _ABLATE:
                x = MotionModule(**_motion_kwargs(cfg), dtype=self.dtype,
                                 name=f"motion_modules_{i}")(x, video_start_index)
        if self.add_upsample:
            x = Upsample3D(dtype=self.dtype, name="upsampler")(x)
        return x


# INSV2V_SP_AXIS (sequence parallel, beyond-parity — SURVEY §2.2 lists
# frame-axis sharding as optional headroom): name of a mesh axis to shard
# the FRAME dim of the (B, F, H, W, C) activation stream over. With the
# constraint pinned at conv_in and after every down/mid/up block, GSPMD
# keeps the frame-local ops (convs, spatial attention — frames fold into
# batch) fully local and inserts exactly the collectives the
# frame-coupled ops need: all-gathers around the temporal attention's
# F-axis contraction and psums for the across-frame GroupNorm stats
# (ResnetBlock3D). Callers enter `jax.set_mesh(mesh)` with the axis
# present; without an ambient mesh the constraint is skipped. Default
# off; single-video multi-chip latency is the use case (the per-chip
# bench saturates at the CFG triple, PERF.md r3).
_SP_AXIS = _os.environ.get("INSV2V_SP_AXIS", "")


def _sp_constrain(x):
    if not _SP_AXIS:
        return x
    from jax.sharding import PartitionSpec as _P

    try:
        return jax.lax.with_sharding_constraint(
            x, _P(None, _SP_AXIS, None, None, None))
    except Exception:  # no ambient mesh / axis absent: advisory only
        return x


@register("UNet3DConditionModel")
class UNet3DConditionModel(nn.Module):
    """Forward (unet.py:296-434): sample (B,F,H,W,C_in), timesteps (B,),
    encoder_hidden_states (B,L,D_text), traced video_start_index -> eps
    (B,F,H,W,C_out)."""

    cfg: UNetConfig = UNetConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 video_start_index=0):
        cfg = self.cfg
        if jnp.ndim(timesteps) == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        t_emb = timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(self.dtype)
        temb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype,
                                 name="time_embedding")(t_emb)

        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(sample)
        x = _sp_constrain(x)

        down_cls = nn.remat(DownBlock3D) if cfg.remat else DownBlock3D
        mid_cls = nn.remat(MidBlock3D) if cfg.remat else MidBlock3D
        up_cls = nn.remat(UpBlock3D) if cfg.remat else UpBlock3D

        skips = [x]
        out_ch = cfg.block_out_channels[0]
        for i, block_type in enumerate(cfg.down_block_types):
            res = 2 ** i
            out_ch = cfg.block_out_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            x, states = down_cls(
                cfg, out_ch,
                has_cross_attention=(block_type == "CrossAttnDownBlock3D"),
                use_motion=cfg.use_motion_module and res in cfg.motion_module_resolutions,
                add_downsample=not is_final,
                dtype=self.dtype, name=f"down_blocks_{i}",
            )(x, temb, encoder_hidden_states, video_start_index)
            x = _sp_constrain(x)
            skips.extend(states)

        x = mid_cls(cfg, dtype=self.dtype, name="mid_block")(
            x, temb, encoder_hidden_states, video_start_index)
        x = _sp_constrain(x)

        rev_channels = list(reversed(cfg.block_out_channels))
        n_res = cfg.layers_per_block + 1
        for i, block_type in enumerate(cfg.up_block_types):
            res = 2 ** (len(cfg.up_block_types) - 1 - i)
            out_ch = rev_channels[i]
            is_final = i == len(cfg.up_block_types) - 1
            block_skips = tuple(skips[-n_res:])
            del skips[-n_res:]
            x = up_cls(
                cfg, out_ch,
                has_cross_attention=(block_type == "CrossAttnUpBlock3D"),
                use_motion=cfg.use_motion_module and res in cfg.motion_module_resolutions,
                add_upsample=not is_final,
                dtype=self.dtype, name=f"up_blocks_{i}",
            )(x, block_skips, temb, encoder_hidden_states, video_start_index)
            x = _sp_constrain(x)

        x = GroupNorm(cfg.norm_num_groups, eps=cfg.norm_eps, name="conv_norm_out")(x)
        x = jax.nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(x)
