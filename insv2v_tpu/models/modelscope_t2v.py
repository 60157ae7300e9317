"""ModelScope (DAMO) text-to-video UNet in Flax — the data-generation model.

Re-designs modules/damo_text_to_video/unet_sd.py (UNetSD, :25-373;
CrossAttention with prompt-to-prompt hooks, :390-460; Spatial/Temporal
Transformer, :463-643; ResBlock + TemporalConvBlock_v2, :762-885,
1046-1090) over the canonical (B, F, H, W, C) layout.

Prompt-to-prompt surgery is FUNCTIONAL here: instead of mutating module
attributes (inference_damo.py:160-164), the forward threads two explicit
arguments —
  * ``ptp_sa_share``: share self-attention maps across the 4-way
    [old,new]x[uncond,cond] batch (logits of rows 1,3 replaced by rows
    0,2 — unet_sd.py:434-447);
  * ``context`` may be a (key_ctx, value_ctx) tuple: cross-attention keys
    from the old prompt's token-aligned embeddings, values from the
    weighted new prompt (unet_sd.py:422-427).

ModelScope config (configuration.json): in 4, dim 320, context 1024,
out 4, mult (1,2,4,4), heads=dim/64 per level... head_dim 64, 2 res
blocks, attention at scales (1, 1/2, 1/4).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from insv2v_tpu.ops.attention import dot_attention_bshd
from insv2v_tpu.ops.norms import group_norm, layer_norm
from insv2v_tpu.ops.resize import nearest_upsample_2x

Context = Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]


@dataclasses.dataclass(frozen=True)
class ModelScopeConfig:
    in_dim: int = 4
    dim: int = 320
    context_dim: int = 1024
    out_dim: int = 4
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    head_dim: int = 64
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = (1.0, 0.5, 0.25)
    temporal_attention: bool = True

    @property
    def embed_dim(self) -> int:
        return self.dim * 4

    @classmethod
    def tiny(cls, **kw) -> "ModelScopeConfig":
        d = dict(in_dim=4, dim=16, context_dim=12, out_dim=4,
                 dim_mult=(1, 2), head_dim=8, num_res_blocks=1,
                 attn_scales=(1.0, 0.5))
        d.update(kw)
        return cls(**d)


def sinusoidal_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """unet_sd.py:376-387 — NOTE: [cos | sin] order (not diffusers')."""
    half = dim // 2
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class GroupNorm(nn.Module):
    num_groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, reduce_axes=None):
        c = x.shape[-1]
        # largest divisor of c not exceeding num_groups (full-size channels
        # are all multiples of 32; fixture configs need the fallback)
        g = min(self.num_groups, c)
        while c % g:
            g -= 1
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm(x, scale, bias, g, self.eps, reduce_axes=reduce_axes)


class LayerNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return layer_norm(x, scale, bias, self.eps)


class PtpCrossAttention(nn.Module):
    """unet_sd.py CrossAttention with the PTP behaviors as call args.

    x: (B_eff, S, C). For self-attention with ``sa_share=True`` the
    leading batch must factor as (4, B_eff//4): logits of group g in
    {1, 3} are replaced by group g-1's.
    """

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context: Optional[Context] = None,
                 sa_share: bool = False):
        inner = self.heads * self.head_dim
        is_self = context is None
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        if context is None:
            k_src = v_src = x
        elif isinstance(context, (tuple, list)):
            k_src, v_src = context  # (key_ctx, value_ctx) PTP phase 2
        else:
            k_src = v_src = context
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(k_src)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(v_src)
        b = q.shape[0]
        if is_self and sa_share:
            # Share attention maps: new branches (groups 1, 3) reuse old
            # branches' (0, 2) attention. Replacing the LOGITS of group g
            # with group g-1's (the reference's map surgery,
            # unet_sd.py:412-447) is exactly gathering Q and K from group
            # g-1 while keeping the branch's own V:
            #   probs_g = softmax(q_{g-1} k_{g-1}^T);  out_g = probs_g v_g
            # Expressed this way every attention backend applies — the
            # long spatial sequences take the Pallas flash kernel below
            # instead of materializing (B, h, S, S) logits.
            g4 = lambda t: t.reshape((4, b // 4) + t.shape[1:])
            idx = jnp.asarray([0, 0, 2, 2])
            q = g4(q)[idx].reshape(q.shape)
            k = g4(k)[idx].reshape(k.shape)
        # auto-dispatch: Pallas flash for long spatial sequences on TPU,
        # fused-XLA f32-softmax attention for short (77-token cross /
        # frame-axis temporal) sequences — ops/attention.py
        o = dot_attention_bshd(q, k, v, self.heads)
        return nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out")(o)


class GeGluFeedForward(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = nn.Dense(dim * 4 * 2, dtype=self.dtype, name="geglu_proj")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.gelu(gate, approximate=False)
        return nn.Dense(dim, dtype=self.dtype, name="proj_out")(h)


class MsBasicTransformerBlock(nn.Module):
    """self-attn + cross-attn + GEGLU ff (unet_sd.py:646-685)."""

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context: Optional[Context], sa_share: bool = False):
        x = x + PtpCrossAttention(self.heads, self.head_dim, dtype=self.dtype,
                                  name="attn1")(
            LayerNorm(name="norm1")(x), None, sa_share=sa_share)
        x = x + PtpCrossAttention(self.heads, self.head_dim, dtype=self.dtype,
                                  name="attn2")(
            LayerNorm(name="norm2")(x), context)
        x = x + GeGluFeedForward(dtype=self.dtype, name="ff")(
            LayerNorm(name="norm3")(x))
        return x


class MsSpatialTransformer(nn.Module):
    """use_linear=True variant (unet_sd.py:463-534); per-frame.
    x: (B, F, H, W, C); context broadcast per frame."""

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context: Optional[Context], sa_share: bool = False):
        b, f, h, w, c = x.shape
        res = x
        xf = GroupNorm(eps=1e-6, name="norm")(x.reshape(b * f, h, w, c))
        seq = xf.reshape(b * f, h * w, c)
        seq = nn.Dense(self.heads * self.head_dim, dtype=self.dtype,
                       name="proj_in")(seq)
        rep = lambda t: jnp.repeat(t, f, axis=0)
        ctx = None
        if context is not None:
            ctx = (tuple(rep(t) for t in context)
                   if isinstance(context, (tuple, list)) else rep(context))
        seq = MsBasicTransformerBlock(self.heads, self.head_dim,
                                      dtype=self.dtype,
                                      name="transformer_blocks_0")(
            seq, ctx, sa_share=sa_share)
        seq = nn.Dense(c, dtype=self.dtype, name="proj_out",
                       kernel_init=nn.initializers.zeros)(seq)
        return seq.reshape(b, f, h, w, c) + res


class MsTemporalTransformer(nn.Module):
    """only_self_att=True, conv1d-proj variant (unet_sd.py:537-643).
    Attention over the frame axis per spatial location."""

    heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, sa_share: bool = False):
        b, f, h, w, c = x.shape
        res = x
        # GN on (b c f h w): stats pool over (F, H, W) — across frames
        xn = GroupNorm(eps=1e-6, name="norm")(x)
        # proj_in is a Conv1d over the frame axis with kernel 1 == Dense
        seq = xn.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
        seq = nn.Dense(self.heads * self.head_dim, dtype=self.dtype,
                       name="proj_in")(seq)
        seq = MsBasicTransformerBlock(self.heads, self.head_dim,
                                      dtype=self.dtype,
                                      name="transformer_blocks_0")(
            seq, None, sa_share=sa_share)
        seq = nn.Dense(c, dtype=self.dtype, name="proj_out",
                       kernel_init=nn.initializers.zeros)(seq)
        seq = seq.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)
        return seq + res


class TemporalConvBlock(nn.Module):
    """4x (GN-SiLU-Conv3d(3,1,1)) residual stack, zero-init conv4
    (unet_sd.py:1046-1090). Temporal-only 3D convs == 1D convs over F."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, f, h, w, c = x.shape
        identity = x
        # (3,1,1) conv over (F,H,W) == conv over F only; fold pixels into batch
        def tconv(h_, name, zero=False):
            seq = h_.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
            kinit = nn.initializers.zeros if zero else None
            kw = dict(kernel_init=kinit) if kinit else {}
            seq = nn.Conv(c, (3,), padding=1, dtype=self.dtype, name=name, **kw)(seq)
            return seq.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)

        h1 = tconv(jax.nn.silu(GroupNorm(name="norm1")(x)), "conv1")
        h2 = tconv(jax.nn.silu(GroupNorm(name="norm2")(h1)), "conv2")
        h3 = tconv(jax.nn.silu(GroupNorm(name="norm3")(h2)), "conv3")
        h4 = tconv(jax.nn.silu(GroupNorm(name="norm4")(h3)), "conv4", zero=True)
        return identity + h4


class MsResBlock(nn.Module):
    """GN-SiLU-conv + temb add + GN-SiLU-zero-conv + skip, then the
    temporal conv stack (unet_sd.py:762-885; use_scale_shift_norm=False)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb):
        # NOTE: unlike the video UNet's ResnetBlock3D (5D GN, across
        # frames), UNetSD runs its ResBlock on (b f) c h w — PER-FRAME
        # GroupNorm statistics (unet_sd.py:300-301, 345-347)
        per_frame = (2, 3)
        h = jax.nn.silu(GroupNorm(name="in_norm")(x, reduce_axes=per_frame))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="in_conv")(h)
        e = nn.Dense(self.out_channels, dtype=self.dtype, name="emb_proj")(
            jax.nn.silu(temb))
        h = h + e[:, None, None, None, :]
        h = jax.nn.silu(GroupNorm(name="out_norm")(h, reduce_axes=per_frame))
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="out_conv", kernel_init=nn.initializers.zeros)(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="skip_connection")(x)
        h = x + h
        return TemporalConvBlock(dtype=self.dtype, name="temporal_conv")(h)


class MsDownsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(x.shape[-1], (3, 3), strides=2, padding=1,
                       dtype=self.dtype, name="op")(x)


class MsUpsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, f, h, w, c = x.shape
        x = nearest_upsample_2x(x.reshape(b * f, h, w, c)).reshape(
            b, f, 2 * h, 2 * w, c)
        return nn.Conv(c, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class UNetSD(nn.Module):
    """Forward: x (B, F, h, w, 4), t (B,), context (B, L, 1024) or a
    (key, value) tuple; optional sa_share for PTP phase 1.
    Returns eps (B, F, h, w, 4)."""

    cfg: ModelScopeConfig = ModelScopeConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t, context: Context, sa_share: bool = False):
        cfg = self.cfg
        if jnp.ndim(t) == 0:
            t = jnp.broadcast_to(t, (x.shape[0],))
        e = sinusoidal_embedding(t, cfg.dim).astype(self.dtype)
        e = nn.Dense(cfg.embed_dim, dtype=self.dtype, name="time_embed_1")(e)
        e = nn.Dense(cfg.embed_dim, dtype=self.dtype,
                     name="time_embed_2")(jax.nn.silu(e))

        heads_of = lambda ch: ch // cfg.head_dim
        enc_dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]

        def spatial(ch, name):
            return MsSpatialTransformer(heads_of(ch), cfg.head_dim,
                                        dtype=self.dtype, name=name)

        def temporal(ch, name):
            return MsTemporalTransformer(heads_of(ch), cfg.head_dim,
                                         dtype=self.dtype, name=name)

        h = nn.Conv(cfg.dim, (3, 3), padding=1, dtype=self.dtype,
                    name="init_conv")(x)
        if cfg.temporal_attention:
            h = temporal(cfg.dim, "init_temporal")(h, sa_share=sa_share)

        skips = [h]
        scale = 1.0
        blk = 0
        for i, (cin, cout) in enumerate(zip(enc_dims[:-1], enc_dims[1:])):
            for j in range(cfg.num_res_blocks):
                h = MsResBlock(cout, dtype=self.dtype,
                               name=f"down_res_{blk}")(h, e)
                if scale in cfg.attn_scales:
                    h = spatial(cout, f"down_spatial_{blk}")(
                        h, context, sa_share=sa_share)
                    if cfg.temporal_attention:
                        h = temporal(cout, f"down_temporal_{blk}")(
                            h, sa_share=sa_share)
                skips.append(h)
                blk += 1
                if i != len(cfg.dim_mult) - 1 and j == cfg.num_res_blocks - 1:
                    h = MsDownsample(dtype=self.dtype, name=f"downsample_{i}")(h)
                    skips.append(h)
                    scale /= 2.0

        ch = enc_dims[-1]
        h = MsResBlock(ch, dtype=self.dtype, name="mid_res_0")(h, e)
        h = spatial(ch, "mid_spatial")(h, context, sa_share=sa_share)
        if cfg.temporal_attention:
            h = temporal(ch, "mid_temporal")(h, sa_share=sa_share)
        h = MsResBlock(ch, dtype=self.dtype, name="mid_res_1")(h, e)

        dec_dims = [cfg.dim * u for u in (cfg.dim_mult[-1],) + tuple(cfg.dim_mult[::-1])]
        blk = 0
        for i, (cin, cout) in enumerate(zip(dec_dims[:-1], dec_dims[1:])):
            for j in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = MsResBlock(cout, dtype=self.dtype,
                               name=f"up_res_{blk}")(h, e)
                if scale in cfg.attn_scales:
                    h = spatial(cout, f"up_spatial_{blk}")(
                        h, context, sa_share=sa_share)
                    if cfg.temporal_attention:
                        h = temporal(cout, f"up_temporal_{blk}")(
                            h, sa_share=sa_share)
                if i != len(cfg.dim_mult) - 1 and j == cfg.num_res_blocks:
                    h = MsUpsample(dtype=self.dtype, name=f"upsample_{i}")(h)
                    scale *= 2.0
                blk += 1

        # head GN also runs per-frame ((b f) c h w layout, unet_sd.py:328)
        h = jax.nn.silu(GroupNorm(name="out_norm")(h, reduce_axes=(2, 3)))
        return nn.Conv(cfg.out_dim, (3, 3), padding=1, dtype=self.dtype,
                       name="out_conv", kernel_init=nn.initializers.zeros)(h)
