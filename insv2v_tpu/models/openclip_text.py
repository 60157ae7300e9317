"""OpenCLIP text transformer (ViT-H/14 tower, penultimate layer) in Flax.

The conditioning encoder for the ModelScope T2V data-generation pipeline —
reference ``FrozenOpenCLIPEmbedder`` (modules/openclip/modules.py:138-197,
duplicated at modules/damo_text_to_video/text_model.py): laion2b ViT-H-14
text tower run to the PENULTIMATE block, then ln_final; returns the full
(B, 77, 1024) hidden sequence.

Differences from HF CLIP text (models/clip_text.py): GELU (not
quick_gelu), pre-LN blocks with packed-qkv MultiheadAttention params
(converter splits ``in_proj_weight`` -> q/k/v), positional embedding as a
bare parameter.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from insv2v_tpu.ops.attention import attention
from insv2v_tpu.ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class OpenClipTextConfig:
    vocab_size: int = 49408
    width: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    mlp_ratio: int = 4
    max_positions: int = 77
    penultimate: bool = True  # run num_layers-1 blocks (layer='penultimate')

    @classmethod
    def vit_h_14(cls) -> "OpenClipTextConfig":
        return cls()


class LayerNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return layer_norm(x, scale, bias, self.eps)


class PackedSelfAttention(nn.Module):
    """torch nn.MultiheadAttention equivalent (q/k/v from a packed proj)."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        d = x.shape[-1]
        hd = d // self.num_heads
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        b, s, _ = x.shape
        split = lambda t: t.reshape(b, s, self.num_heads, hd).transpose(0, 2, 1, 3)
        o = attention(split(q), split(k), split(v), bias=mask)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(o)


class ResidualBlock(nn.Module):
    cfg: OpenClipTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        x = x + PackedSelfAttention(self.cfg.num_heads, dtype=self.dtype,
                                    name="attn")(LayerNorm(name="ln_1")(x), mask)
        h = LayerNorm(name="ln_2")(x)
        h = nn.Dense(self.cfg.width * self.cfg.mlp_ratio, dtype=self.dtype,
                     name="c_fc")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.cfg.width, dtype=self.dtype, name="c_proj")(h)
        return x + h


class OpenClipTextEncoder(nn.Module):
    """ids (B, 77) -> penultimate hidden states after ln_final (B, 77, W)."""

    cfg: OpenClipTextConfig = OpenClipTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        _, s = input_ids.shape
        x = nn.Embed(cfg.vocab_size, cfg.width, dtype=self.dtype,
                     name="token_embedding")(input_ids)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.01),
                         (cfg.max_positions, cfg.width))
        x = x + pos[None, :s].astype(x.dtype)
        mask = jnp.triu(jnp.full((s, s), -jnp.inf, dtype=jnp.float32), k=1)
        mask = mask[None, None]
        n_blocks = cfg.num_layers - (1 if cfg.penultimate else 0)
        for i in range(n_blocks):
            x = ResidualBlock(cfg, dtype=self.dtype, name=f"resblocks_{i}")(x, mask)
        return LayerNorm(name="ln_final")(x)
