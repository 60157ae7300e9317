"""CLIP text transformer (ViT-L/14 text tower) in Flax.

TPU-native replacement for the reference's ``FrozenCLIPEmbedder`` wrapper
around HF ``CLIPTextModel`` (modules/openclip/modules.py:88-135): the
editing model conditions on the **last hidden state** over all 77
positions (padding included, causal attention), layer="last".

Param tree matches ``convert_clip_text_state_dict`` output:
``token_embedding, position_embedding, layers_{i}/{self_attn/{q,k,v,out}_proj,
layer_norm1, layer_norm2, mlp/{fc1,fc2}}, final_layer_norm``.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from insv2v_tpu.ops.attention import attention
from insv2v_tpu.ops.norms import layer_norm
from insv2v_tpu.utils.registry import register


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_positions: int = 77
    layer_norm_eps: float = 1e-5

    @classmethod
    def vit_l_14(cls) -> "ClipTextConfig":
        return cls()


class LayerNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return layer_norm(x, scale, bias, self.eps)


class ClipAttention(nn.Module):
    cfg: ClipTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.cfg
        d = cfg.hidden_size
        hd = d // cfg.num_heads
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        b, s, _ = x.shape
        split = lambda t: t.reshape(b, s, cfg.num_heads, hd).transpose(0, 2, 1, 3)
        o = attention(split(q), split(k), split(v), bias=mask)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(o)


class ClipMlp(nn.Module):
    cfg: ClipTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.cfg.intermediate_size, dtype=self.dtype, name="fc1")(x)
        x = quick_gelu(x)
        return nn.Dense(self.cfg.hidden_size, dtype=self.dtype, name="fc2")(x)


class ClipEncoderLayer(nn.Module):
    cfg: ClipTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h = LayerNorm(self.cfg.layer_norm_eps, name="layer_norm1")(x)
        x = x + ClipAttention(self.cfg, dtype=self.dtype, name="self_attn")(h, mask)
        h = LayerNorm(self.cfg.layer_norm_eps, name="layer_norm2")(x)
        return x + ClipMlp(self.cfg, dtype=self.dtype, name="mlp")(h)


@register("FrozenCLIPEmbedder")
class ClipTextEncoder(nn.Module):
    """input_ids (B, S<=77) int32 -> last_hidden_state (B, S, hidden)."""

    cfg: ClipTextConfig = ClipTextConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        _, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = nn.Embed(cfg.max_positions, cfg.hidden_size, dtype=self.dtype,
                       name="position_embedding")(jnp.arange(s)[None, :])
        x = tok + pos
        # causal mask, additive -inf above the diagonal (HF convention; the
        # pad positions stay attended from later positions, matching the
        # reference which feeds padded length-77 sequences)
        mask = jnp.triu(jnp.full((s, s), -jnp.inf, dtype=jnp.float32), k=1)
        mask = mask[None, None, :, :]
        for i in range(cfg.num_layers):
            x = ClipEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x, mask)
        return LayerNorm(cfg.layer_norm_eps, name="final_layer_norm")(x)
