"""T5 text encoder (+ class / CLIP-T5 combo embedders) in Flax.

TPU-native re-implementations of the reference's auxiliary conditioning
encoders (modules/openclip/modules.py): ``FrozenT5Embedder`` (:58-85,
HF ``T5EncoderModel``, google/t5-v1_1-large), ``ClassEmbedder`` (:25-49)
and ``FrozenCLIPT5Encoder`` (:200-215). None of the four shipped
workloads use them (editing conditions on CLIP ViT-L only), but they are
part of the reference's public encoder surface, so they live here with
HF-torch oracle parity tests (tests/test_t5_text.py).

T5 v1.1 architecture notes (matches HF ``T5EncoderModel``):
  * RMSNorm (no mean subtraction, no bias), pre-norm residual blocks;
  * relative position bias: bucketed (32 buckets, max distance 128),
    embedded per head, computed by block 0 and shared by all blocks;
  * attention scores are NOT scaled by 1/sqrt(d_kv);
  * gated-GELU feed-forward (wi_0 ⊙ gelu, wi_1 linear, wo out), no
    biases anywhere;
  * the reference passes no attention mask (padding tokens are attended
    — modules.py:76-80), so the default here is maskless for parity.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["T5Config", "T5TextEncoder", "ClassEmbedder", "ClipT5Encoder",
           "relative_position_bucket"]


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 1024
    d_kv: int = 64
    d_ff: int = 2816
    num_layers: int = 24
    num_heads: int = 16
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_eps: float = 1e-6

    @classmethod
    def v1_1_large(cls) -> "T5Config":
        return cls()

    @classmethod
    def tiny(cls) -> "T5Config":
        return cls(vocab_size=128, d_model=16, d_kv=4, d_ff=32,
                   num_layers=2, num_heads=4)


def relative_position_bucket(relative_position: jnp.ndarray,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> jnp.ndarray:
    """Bidirectional T5 relative-position bucketing (HF t5 semantics)."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / jnp.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5LayerNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps)
        return (scale * x).astype(x.dtype)


class T5SelfAttention(nn.Module):
    cfg: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias):
        cfg = self.cfg
        inner = cfg.num_heads * cfg.d_kv
        dense = lambda name: nn.Dense(inner, use_bias=False, name=name,
                                      dtype=self.dtype)
        b, l, _ = x.shape
        split = lambda v: v.reshape(b, l, cfg.num_heads, cfg.d_kv)
        q = split(dense("q")(x))
        k = split(dense("k")(x))
        v = split(dense("v")(x))
        # T5 applies no 1/sqrt(d) scale; accumulate scores in f32
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores + position_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, inner)
        return nn.Dense(x.shape[-1], use_bias=False, name="o",
                        dtype=self.dtype)(out)


class T5Block(nn.Module):
    cfg: T5Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, position_bias):
        cfg = self.cfg
        h = T5LayerNorm(cfg.layer_norm_eps, name="ln_attn")(x)
        x = x + T5SelfAttention(cfg, self.dtype, name="attn")(h, position_bias)
        h = T5LayerNorm(cfg.layer_norm_eps, name="ln_ff")(x)
        # v1.1 gated-GELU FF (HF T5DenseGatedActDense)
        gate = nn.Dense(cfg.d_ff, use_bias=False, name="wi_0",
                        dtype=self.dtype)(h)
        lin = nn.Dense(cfg.d_ff, use_bias=False, name="wi_1",
                       dtype=self.dtype)(h)
        ff = nn.gelu(gate, approximate=True) * lin
        return x + nn.Dense(cfg.d_model, use_bias=False, name="wo",
                            dtype=self.dtype)(ff)


class T5TextEncoder(nn.Module):
    """``T5EncoderModel.last_hidden_state`` parity (modules.py:76-81)."""

    cfg: T5Config = T5Config()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        emb = nn.Embed(cfg.vocab_size, cfg.d_model, name="shared",
                       dtype=self.dtype)
        x = emb(input_ids)

        l = input_ids.shape[1]
        pos = jnp.arange(l)
        rel = pos[None, :] - pos[:, None]  # memory - query
        buckets = relative_position_bucket(
            rel, cfg.relative_attention_num_buckets,
            cfg.relative_attention_max_distance)
        bias_table = nn.Embed(cfg.relative_attention_num_buckets,
                              cfg.num_heads, name="relative_attention_bias")
        position_bias = bias_table(buckets)  # (L, L, H)
        position_bias = jnp.transpose(position_bias, (2, 0, 1))[None]

        for i in range(cfg.num_layers):
            x = T5Block(cfg, self.dtype, name=f"block_{i}")(x, position_bias)
        return T5LayerNorm(cfg.layer_norm_eps, name="final_layer_norm")(x)


class ClassEmbedder(nn.Module):
    """Class-conditioning embedder (modules.py:25-49): embeds an int class
    id for cross-attention, with unconditional-guidance dropout to the
    extra last class."""

    embed_dim: int
    n_classes: int = 1000
    ucg_rate: float = 0.1

    @nn.compact
    def __call__(self, class_ids: jnp.ndarray,
                 rng: Optional[jax.Array] = None,
                 disable_dropout: bool = False) -> jnp.ndarray:
        c = class_ids[:, None].astype(jnp.int32)
        if self.ucg_rate > 0.0 and not disable_dropout:
            if rng is None:
                raise ValueError("ucg dropout needs an rng "
                                 "(or disable_dropout=True)")
            keep = jax.random.bernoulli(rng, 1.0 - self.ucg_rate, c.shape)
            c = jnp.where(keep, c, self.n_classes - 1)
        return nn.Embed(self.n_classes, self.embed_dim, name="embedding")(c)

    def unconditional_ids(self, batch_size: int) -> jnp.ndarray:
        return jnp.full((batch_size,), self.n_classes - 1, jnp.int32)


class ClipT5Encoder:
    """FrozenCLIPT5Encoder parity (modules.py:200-215): encodes the same
    tokenized text with a CLIP text tower and a T5 encoder, returning
    ``[clip_z, t5_z]``. Pure composition over already-built apply fns."""

    def __init__(self, clip_model, clip_params, t5_model, t5_params):
        self.clip_model, self.clip_params = clip_model, clip_params
        self.t5_model, self.t5_params = t5_model, t5_params

    def __call__(self, clip_ids: jnp.ndarray, t5_ids: jnp.ndarray):
        clip_z = self.clip_model.apply({"params": self.clip_params}, clip_ids)
        t5_z = self.t5_model.apply({"params": self.t5_params}, t5_ids)
        return [clip_z, t5_z]
