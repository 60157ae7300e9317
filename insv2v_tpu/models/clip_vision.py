"""CLIP vision transformer + projection heads, for the directional CLIP
similarity metric and the data-gen quality gate.

TPU-native replacement for the reference's openai-CLIP ViT-L/14 usage
(misc_utils/clip_similarity.py:10-47).  Mirrors HF ``CLIPModel``
semantics: image features = post-LN class token @ visual_projection;
text features = final-LN hidden at the EOT position @ text_projection.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from insv2v_tpu.models.clip_text import (
    ClipEncoderLayer,
    ClipTextConfig,
    LayerNorm,
)

# CLIP image preprocessing constants (openai CLIP `_transform`)
CLIP_IMAGE_SIZE = 224
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5

    @classmethod
    def vit_l_14(cls) -> "ClipVisionConfig":
        return cls()

    @property
    def num_positions(self) -> int:
        return (self.image_size // self.patch_size) ** 2 + 1

    def as_text_like(self) -> ClipTextConfig:
        """Reuse the text encoder-layer stack (same block structure)."""
        return ClipTextConfig(
            vocab_size=1,  # unused
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            intermediate_size=self.intermediate_size,
            layer_norm_eps=self.layer_norm_eps,
        )


class ClipVisionEncoder(nn.Module):
    """images (B, 224, 224, 3), CLIP-normalized -> pooled (B, hidden)."""

    cfg: ClipVisionConfig = ClipVisionConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b = images.shape[0]
        patches = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=cfg.patch_size,
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(images)
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls_emb = self.param(
            "class_embedding", nn.initializers.normal(0.02), (cfg.hidden_size,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_emb, (b, 1, cfg.hidden_size)), patches], axis=1
        )
        pos = nn.Embed(cfg.num_positions, cfg.hidden_size, dtype=self.dtype,
                       name="position_embedding")(jnp.arange(x.shape[1])[None])
        x = x + pos
        x = LayerNorm(cfg.layer_norm_eps, name="pre_layrnorm")(x)  # HF spelling
        layer_cfg = cfg.as_text_like()
        for i in range(cfg.num_layers):
            x = ClipEncoderLayer(layer_cfg, dtype=self.dtype,
                                 name=f"layers_{i}")(x, None)
        pooled = x[:, 0]
        return LayerNorm(cfg.layer_norm_eps, name="post_layernorm")(pooled)


class ClipVisionProjection(nn.Module):
    projection_dim: int = 768

    @nn.compact
    def __call__(self, pooled):
        return nn.Dense(self.projection_dim, use_bias=False,
                        name="visual_projection")(pooled)


class ClipTextProjection(nn.Module):
    projection_dim: int = 768

    @nn.compact
    def __call__(self, pooled):
        return nn.Dense(self.projection_dim, use_bias=False,
                        name="text_projection")(pooled)


def preprocess_frames(frames: jnp.ndarray, size: int = CLIP_IMAGE_SIZE) -> jnp.ndarray:
    """(N, H, W, 3) in [-1, 1] -> CLIP-normalized (N, size, size, 3)."""
    from insv2v_tpu.ops.resize import bilinear_resize

    x = (frames.astype(jnp.float32) + 1.0) / 2.0
    x = bilinear_resize(x, size, size)
    mean = jnp.asarray(CLIP_MEAN)
    std = jnp.asarray(CLIP_STD)
    return (x - mean) / std
