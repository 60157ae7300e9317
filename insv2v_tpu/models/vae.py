"""SD KL autoencoder (CompVis ldm backbone) as Flax modules, channels-last.

Re-implements the reference VAE — ``modules/vqvae/model.py`` Encoder
(:211-302) / Decoder (:305-411) with ResnetBlock (:77-136), AttnBlock
(:145-197), asymmetric-pad Downsample (:55-74), nearest Upsample (:35-52)
— and the ``AutoencoderKL`` wrapper with ``DiagonalGaussianDistribution``
(modules/kl_autoencoder/autoencoder.py:10-109).

TPU-native choices: NHWC layout throughout (XLA:TPU conv native layout),
f32 GroupNorm statistics, mid-block self-attention routed through the
shared ``dot_attention`` (Pallas flash on TPU for the (H/8*W/8)^2 logits).
Module names mirror the torch attribute paths so checkpoint conversion is
a mechanical key mapping.

Behavioral parity note: reference ``encode()`` returns a *sampled* latent,
not the posterior (autoencoder.py:89-95).  ``encode`` here takes an rng
and samples; pass ``sample_posterior=False`` for the deterministic mode.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from insv2v_tpu.ops.attention import dot_attention
from insv2v_tpu.ops.norms import group_norm
from insv2v_tpu.ops.resize import nearest_upsample_2x
from insv2v_tpu.utils.registry import register

SD_SCALE_FACTOR = 0.18215  # configs/instruct_v2v.yaml:33


def swish(x):
    return x * jax.nn.sigmoid(x)


class GroupNorm(nn.Module):
    """GN with torch-compatible params; stats per leading-batch element."""

    num_groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return group_norm(x, scale, bias, min(self.num_groups, c), self.eps)


class ResnetBlock(nn.Module):
    """vqvae/model.py:77-136 (temb_channels=0 path)."""

    out_channels: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or x.shape[-1]
        h = GroupNorm(name="norm1")(x)
        h = swish(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(name="norm2")(h)
        h = swish(h)
        h = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != out_ch:
            x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Full-resolution single-head self-attention (vqvae/model.py:145-197)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, hh, ww, c = x.shape
        h = GroupNorm(name="norm")(x)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(h)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(h)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(h)
        # single head over the full channel dim; seq = H*W
        q = q.reshape(n, 1, hh * ww, c)
        k = k.reshape(n, 1, hh * ww, c)
        v = v.reshape(n, 1, hh * ww, c)
        o = dot_attention(q, k, v).reshape(n, hh, ww, c)
        o = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(o)
        return x + o


class Downsample(nn.Module):
    """Asymmetric-pad stride-2 conv (vqvae/model.py:55-74)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            x.shape[-1], (3, 3), strides=2, padding="VALID", dtype=self.dtype,
            name="conv",
        )(x)


class Upsample(nn.Module):
    """Nearest x2 then conv (vqvae/model.py:35-52)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nearest_upsample_2x(x)
        return nn.Conv(x.shape[-1], (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


@dataclasses.dataclass(frozen=True)
class VaeConfig:
    """configs/instruct_v2v.yaml:89-104 (ddconfig)."""

    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = ()
    in_channels: int = 3
    out_ch: int = 3
    z_channels: int = 4
    embed_dim: int = 4
    resolution: int = 256
    double_z: bool = True


class Encoder(nn.Module):
    cfg: VaeConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = nn.Conv(cfg.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        curr_res = cfg.resolution
        for i_level, mult in enumerate(cfg.ch_mult):
            block_out = cfg.ch * mult
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock(
                    block_out, dtype=self.dtype,
                    name=f"down_{i_level}_block_{i_block}",
                )(h)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(dtype=self.dtype,
                                  name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != len(cfg.ch_mult) - 1:
                h = Downsample(dtype=self.dtype, name=f"down_{i_level}_downsample")(h)
                curr_res //= 2
        h = ResnetBlock(dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dtype=self.dtype, name="mid_block_2")(h)
        h = GroupNorm(name="norm_out")(h)
        h = swish(h)
        out_c = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return nn.Conv(out_c, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    cfg: VaeConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        num_levels = len(cfg.ch_mult)
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(dtype=self.dtype, name="mid_block_2")(h)
        for i_level in reversed(range(num_levels)):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(
                    block_out, dtype=self.dtype,
                    name=f"up_{i_level}_block_{i_block}",
                )(h)
            if i_level != 0:
                h = Upsample(dtype=self.dtype, name=f"up_{i_level}_upsample")(h)
        h = GroupNorm(name="norm_out")(h)
        h = swish(h)
        return nn.Conv(cfg.out_ch, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class DiagonalGaussian:
    """modules/kl_autoencoder/autoencoder.py:10-48 (functional form)."""

    def __init__(self, moments: jnp.ndarray):
        mean, logvar = jnp.split(moments, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(
            rng, self.mean.shape, dtype=self.mean.dtype
        )

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self) -> jnp.ndarray:
        return 0.5 * jnp.sum(
            jnp.square(self.mean) + self.var - 1.0 - self.logvar,
            axis=tuple(range(1, self.mean.ndim)),
        )


@register("AutoencoderKL")
class AutoencoderKL(nn.Module):
    """encode/decode wrapper (kl_autoencoder/autoencoder.py:50-109).

    Methods are exposed via ``nn.apply`` method= dispatch; images are
    (N, H, W, C) in [-1, 1], latents (N, H/8, W/8, embed_dim).
    """

    cfg: VaeConfig = VaeConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, dtype=self.dtype, name="encoder")
        self.decoder = Decoder(self.cfg, dtype=self.dtype, name="decoder")
        self.quant_conv = nn.Conv(
            2 * self.cfg.embed_dim, (1, 1), dtype=self.dtype, name="quant_conv"
        )
        self.post_quant_conv = nn.Conv(
            self.cfg.z_channels, (1, 1), dtype=self.dtype, name="post_quant_conv"
        )

    def moments(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.quant_conv(self.encoder(x))

    def encode(
        self,
        x: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        sample_posterior: bool = True,
    ) -> jnp.ndarray:
        post = DiagonalGaussian(self.moments(x))
        if sample_posterior:
            if rng is None:
                rng = self.make_rng("gaussian")
            return post.sample(rng)
        return post.mode()

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None, sample_posterior=True):
        z = self.encode(x, rng, sample_posterior)
        return self.decode(z)
