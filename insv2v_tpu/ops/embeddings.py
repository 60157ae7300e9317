"""Sinusoidal embeddings: diffusion timesteps and temporal positions.

Covers diffusers ``Timesteps``/``get_timestep_embedding`` (used at
modules/video_unet_temporal/unet.py:95,358) and the AnimateDiff
``PositionalEncoding`` table (motion_module.py:220-242) including its
sliding-window wraparound guard.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["timestep_embedding", "temporal_positional_encoding_table", "temporal_pe_slice"]


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """diffusers get_timestep_embedding. timesteps: (B,) -> (B, dim) f32."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def temporal_positional_encoding_table(d_model: int, max_len: int = 32) -> np.ndarray:
    """The AnimateDiff PE buffer (motion_module.py:229-234): (max_len, d_model).

    pe[p, 0::2] = sin(p * w_k), pe[p, 1::2] = cos(p * w_k) with
    w_k = exp(-ln(10000) * 2k / d_model).
    """
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * (-math.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


def temporal_pe_slice(
    pe: jnp.ndarray, start_index: jnp.ndarray, num_frames: int
) -> jnp.ndarray:
    """Slice ``num_frames`` rows starting at ``start_index`` with the
    reference's wraparound guard (motion_module.py:236-241): if the window
    would overrun the table, restart the phase at ``start - max_len``.

    start_index may be a traced scalar (sliding-window scan carries it).
    """
    max_len = pe.shape[0]
    start = jnp.asarray(start_index, dtype=jnp.int32)
    start = jnp.where(start + num_frames > max_len, start - max_len, start)
    # the reference raises on negative start; we clamp (same value for all
    # in-contract inputs, defined behavior for out-of-contract ones)
    start = jnp.maximum(start, 0)
    return jax.lax.dynamic_slice_in_dim(pe, start, num_frames, axis=0)
