"""Diffusion noise-schedule math as precomputed arrays + pure step functions.

Replaces the reference's runtime scheduler objects (diffusers
``DDPMScheduler``/``DDIMScheduler`` built in pl_trainer/diffusion.py:35-54 and
pl_trainer/inference/inference.py:34-49, plus the analytic helpers in
misc_utils/model_utils.py:43-115) with a TPU-friendly formulation: every
table is a static ``jnp`` array baked into the jitted sampler, and each
reverse-process step is a pure function of ``(x_t, eps_hat, step_index,
noise)`` suitable for ``lax.scan``.

Numerics follow the diffusers conventions the reference pins:
  * ``scaled_linear`` betas: ``linspace(b0**0.5, b1**0.5, N)**2``
  * DDIM: ``set_alpha_to_one=False`` (final alpha-bar = alpha-bar[0]),
    ``steps_offset=1``, ``clip_sample=False``, ``eta=0``
  * DDPM: ``clip_sample=False``, fixed-small posterior variance
Tables are computed in float64 and stored float32.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "make_betas",
    "DiffusionSchedule",
    "SamplerTables",
    "make_sampler_tables",
    "add_noise",
    "pred_x0_from_eps",
    "pred_eps_from_x0",
    "ddim_step",
    "ddpm_step",
    "sampler_step",
]


def make_betas(
    schedule: str,
    num_timesteps: int,
    beta_start: float = 1e-4,
    beta_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedule table (float64), cf. misc_utils/model_utils.py:43-65."""
    if schedule in ("linear", "scaled_linear"):
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_timesteps, dtype=np.float64)
            ** 2
        )
    elif schedule == "cosine":
        ts = np.arange(num_timesteps + 1, dtype=np.float64) / num_timesteps + cosine_s
        alphas = np.cos(ts / (1 + cosine_s) * math.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(beta_start, beta_end, num_timesteps, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(beta_start, beta_end, num_timesteps, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule {schedule!r} unknown")
    return betas


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Forward-process tables shared by training and sampling."""

    num_train_timesteps: int
    betas: jnp.ndarray  # (T,)
    alphas_cumprod: jnp.ndarray  # (T,)
    sqrt_alphas_cumprod: jnp.ndarray  # (T,)
    sqrt_one_minus_alphas_cumprod: jnp.ndarray  # (T,)

    @classmethod
    def create(
        cls,
        beta_schedule: str = "scaled_linear",
        num_train_timesteps: int = 1000,
        beta_start: float = 0.00085,
        beta_end: float = 0.012,
        **_ignored,
    ) -> "DiffusionSchedule":
        betas = make_betas(beta_schedule, num_train_timesteps, beta_start, beta_end)
        alphas_cumprod = np.cumprod(1.0 - betas)
        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls(
            num_train_timesteps=num_train_timesteps,
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        )


def _bcast(table_at_t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a per-batch scalar table lookup over the trailing dims of x."""
    return table_at_t.reshape(table_at_t.shape + (1,) * (x.ndim - table_at_t.ndim))


def add_noise(
    schedule: DiffusionSchedule, x0: jnp.ndarray, eps: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """q(x_t | x_0): cf. DDPM.add_noise (pl_trainer/diffusion.py:56-59)."""
    a = _bcast(schedule.sqrt_alphas_cumprod[t], x0)
    s = _bcast(schedule.sqrt_one_minus_alphas_cumprod[t], x0)
    return a * x0.astype(jnp.float32) + s * eps.astype(jnp.float32)


def pred_x0_from_eps(
    schedule: DiffusionSchedule, x_t: jnp.ndarray, eps: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """x0_hat = (x_t - sqrt(1-a_t) eps) / sqrt(a_t), cf. diffusion.py:61-74."""
    a = _bcast(schedule.sqrt_alphas_cumprod[t], x_t)
    s = _bcast(schedule.sqrt_one_minus_alphas_cumprod[t], x_t)
    return (x_t.astype(jnp.float32) - s * eps.astype(jnp.float32)) / a


def pred_eps_from_x0(
    schedule: DiffusionSchedule, x_t: jnp.ndarray, x0: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Implied noise of x_t w.r.t. a known x0 — used by ref-frame anchoring
    (pl_trainer/inference/inference.py:270-277)."""
    a = _bcast(schedule.sqrt_alphas_cumprod[t], x_t)
    s = _bcast(schedule.sqrt_one_minus_alphas_cumprod[t], x_t)
    return (x_t.astype(jnp.float32) - a * x0.astype(jnp.float32)) / s


@dataclasses.dataclass(frozen=True)
class SamplerTables:
    """Per-inference-step tables for a fixed (kind, num_steps) sampler.

    Everything a reverse step needs, indexed by step position ``i`` in
    ``[0, num_steps)`` — so the denoise loop is a scan over ``i`` with no
    dynamic gather into the 1000-entry training tables.
    """

    kind: str  # 'ddim' | 'ddpm'
    num_steps: int
    timesteps: jnp.ndarray  # (S,) int32, descending
    alpha_prod: jnp.ndarray  # (S,) alpha-bar at t_i
    alpha_prod_prev: jnp.ndarray  # (S,) alpha-bar at the step's target time
    variance: jnp.ndarray  # (S,) sigma_i^2 of the reverse kernel


def make_sampler_tables(
    schedule: DiffusionSchedule,
    num_steps: int,
    kind: str = "ddim",
    eta: float = 0.0,
    steps_offset: int = 1,
) -> SamplerTables:
    ac = np.asarray(schedule.alphas_cumprod, dtype=np.float64)
    T = schedule.num_train_timesteps
    step_ratio = T // num_steps
    if kind == "ddim":
        # diffusers DDIMScheduler.set_timesteps: 'leading' spacing + offset.
        ts = (np.arange(0, num_steps) * step_ratio).round()[::-1].astype(np.int64)
        ts = ts + steps_offset
        prev_ts = ts - step_ratio
        alpha_prod = ac[ts]
        # set_alpha_to_one=False -> final alpha-bar is alphas_cumprod[0]
        alpha_prod_prev = np.where(prev_ts >= 0, ac[np.maximum(prev_ts, 0)], ac[0])
        variance = (
            (1 - alpha_prod_prev) / (1 - alpha_prod) * (1 - alpha_prod / alpha_prod_prev)
        )
        variance = (eta**2) * variance
    elif kind == "ddpm":
        ts = (np.arange(0, num_steps) * step_ratio).round()[::-1].astype(np.int64)
        prev_ts = ts - step_ratio
        alpha_prod = ac[ts]
        alpha_prod_prev = np.where(prev_ts >= 0, ac[np.maximum(prev_ts, 0)], 1.0)
        current_beta = 1 - alpha_prod / alpha_prod_prev
        variance = (1 - alpha_prod_prev) / (1 - alpha_prod) * current_beta
        variance = np.clip(variance, 1e-20, None)
        variance[ts == 0] = 0.0  # no noise on the terminal step
    else:
        raise ValueError(f"sampler kind {kind!r} unknown")
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return SamplerTables(
        kind=kind,
        num_steps=num_steps,
        timesteps=jnp.asarray(ts, dtype=jnp.int32),
        alpha_prod=f32(alpha_prod),
        alpha_prod_prev=f32(alpha_prod_prev),
        variance=f32(variance),
    )


def ddim_step(
    tables: SamplerTables,
    x_t: jnp.ndarray,
    eps: jnp.ndarray,
    i: jnp.ndarray,
    noise: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One DDIM reverse step (arXiv 2010.02502 eq. 12). Returns (x_prev, x0_hat)."""
    a_t = tables.alpha_prod[i]
    a_prev = tables.alpha_prod_prev[i]
    var = tables.variance[i]
    x_t = x_t.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    x0 = (x_t - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - var, 0.0)) * eps
    x_prev = jnp.sqrt(a_prev) * x0 + dir_xt
    if noise is not None:
        x_prev = x_prev + jnp.sqrt(var) * noise
    return x_prev, x0


def ddpm_step(
    tables: SamplerTables,
    x_t: jnp.ndarray,
    eps: jnp.ndarray,
    i: jnp.ndarray,
    noise: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One ancestral DDPM step, diffusers fixed-small variance convention."""
    a_t = tables.alpha_prod[i]
    a_prev = tables.alpha_prod_prev[i]
    var = tables.variance[i]
    beta_prod = 1.0 - a_t
    beta_prod_prev = 1.0 - a_prev
    current_alpha = a_t / a_prev
    current_beta = 1.0 - current_alpha
    x_t = x_t.astype(jnp.float32)
    eps = eps.astype(jnp.float32)
    x0 = (x_t - jnp.sqrt(beta_prod) * eps) / jnp.sqrt(a_t)
    coef_x0 = jnp.sqrt(a_prev) * current_beta / beta_prod
    coef_xt = jnp.sqrt(current_alpha) * beta_prod_prev / beta_prod
    x_prev = coef_x0 * x0 + coef_xt * x_t + jnp.sqrt(var) * noise
    return x_prev, x0


def sampler_step(
    tables: SamplerTables,
    x_t: jnp.ndarray,
    eps: jnp.ndarray,
    i: jnp.ndarray,
    noise: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Dispatch on the (static) sampler kind."""
    if tables.kind == "ddim":
        return ddim_step(tables, x_t, eps, i, noise)
    return ddpm_step(tables, x_t, eps, i, noise)
