"""Prompt-to-prompt video sampler for synthetic data generation.

The functional counterpart of ``InferenceDAMO_PTP_v2``
(pl_trainer/inference/inference_damo.py:159-307): denoises an (old, new)
latent pair in three phases —

  phase 1 (step < sa_end * S): joint 4-way batch
      [old, new, old, new] x contexts [uncond, uncond, old, new]
      with self-attention-map sharing (new branches reuse old branches'
      attention logits — our UNetSD takes this as the ``sa_share`` flag
      instead of module mutation);
  phase 2 (sa_end <= step < ca_end): separate passes — old with the old
      context, new with the token-aligned (key, value) tuple context;
  phase 3: plain new context.

All three phases are ``lax.scan`` segments with static boundaries, so the
whole generation jits once per shape.

``sample_ptp_pair_v1`` is the staged v1 variant (``InferenceDAMO_PTP``,
pl_trainer/inference/inference_damo.py:52-157): no attention-map sharing —
during phase 1 only the *old* branch is denoised and the new branch copies
it verbatim (inference_damo.py:131-132), so the pair stays bit-identical
until ``sa_end``; phases 2/3 are identical to v2's separate passes.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from insv2v_tpu.diffusion.schedules import SamplerTables, sampler_step

__all__ = ["sample_ptp_pair", "sample_ptp_pair_v1", "frac_phase_steps"]


def frac_phase_steps(frac: float, num_steps: int) -> int:
    """Number of steps in a phase ending at fraction ``frac`` — the
    reference's semantics (inference_damo.py: phase 1 runs while
    ``i < frac * num_ddim_steps``), i.e. the fractional step is INCLUDED:
    sa_end=0.35 at 30 steps gives 11 steps, not the 10 of
    ``int(frac*steps)``. Implemented as the literal comparison count so
    float dust resolves exactly like the reference's ``<``."""
    return sum(1 for i in range(num_steps) if i < frac * num_steps)


def _sample_ptp(
    unet_apply: Callable,
    params: Any,
    tables: SamplerTables,
    latent: jnp.ndarray,
    context_new: jnp.ndarray,
    context_old: jnp.ndarray,
    context_kv: Tuple[jnp.ndarray, jnp.ndarray],
    uncond_context: jnp.ndarray,
    rng: jax.Array,
    guidance_scale: float,
    sa_end_time: float,
    ca_end_time: float,
    sa_steps: Optional[int],
    ca_steps: Optional[int],
    joint_phase1: bool,
) -> dict:
    s = tables.num_steps
    sa_end = frac_phase_steps(sa_end_time, s) if sa_steps is None else int(sa_steps)
    ca_end = frac_phase_steps(ca_end_time, s) if ca_steps is None else int(ca_steps)
    assert sa_end < ca_end <= s, (sa_end, ca_end, s)
    gs = jnp.float32(guidance_scale)

    def cfg(e_uncond, e_cond):
        return e_uncond + gs * (e_cond - e_uncond)

    def step_pair(old, new, eps_old, eps_new, i, key):
        n_old = jax.random.normal(key, old.shape, dtype=jnp.float32)
        n_new = jax.random.normal(jax.random.fold_in(key, 1), new.shape,
                                  dtype=jnp.float32)
        old, x0_old = sampler_step(tables, old, eps_old, i, n_old)
        new, x0_new = sampler_step(tables, new, eps_new, i, n_new)
        return old, new, x0_old, x0_new

    def phase1_step_joint(carry, i):
        # v2: 4-way joint batch with self-attention-map sharing.
        old, new, key = carry
        key, sub = jax.random.split(key)
        t = tables.timesteps[i]
        x4 = jnp.concatenate([old, new, old, new], axis=0)
        ctx4 = jnp.concatenate(
            [uncond_context, uncond_context, context_old, context_new], axis=0)
        eps4 = unet_apply(params, x4, t, ctx4, True).astype(jnp.float32)
        eu_old, eu_new, ec_old, ec_new = jnp.split(eps4, 4, axis=0)
        old, new, x0o, x0n = step_pair(
            old, new, cfg(eu_old, ec_old), cfg(eu_new, ec_new), i, sub)
        return (old, new, key), (x0o, x0n)

    def phase1_step_copy(carry, i):
        # v1: only the old branch is denoised; the new branch copies it
        # verbatim (inference_damo.py:130-132) so the pair is identical
        # until sa_end. No attention surgery.
        old, _new, key = carry
        key, sub = jax.random.split(key)
        t = tables.timesteps[i]
        x2 = jnp.concatenate([old, old], axis=0)
        ctx2 = jnp.concatenate([uncond_context, context_old], axis=0)
        e2 = unet_apply(params, x2, t, ctx2, False).astype(jnp.float32)
        eps_old = cfg(*jnp.split(e2, 2, axis=0))
        n_old = jax.random.normal(sub, old.shape, dtype=jnp.float32)
        old, x0o = sampler_step(tables, old, eps_old, i, n_old)
        return (old, old, key), (x0o, x0o)

    phase1_step = phase1_step_joint if joint_phase1 else phase1_step_copy

    def make_phase23_step(new_ctx_is_kv: bool):
        def phase_step(carry, i):
            old, new, key = carry
            key, sub = jax.random.split(key)
            t = tables.timesteps[i]
            # old branch: plain CFG with the old context
            x2 = jnp.concatenate([old, old], axis=0)
            ctx2 = jnp.concatenate([uncond_context, context_old], axis=0)
            e2 = unet_apply(params, x2, t, ctx2, False).astype(jnp.float32)
            eps_old = cfg(*jnp.split(e2, 2, axis=0))
            # new branch
            x2n = jnp.concatenate([new, new], axis=0)
            if new_ctx_is_kv:
                key_ctx = jnp.concatenate([uncond_context, context_kv[0]], axis=0)
                val_ctx = jnp.concatenate([uncond_context, context_kv[1]], axis=0)
                e2n = unet_apply(params, x2n, t, (key_ctx, val_ctx), False)
            else:
                ctx2n = jnp.concatenate([uncond_context, context_new], axis=0)
                e2n = unet_apply(params, x2n, t, ctx2n, False)
            eps_new = cfg(*jnp.split(e2n.astype(jnp.float32), 2, axis=0))
            old, new, x0o, x0n = step_pair(old, new, eps_old, eps_new, i, sub)
            return (old, new, key), (x0o, x0n)

        return phase_step

    carry = (latent.astype(jnp.float32), latent.astype(jnp.float32), rng)
    x0_old = x0_new = latent
    if sa_end > 0:
        carry, (x0_old, x0_new) = jax.lax.scan(
            phase1_step, carry, jnp.arange(0, sa_end))
    if ca_end > sa_end:
        carry, (x0_old, x0_new) = jax.lax.scan(
            make_phase23_step(True), carry, jnp.arange(sa_end, ca_end))
    if s > ca_end:
        carry, (x0_old, x0_new) = jax.lax.scan(
            make_phase23_step(False), carry, jnp.arange(ca_end, s))
    old, new, _ = carry
    return {
        "latent": new,
        "latent_old": old,
        "pred_x0": x0_new[-1],
        "pred_x0_old": x0_old[-1],
    }


def sample_ptp_pair(
    unet_apply: Callable,
    params: Any,
    tables: SamplerTables,
    latent: jnp.ndarray,
    context_new: jnp.ndarray,
    context_old: jnp.ndarray,
    context_kv: Tuple[jnp.ndarray, jnp.ndarray],
    uncond_context: jnp.ndarray,
    rng: jax.Array,
    guidance_scale: float = 9.0,
    sa_end_time: float = 0.3,
    ca_end_time: float = 0.8,
    sa_steps: Optional[int] = None,
    ca_steps: Optional[int] = None,
) -> dict:
    """unet_apply(params, x, t, context, sa_share) -> eps; latent is the
    shared initial noise (B, F, h, w, C); returns old/new final latents.

    Phase boundaries may be given directly as step counts (``sa_steps``/
    ``ca_steps``) so callers jitting with static boundaries can quantize
    continuous draws to the step grid and bound recompiles, instead of
    paying a full recompile per unique float. Fractional boundaries use
    the reference's ``i < frac * steps`` counting (fractional step
    included — :func:`frac_phase_steps`); callers passing step counts
    should quantize the same way for exact reference parity.
    """
    return _sample_ptp(
        unet_apply, params, tables, latent, context_new, context_old,
        context_kv, uncond_context, rng, guidance_scale, sa_end_time,
        ca_end_time, sa_steps, ca_steps, joint_phase1=True)


def sample_ptp_pair_v1(
    unet_apply: Callable,
    params: Any,
    tables: SamplerTables,
    latent: jnp.ndarray,
    context_new: jnp.ndarray,
    context_old: jnp.ndarray,
    context_kv: Tuple[jnp.ndarray, jnp.ndarray],
    uncond_context: jnp.ndarray,
    rng: jax.Array,
    guidance_scale: float = 9.0,
    sa_end_time: float = 0.3,
    ca_end_time: float = 0.8,
    sa_steps: Optional[int] = None,
    ca_steps: Optional[int] = None,
) -> dict:
    """Staged PTP v1 (``InferenceDAMO_PTP``, inference_damo.py:52-157):
    same API as :func:`sample_ptp_pair`, but phase 1 denoises only the old
    branch and copies it to the new branch (no attention-map sharing), so
    old/new stay identical until ``sa_end`` and diverge only afterwards.
    """
    return _sample_ptp(
        unet_apply, params, tables, latent, context_new, context_old,
        context_kv, uncond_context, rng, guidance_scale, sa_end_time,
        ca_end_time, sa_steps, ca_steps, joint_phase1=False)
