"""Dual-CFG video-editing samplers as jit-once ``lax.scan`` loops.

Replaces the reference's Python-loop pipelines (pl_trainer/inference/
inference.py): ``InferenceIP2PVideo.__call__`` (:163-218),
``second_clip_forward`` ref-frame noise anchoring (:220-289) and the
optical-flow variant (:291-398) — re-expressed so that:

  * the 3-way CFG batch (uncond / img-cond / img+text-cond) is built and
    run as ONE fused UNet call per step (same algorithm, inference.py:183-194);
  * the 20-step denoise loop is a ``lax.scan`` carrying ``(latent, rng)``
    — no host round-trips per step;
  * ref-frame noise correction uses a static frame mask with a traced
    ``num_ref_frames``, so every window of a long video runs through the
    same compiled function;
  * flow-compensated stitching precomputes per-window flow fields and
    validity masks once (they are step-invariant) and warps only the
    per-step delta inside the scan.

All latents are (B, F, h, w, C) channels-last.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, List, Optional

import jax
import jax.numpy as jnp

from insv2v_tpu.diffusion.schedules import SamplerTables, sampler_step
from insv2v_tpu.ops.resize import warp_image

__all__ = [
    "rescale_noise_cfg",
    "dual_cfg_eps",
    "sample_video_window",
    "sample_plain",
    "sample_edit_ref_image",
    "split_windows",
    "WindowSpec",
]

UnetApply = Callable[..., jnp.ndarray]
# unet_apply(params, sample_bfhwc, t_b, context_bld, video_start_index) -> eps


def rescale_noise_cfg(noise_cfg: jnp.ndarray, noise_pred_text: jnp.ndarray,
                      guidance_rescale: float) -> jnp.ndarray:
    """arXiv 2305.08891 §3.4 overexposure fix (inference.py:13-24)."""
    axes = tuple(range(1, noise_cfg.ndim))
    std_text = jnp.std(noise_pred_text, axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg, axis=axes, keepdims=True)
    rescaled = noise_cfg * (std_text / std_cfg)
    return guidance_rescale * rescaled + (1.0 - guidance_rescale) * noise_cfg


def dual_cfg_eps(
    unet_apply: UnetApply,
    params: Any,
    latent: jnp.ndarray,
    img_cond: jnp.ndarray,
    t: jnp.ndarray,
    text_uncond: jnp.ndarray,
    text_cond: jnp.ndarray,
    text_cfg: float,
    img_cfg: float,
    video_start_index,
    guidance_rescale: float = 0.0,
) -> jnp.ndarray:
    """One fused 3xCFG UNet call + guidance combine (inference.py:183-206).

    CFG truth table (inference.py:174-178)::

            e1(uncond) | e2(img)  | e3(img+text)
      text      x      |    x     |     v
      img       x      |    v     |     v
    """
    b = latent.shape[0]
    zeros = jnp.zeros_like(img_cond)
    lat_in = jnp.concatenate([latent, latent, latent], axis=0)
    cond_in = jnp.concatenate([zeros, img_cond, img_cond], axis=0)
    sample = jnp.concatenate([lat_in, cond_in], axis=-1)
    ctx = jnp.concatenate([text_uncond, text_uncond, text_cond], axis=0)
    t_b = jnp.broadcast_to(jnp.asarray(t), (3 * b,))
    eps3 = unet_apply(params, sample, t_b, ctx, video_start_index)
    e1, e2, e3 = jnp.split(eps3.astype(jnp.float32), 3, axis=0)
    eps = e1 + img_cfg * (e2 - e1) + text_cfg * (e3 - e2)
    if guidance_rescale > 0:
        eps = rescale_noise_cfg(eps, e1, guidance_rescale)
    return eps


def _frame_mask(num_frames: int, num_ref: jnp.ndarray) -> jnp.ndarray:
    """(F,) float mask: 1 for ref frames (index < num_ref)."""
    return (jnp.arange(num_frames) < num_ref).astype(jnp.float32)


def sample_video_window(
    unet_apply: UnetApply,
    params: Any,
    tables: SamplerTables,
    latent: jnp.ndarray,
    img_cond: jnp.ndarray,
    text_cond: jnp.ndarray,
    text_uncond: jnp.ndarray,
    rng: jax.Array,
    *,
    text_cfg: float = 7.5,
    img_cfg: float = 1.2,
    guidance_rescale: float = 0.0,
    video_start_index=0,
    latent_ref: Optional[jnp.ndarray] = None,
    num_ref_frames=0,
    noise_correct_step: float = 0.0,
    flows: Optional[jnp.ndarray] = None,
    flow_masks: Optional[jnp.ndarray] = None,
    return_all: bool = False,
    share_batch_noise: bool = False,
) -> dict:
    """Denoise one 16-frame window. First window: leave ``latent_ref=None``.

    Follow-up windows (inference.py:220-289): ``latent`` enters with its
    first ``num_ref_frames`` frames set to the previous window's outputs
    re-noised, ``latent_ref`` holds the clean previous outputs in those
    slots, and for the first ``noise_correct_step`` fraction of steps the
    implied-noise delta of the ref frames is injected into all frames —
    mean-delta without flow, flow-warped per-pixel with ``flows``
    (per-query-frame, per-ref-frame displacement fields at latent
    resolution, shape (F, R, h, w, 2)) and ``flow_masks`` (their warped
    validity, (F, R, h, w, 1), precomputed since they are step-invariant).

    ``share_batch_noise`` draws ONE per-step stochastic-sampler noise
    field and broadcasts it over the video batch axis, so element k of a
    batched call reproduces a batch-1 call with the same rng exactly
    (bit-identical for B=1; used by the prompt-batched pipeline). Leave
    False for genuinely independent videos in one batch.
    """
    num_steps = tables.num_steps
    f = latent.shape[1]
    # reference boundary is `noise_correct_step * num_ddim_steps > i`
    # (inference.py:367), i.e. correction applies while i < ceil(product)
    correct_until = math.ceil(noise_correct_step * num_steps)
    ref_mask = _frame_mask(f, num_ref_frames)[None, :, None, None, None]

    def step(carry, i):
        lat, key = carry
        key, nkey = jax.random.split(key)
        t = tables.timesteps[i]
        eps = dual_cfg_eps(
            unet_apply, params, lat, img_cond, t, text_uncond, text_cond,
            text_cfg, img_cfg, video_start_index, guidance_rescale,
        )

        if latent_ref is not None and correct_until > 0:
            a_t = tables.alpha_prod[i]
            noise_ref = (lat - jnp.sqrt(a_t) * latent_ref) * jax.lax.rsqrt(1.0 - a_t)
            delta_ref = (noise_ref - eps) * ref_mask  # zero on non-ref frames
            if flows is None:
                # mean-delta propagation (inference.py:270-277)
                n_ref = jnp.maximum(jnp.sum(ref_mask), 1.0)
                delta_mean = jnp.sum(delta_ref, axis=1, keepdims=True) / n_ref
                correction = ref_mask * delta_ref + (1.0 - ref_mask) * delta_mean
            else:
                # flow-warped propagation (inference.py:367-386). Flows are
                # per-video (one shared source video), deltas are per batch
                # element — warp each element's ref deltas independently so
                # batched prompts match their solo calls (ADVICE r3).
                r = flows.shape[1]
                d_ref = delta_ref[:, :r]  # (B, R, h, w, C) ref-frame deltas
                warped = jax.vmap(  # over batch
                    lambda db: jax.vmap(  # over query frames
                        lambda fl: warp_image(db, fl)
                    )(flows)
                )(d_ref)  # (B, F, R, h, w, C)
                mask_sum = jnp.sum(flow_masks, axis=1)  # (F, h, w, 1)
                warped_sum = jnp.sum(warped * flow_masks[None], axis=2)
                prop = jnp.where(mask_sum[None] > 0.5,
                                 warped_sum / jnp.maximum(mask_sum[None], 1e-6), 0.0)
                correction = ref_mask * delta_ref + (1.0 - ref_mask) * prop
            use = (i < correct_until).astype(jnp.float32)
            eps = eps + use * correction

        nshape = (1,) + lat.shape[1:] if share_batch_noise else lat.shape
        noise = jnp.broadcast_to(
            jax.random.normal(nkey, nshape, dtype=jnp.float32), lat.shape)
        lat_next, x0 = sampler_step(tables, lat, eps, i, noise)
        ys = (lat_next, x0) if return_all else x0
        return (lat_next, key), ys

    (final, _), ys = jax.lax.scan(
        step, (latent.astype(jnp.float32), rng), jnp.arange(num_steps)
    )
    # ``all_latent``/``all_pred`` trajectories mirror the reference pipeline
    # outputs (inference.py:80-85, 210-218): per-step post-step latents and
    # x0 predictions, stacked on a leading step axis.
    if return_all:
        all_latent, all_x0 = ys
        return {"latent": final, "pred_x0": all_x0[-1],
                "all_latent": all_latent, "all_pred": all_x0}
    return {"latent": final, "pred_x0": ys[-1]}


def sample_plain(
    unet_apply: UnetApply,
    params: Any,
    tables: SamplerTables,
    latent: jnp.ndarray,
    context: jnp.ndarray,
    uncond_context: Optional[jnp.ndarray] = None,
    null_embeddings: Optional[jnp.ndarray] = None,
    rng: Optional[jax.Array] = None,
    guidance_scale: float = 5.0,
    return_all: bool = False,
) -> dict:
    """The generic single-CFG sampler (Inference.__call__, inference.py:53-99):
    plain text-conditional denoising with optional CFG; ``null_embeddings``
    (S, B, L, D) supplies a per-step uncond embedding (null-text-inversion
    style) instead of a fixed one."""
    do_cfg = guidance_scale > 1 and (
        uncond_context is not None or null_embeddings is not None)
    if rng is None:
        rng = jax.random.PRNGKey(0)

    def step(carry, i):
        lat, key = carry
        key, nkey = jax.random.split(key)
        t = tables.timesteps[i]
        if do_cfg:
            uncond = (null_embeddings[i] if null_embeddings is not None
                      else uncond_context)
            x2 = jnp.concatenate([lat, lat], axis=0)
            ctx = jnp.concatenate([uncond, context], axis=0)
            t_b = jnp.broadcast_to(t, (x2.shape[0],))
            e_u, e_c = jnp.split(
                unet_apply(params, x2, t_b, ctx, 0).astype(jnp.float32), 2, axis=0)
            eps = e_u + guidance_scale * (e_c - e_u)
        else:
            t_b = jnp.broadcast_to(t, (lat.shape[0],))
            eps = unet_apply(params, lat, t_b, context, 0).astype(jnp.float32)
        noise = jax.random.normal(nkey, lat.shape, dtype=jnp.float32)
        lat, x0 = sampler_step(tables, lat, eps, i, noise)
        ys = (lat, x0) if return_all else x0
        return (lat, key), ys

    (final, _), ys = jax.lax.scan(
        step, (latent.astype(jnp.float32), rng), jnp.arange(tables.num_steps))
    if return_all:  # {all_latent, all_pred} parity with inference.py:80-85
        all_latent, all_x0 = ys
        return {"latent": final, "pred_x0": all_x0[-1],
                "all_latent": all_latent, "all_pred": all_x0}
    return {"latent": final, "pred_x0": ys[-1]}


def sample_edit_ref_image(
    unet_apply: UnetApply,
    params: Any,
    tables: SamplerTables,
    latent: jnp.ndarray,
    img_cond: jnp.ndarray,
    edit_cond: jnp.ndarray,
    text_cond: jnp.ndarray,
    text_uncond: jnp.ndarray,
    rng: jax.Array,
    *,
    text_cfg: float = 7.5,
    img_cfg: float = 1.2,
    edit_cfg: float = 1.2,
) -> dict:
    """Triple-lever CFG image editing with a reference edit
    (InferenceIP2PEditRef, inference.py:101-157): 4-way batch over the
    (text, edit, img) truth table, combined as
    e1 + img*(e2-e1) + edit*(e3-e2) + text*(e4-e3).

    latent/img_cond/edit_cond: (B, H, W, C) image latents (channels-last);
    the UNet input is the channel concat [latent | img | edit].
    """
    zeros = jnp.zeros_like(img_cond)

    def step(carry, i):
        lat, key = carry
        key, nkey = jax.random.split(key)
        t = tables.timesteps[i]
        l1 = jnp.concatenate([lat, zeros, zeros], axis=-1)
        l2 = jnp.concatenate([lat, img_cond, zeros], axis=-1)
        l3 = jnp.concatenate([lat, img_cond, edit_cond], axis=-1)
        x4 = jnp.concatenate([l1, l2, l3, l3], axis=0)
        ctx = jnp.concatenate(
            [text_uncond, text_uncond, text_uncond, text_cond], axis=0)
        t_b = jnp.broadcast_to(t, (x4.shape[0],))
        e1, e2, e3, e4 = jnp.split(
            unet_apply(params, x4, t_b, ctx, 0).astype(jnp.float32), 4, axis=0)
        eps = (e1 + img_cfg * (e2 - e1) + edit_cfg * (e3 - e2)
               + text_cfg * (e4 - e3))
        noise = jax.random.normal(nkey, lat.shape, dtype=jnp.float32)
        lat, x0 = sampler_step(tables, lat, eps, i, noise)
        return (lat, key), x0

    (final, _), all_x0 = jax.lax.scan(
        step, (latent.astype(jnp.float32), rng), jnp.arange(tables.num_steps))
    return {"latent": final, "pred_x0": all_x0[-1]}


@dataclasses.dataclass(frozen=True)
class WindowSpec:
    """One sliding window over the frame axis."""

    start: int  # absolute index of the window's first frame (incl. refs)
    num_frames: int  # total frames in the window
    num_ref: int  # leading frames that are refs from the previous window


def split_windows(
    total_frames: int, frames_per_window: int = 16, num_ref_frames: int = 4
) -> List[WindowSpec]:
    """The reference ``split_batch`` decomposition
    (insv2v_run_loveu_tgve.py:12-29): first window is full; later windows
    re-use the trailing frames of the previous one as refs; a short final
    remainder gets extra ref frames so every window has the same length
    (a jit-once shape) except possibly a short first window.
    """
    if total_frames <= frames_per_window:
        return [WindowSpec(0, total_frames, 0)]
    windows = [WindowSpec(0, frames_per_window, 0)]
    ptr = frames_per_window
    while ptr < total_frames:
        remaining = total_frames - ptr
        n_new = (
            remaining
            if remaining < frames_per_window
            else frames_per_window - num_ref_frames
        )
        n_ref = frames_per_window - n_new
        windows.append(WindowSpec(ptr - n_ref, frames_per_window, n_ref))
        ptr += n_new
    return windows
