"""Validation step + image-preview callbacks for training.

The counterpart of the reference's validation_step (builds an
InferenceIP2PVideo on the fly and runs a 20-step edit,
pl_trainer/instruct_p2p_video.py:154-186) and the wandb image logger
(callbacks/instruct_p2p_video.py:9-59): here the sampler is the shared
``sample_video_window`` and previews land on disk as PNG grids next to a
jsonl metric stream (wandb-compatible records, no wandb dependency).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from insv2v_tpu.diffusion.samplers import sample_video_window
from insv2v_tpu.diffusion.schedules import make_sampler_tables
from insv2v_tpu.models.vae import AutoencoderKL


def make_validation_fn(trainer, num_steps: int = 20, text_cfg: float = 7.5,
                       img_cfg: float = 1.2):
    """Returns validate(state, batch, rng) -> dict with 'pred' video frames.

    batch: input_video / edited_video (B, F, H, W, 3), prompt_ids (B, 77).
    """
    tables = make_sampler_tables(trainer.schedule, num_steps, kind="ddim")
    unet, vae, text = trainer.unet, trainer.vae, trainer.text_encoder
    sf = trainer.cfg.scale_factor

    def unet_apply(p, sample, t, ctx, vsi):
        return unet.apply({"params": p}, sample, t, ctx, video_start_index=vsi)

    @jax.jit
    def validate(state, batch, rng):
        b, f = batch["input_video"].shape[:2]
        flat = lambda v: v.reshape((b * f,) + v.shape[2:])
        unflat = lambda v: v.reshape((b, f) + v.shape[1:])
        r_enc, r_lat, r_samp = jax.random.split(rng, 3)
        cond = unflat(vae.apply({"params": state.vae_params},
                                flat(batch["input_video"]), r_enc,
                                method=AutoencoderKL.encode))
        text_cond = text.apply({"params": state.text_params},
                               batch["prompt_ids"])
        uncond_ids = jnp.full_like(batch["prompt_ids"][:, :], 49407).at[:, 0].set(49406)
        text_uncond = text.apply({"params": state.text_params}, uncond_ids)
        latent = jax.random.normal(r_lat, cond.shape, dtype=jnp.float32)
        out = sample_video_window(
            unet_apply, state.params, tables, latent, cond, text_cond,
            text_uncond, r_samp, text_cfg=text_cfg, img_cfg=img_cfg,
            return_all=True)
        frames = vae.apply({"params": state.vae_params},
                           flat(out["latent"]) / sf,
                           method=AutoencoderKL.decode)
        # denoise trajectory strip: x0-hat of the first frame at 4 evenly
        # spaced steps (the reference pipelines expose all_pred for
        # exactly this kind of step-wise debugging, inference.py:80-85)
        n = tables.num_steps
        idx = jnp.asarray([0, n // 3, (2 * n) // 3, n - 1])
        traj_lat = out["all_pred"][idx, 0, 0]  # (4, h, w, 4)
        traj = vae.apply({"params": state.vae_params}, traj_lat / sf,
                         method=AutoencoderKL.decode)
        return {"pred": jnp.clip(unflat(frames), -1.0, 1.0),
                "trajectory": jnp.clip(traj, -1.0, 1.0)}

    return validate


def save_preview_grid(batch: Dict[str, Any], pred: np.ndarray, out_dir: str,
                      step: int, max_items: int = 1,
                      trajectory: np.ndarray | None = None) -> str:
    """input | edited | pred rows (+ an optional x0-hat denoise-trajectory
    row) as one PNG per video, like the reference wandb grids
    (callbacks/common.py:23-32)."""
    import cv2

    from insv2v_tpu.utils.media import to_uint8

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"preview_step{step:08d}.png")
    n = min(max_items, pred.shape[0])
    rows = []
    for key_frames in (batch["input_video"][:n], batch["edited_video"][:n],
                       pred[:n]):
        row = np.concatenate(list(np.asarray(key_frames[0])), axis=1)
        rows.append(row)
    if trajectory is not None:
        traj_row = np.concatenate(list(np.asarray(trajectory)), axis=1)
        width = rows[0].shape[1]
        if traj_row.shape[1] < width:  # pad to grid width
            traj_row = np.pad(traj_row,
                              ((0, 0), (0, width - traj_row.shape[1]), (0, 0)))
        rows.append(traj_row[:, :width])
    grid = to_uint8(np.concatenate(rows, axis=0))
    cv2.imwrite(path, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
    return path
