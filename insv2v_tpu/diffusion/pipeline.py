"""VideoEditor: the public single-video editing pipeline.

The TPU-native counterpart of the reference's notebook/gradio flow
(video_edit.ipynb cells 4-8, gradio_demo.py:28-243,
insv2v_run_loveu_tgve.py:119-161): tokenize -> CLIP encode -> chunked VAE
encode of the conditioning video -> sliding-window dual-CFG denoise chain
with ref-frame noise anchoring (optionally flow-compensated) -> VAE decode.

Everything on the hot path is jitted once per (window-shape, step-count):
window chaining reuses one compiled sampler because every follow-up window
has the same frame count with a *traced* ref-frame count and start index.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from insv2v_tpu.diffusion.samplers import sample_video_window, split_windows
from insv2v_tpu.diffusion.schedules import DiffusionSchedule, make_sampler_tables
from insv2v_tpu.models.vae import SD_SCALE_FACTOR, AutoencoderKL
from insv2v_tpu.ops.resize import warp_image


class VideoEditor:
    """Host-side orchestration around jitted device functions.

    Args:
      unet, vae, text_encoder: Flax modules.
      params: dict with 'unet', 'vae', 'text' param trees.
      tokenizer: callable(list[str]) -> (B, 77) int32 ids.
      scheduler: 'ddpm' (notebook default) or 'ddim'.
      num_steps: denoising steps (default 20, video_edit.ipynb cell 4).
    """

    def __init__(
        self,
        unet,
        vae,
        text_encoder,
        params: Dict[str, Any],
        tokenizer=None,
        scheduler: str = "ddpm",
        num_steps: int = 20,
        scale_factor: float = SD_SCALE_FACTOR,
        beta_schedule_kwargs: Optional[dict] = None,
        params_dtype: Optional[str] = "bfloat16",
    ):
        self.unet = unet
        self.vae = vae
        self.text_encoder = text_encoder
        if params_dtype is not None:
            # serve weights in bf16: halves weight HBM traffic at inference
            # (norm statistics still accumulate in f32 inside the ops)
            dt = jnp.dtype(params_dtype)
            params = jax.tree_util.tree_map(
                lambda p: p.astype(dt) if jnp.issubdtype(
                    jnp.asarray(p).dtype, jnp.floating) else p,
                params)
        self.params = params
        if tokenizer is None:
            from insv2v_tpu.text.tokenizer import get_tokenizer

            tokenizer = get_tokenizer()
        self.tokenizer = tokenizer
        self.scale_factor = scale_factor
        sched = DiffusionSchedule.create(**(beta_schedule_kwargs or {}))
        self.schedule = sched
        self.num_steps = num_steps
        self.tables = make_sampler_tables(sched, num_steps, kind=scheduler)

        self._encode_text = jax.jit(
            lambda p, ids: self.text_encoder.apply({"params": p}, ids)
        )
        self._vae_encode = jax.jit(
            lambda p, x, rng: self.vae.apply(
                {"params": p}, x, rng, method=AutoencoderKL.encode
            )
        )
        self._vae_decode = jax.jit(
            lambda p, z: self.vae.apply({"params": p}, z, method=AutoencoderKL.decode)
        )

        def unet_apply(p, sample, t, ctx, vsi):
            return self.unet.apply({"params": p}, sample, t, ctx,
                                   video_start_index=vsi)

        self._unet_apply = unet_apply
        # one compiled sampler per (flow_on,) x window shape: the first
        # (no-ref) window reuses the ref variant with num_ref=0 (exact
        # no-op correction), halving chain warmup
        self._window_ref = jax.jit(
            functools.partial(self._window_impl, with_ref=True, with_flow=False),
            static_argnames=("noise_correct_step",),
        )
        self._window_flow = jax.jit(
            functools.partial(self._window_impl, with_ref=True, with_flow=True),
            static_argnames=("noise_correct_step",),
        )
        # INSV2V_AOT_PIPELINE=1: serve the window samplers AND the
        # text/VAE executables from the AOT executable cache — a warm
        # worker start then skips tracing + lowering + compile-cache
        # load (129 s -> ~48 s start-to-first-edit for the windows
        # alone, PERF.md r4; the VAE decode was another 14.2 s outside
        # the cache until r5 — VERDICT r4 #2b). The LOVEU runner turns
        # this on for its shard workers.
        if os.environ.get("INSV2V_AOT_PIPELINE", "0") == "1":
            from insv2v_tpu.utils.aot_cache import lazy_aot

            # extra carries every closure constant that shapes the window
            # program (the AOT key cannot see them — aot_cache docstring):
            # scheduler kind + step count + beta schedule => self.tables
            sampler_cfg = (scheduler, num_steps,
                           repr(sorted((beta_schedule_kwargs or {}).items())))
            self._window_ref = lazy_aot(
                "pipe_window_ref", self._window_ref,
                static_names=("noise_correct_step",), extra=sampler_cfg)
            self._window_flow = lazy_aot(
                "pipe_window_flow", self._window_flow,
                static_names=("noise_correct_step",), extra=sampler_cfg)
            self._encode_text = lazy_aot("pipe_text", self._encode_text)
            self._vae_encode = lazy_aot("pipe_vae_enc", self._vae_encode)
            self._vae_decode = lazy_aot("pipe_vae_dec", self._vae_decode)

    # --- jitted pieces ----------------------------------------------------

    def _window_impl(
        self, unet_params, latent, img_cond, text_cond, text_uncond, rng,
        text_cfg, img_cfg, video_start_index, latent_ref=None, num_ref=0,
        flows=None, flow_masks=None, *, noise_correct_step=0.0,
        with_ref=False, with_flow=False,
    ):
        return sample_video_window(
            self._unet_apply, unet_params, self.tables, latent, img_cond,
            text_cond, text_uncond, rng,
            text_cfg=text_cfg, img_cfg=img_cfg,
            video_start_index=video_start_index,
            latent_ref=latent_ref if with_ref else None,
            num_ref_frames=num_ref,
            noise_correct_step=noise_correct_step if with_ref else 0.0,
            flows=flows if with_flow else None,
            flow_masks=flow_masks if with_flow else None,
            share_batch_noise=True,
        )["latent"]

    # --- public API -------------------------------------------------------

    def encode_text(self, prompts: List[str]) -> jnp.ndarray:
        ids = jnp.asarray(self.tokenizer(prompts))
        return self._encode_text(self.params["text"], ids)

    def encode_video(self, frames: np.ndarray, rng: jax.Array,
                     chunk: int = 16) -> jnp.ndarray:
        """frames (F, H, W, 3) in [-1,1] -> UNSCALED sampled latents
        (F, H/8, W/8, 4).  Chunked like gradio_demo.py:81; the posterior is
        sampled, matching reference encode() (kl_autoencoder:89-95)."""
        outs = []
        f = frames.shape[0]
        for i in range(0, f, chunk):
            rng, sub = jax.random.split(rng)
            outs.append(
                self._vae_encode(self.params["vae"],
                                 jnp.asarray(frames[i: i + chunk]), sub)
            )
        return jnp.concatenate(outs, axis=0)

    def decode_latents(self, latents: jnp.ndarray, chunk: int = 8) -> np.ndarray:
        """Scaled latents (F, h, w, 4) -> frames (F, H, W, 3), chunked
        (per-frame decode in the reference, instruct_p2p_video.py:66-79)."""
        outs = []
        z = latents / self.scale_factor
        for i in range(0, z.shape[0], chunk):
            outs.append(np.asarray(
                self._vae_decode(self.params["vae"], z[i: i + chunk])
            ))
        return np.clip(np.concatenate(outs, axis=0), -1.0, 1.0)

    def __call__(
        self,
        frames: np.ndarray,
        edit_prompt: Union[str, Sequence[str]],
        *,
        text_cfg: float = 7.5,
        video_cfg: float = 1.2,
        frames_per_window: int = 16,
        num_ref_frames: int = 4,
        noise_correct_step: float = 0.5,
        negative_prompt: str = "",
        use_motion_compensation: bool = False,
        flow_estimator=None,
        seed: int = 0,
    ) -> np.ndarray:
        """Edit a video. frames: (F, H, W, 3) float in [-1, 1]. Returns the
        edited frames, same shape. Mirrors video_edit.ipynb cells 6-8.

        ``edit_prompt`` may be a LIST of prompts: all edits then share one
        denoise chain with the video batch axis = len(prompts) (the VAE
        latents, initial noise and rng are shared, so prompt k of a batched
        call equals a solo call with the same seed — including the
        flow-compensated path, whose per-element ref deltas are warped
        independently; tests/test_samplers.py). This is the
        LOVEU-grid batching lever: the reference runs its 4 edit types as
        4 sequential full chains over identical img_cond
        (insv2v_run_loveu_tgve.py:83-101); on TPU one B=4 chain keeps the
        MXU fed. Returns (B, F, H, W, 3) for a list, (F, H, W, 3) for str.
        """
        prompts = [edit_prompt] if isinstance(edit_prompt, str) else list(edit_prompt)
        b = len(prompts)
        rng = jax.random.PRNGKey(seed)
        rng, enc_rng, lat_rng = jax.random.split(rng, 3)

        text_cond = self.encode_text(prompts)  # (B, 77, D)
        text_uncond = jnp.broadcast_to(
            self.encode_text([negative_prompt]), text_cond.shape)
        cond_1 = self.encode_video(frames, enc_rng)[None]  # (1, F, h, w, 4)
        cond_all = jnp.broadcast_to(cond_1, (b,) + cond_1.shape[1:])

        windows = split_windows(frames.shape[0], frames_per_window, num_ref_frames)
        h, w = cond_all.shape[2], cond_all.shape[3]
        ch = cond_all.shape[-1]

        if use_motion_compensation and flow_estimator is None:
            from insv2v_tpu.utils.flow import get_flow_estimator

            flow_estimator = get_flow_estimator()

        up = self.params["unet"]
        outs: List[jnp.ndarray] = []
        w0 = windows[0]
        # shared initial noise across the prompt batch (see docstring)
        init0 = jnp.broadcast_to(
            jax.random.normal(lat_rng, (1, w0.num_frames, h, w, ch),
                              dtype=jnp.float32),
            (b, w0.num_frames, h, w, ch))
        rng, w0_rng = jax.random.split(rng)
        # the first window reuses the ref-variant compilation with
        # num_ref=0: the anchor mask is then all-zero so the correction
        # term vanishes exactly — one compiled sampler for the whole
        # chain instead of a separate no-ref variant (warmup halves)
        latent_pred = self._window_ref(
            up, init0, cond_all[:, : w0.num_frames], text_cond, text_uncond,
            w0_rng, jnp.float32(text_cfg), jnp.float32(video_cfg),
            jnp.int32(0), jnp.zeros_like(init0), jnp.int32(0),
            noise_correct_step=noise_correct_step,
        )
        outs.append(latent_pred)
        prev_init = init0

        for spec in windows[1:]:
            rng, nrng, srng = jax.random.split(rng, 3)
            n_new = spec.num_frames - spec.num_ref
            new_noise = jnp.broadcast_to(
                jax.random.normal(nrng, (1, n_new, h, w, ch),
                                  dtype=jnp.float32),
                (b, n_new, h, w, ch))
            # ref slots carry the previous window's *initial* noise; the
            # anchor is the previous *output* (video_edit.ipynb cell 7)
            init = jnp.concatenate([prev_init[:, -spec.num_ref:], new_noise], axis=1)
            img_cond = cond_all[:, spec.start: spec.start + spec.num_frames]
            latent_ref_full = jnp.concatenate(
                [latent_pred[:, -spec.num_ref:],
                 jnp.zeros((b, n_new, h, w, ch))], axis=1)

            if use_motion_compensation:
                from insv2v_tpu.utils.flow import window_flows

                pix = frames[spec.start: spec.start + spec.num_frames]
                flows = jnp.asarray(
                    window_flows(flow_estimator, pix, spec.num_ref, (h, w)))
                ones = jnp.ones((spec.num_ref, h, w, 1))
                masks = jax.vmap(lambda fl: warp_image(ones, fl))(flows)
                latent_pred = self._window_flow(
                    up, init, img_cond, text_cond, text_uncond, srng,
                    jnp.float32(text_cfg), jnp.float32(video_cfg),
                    jnp.int32(spec.start), latent_ref_full,
                    jnp.int32(spec.num_ref), flows, masks,
                    noise_correct_step=noise_correct_step,
                )
            else:
                latent_pred = self._window_ref(
                    up, init, img_cond, text_cond, text_uncond, srng,
                    jnp.float32(text_cfg), jnp.float32(video_cfg),
                    jnp.int32(spec.start), latent_ref_full,
                    jnp.int32(spec.num_ref),
                    noise_correct_step=noise_correct_step,
                )
            outs.append(latent_pred[:, spec.num_ref:])
            prev_init = init

        edited = jnp.concatenate(outs, axis=1)  # (B, F, h, w, 4)
        bf = edited.reshape((-1,) + edited.shape[2:])
        decoded = self.decode_latents(bf)
        decoded = decoded.reshape(edited.shape[:2] + decoded.shape[1:])
        return decoded[0] if isinstance(edit_prompt, str) else decoded
