"""End-to-end denoise-window parity against a torch replica of the
reference's InferenceIP2PVideo loop (inference.py:163-289) running the
tiny torch-oracle UNet: same weights (via the converter), same DDIM
tables, deterministic eta=0 — catches any divergence in timestep
selection, alpha tables, CFG batch construction/combination, channel
concat order, or ref-frame noise anchoring."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from insv2v_tpu.diffusion.samplers import sample_video_window
from insv2v_tpu.diffusion.schedules import DiffusionSchedule, make_sampler_tables
from insv2v_tpu.models.unet3d import UNet3DConditionModel, UNetConfig
from insv2v_tpu.utils.convert import convert_unet3d_state_dict

from oracles.unet3d_oracle import OracleUNet3D

STEPS = 4


def torch_ddim_tables():
    betas = torch.linspace(0.00085**0.5, 0.012**0.5, 1000).double() ** 2
    ac = torch.cumprod(1 - betas, dim=0)
    ts = (np.arange(0, STEPS) * (1000 // STEPS)).astype(np.int64)[::-1] + 1
    return ac, ts


def torch_reference_loop(oracle, latent, img_cond, tc, tu, text_cfg, img_cfg,
                         latent_ref=None, num_ref=0, noise_correct=0.0,
                         start=0):
    """The reference loop semantics in torch (b f c h w layout)."""
    ac, ts = torch_ddim_tables()
    zeros = torch.zeros_like(img_cond)
    for i, t in enumerate(ts):
        l1 = torch.cat([latent, zeros], dim=2)
        l2 = torch.cat([latent, img_cond], dim=2)
        x3 = torch.cat([l1, l2, l2], dim=0)
        ctx = torch.cat([tu, tu, tc], dim=0)
        x3 = x3.permute(0, 2, 1, 3, 4)  # b f c h w -> b c f h w
        with torch.no_grad():
            eps3 = oracle(x3, torch.full((3,), int(t)), ctx, start=start)
        eps3 = eps3.permute(0, 2, 1, 3, 4)
        e1, e2, e3 = eps3.chunk(3, dim=0)
        eps = e1 + img_cfg * (e2 - e1) + text_cfg * (e3 - e2)

        a_t = ac[int(t)].float()
        if noise_correct * STEPS > i and latent_ref is not None:
            noise_ref = (latent[:, :num_ref] - a_t.sqrt()
                         * latent_ref) / (1 - a_t).sqrt()
            delta = noise_ref - eps[:, :num_ref]
            eps[:, :num_ref] = eps[:, :num_ref] + delta
            eps[:, num_ref:] = eps[:, num_ref:] + delta.mean(dim=1, keepdim=True)

        prev_t = int(t) - 1000 // STEPS
        a_prev = ac[prev_t].float() if prev_t >= 0 else ac[0].float()
        x0 = (latent - (1 - a_t).sqrt() * eps) / a_t.sqrt()
        latent = a_prev.sqrt() * x0 + (1 - a_prev).sqrt() * eps
    return latent


def build():
    torch.manual_seed(0)
    oracle = OracleUNet3D()
    with torch.no_grad():
        for name, p in oracle.named_parameters():
            if "temporal_transformer.proj_out" in name:
                p.copy_(torch.randn_like(p) * 0.1)
    oracle.eval()
    params = convert_unet3d_state_dict(oracle.state_dict())
    model = UNet3DConditionModel(cfg=UNetConfig.tiny())
    sched = DiffusionSchedule.create()
    tables = make_sampler_tables(sched, STEPS, kind="ddim")

    def unet_apply(p, s, t, c, vsi):
        return model.apply({"params": p}, s, t, c, video_start_index=vsi)

    return oracle, params, tables, unet_apply


def test_first_window_matches_reference_loop():
    oracle, params, tables, unet_apply = build()
    rs = np.random.RandomState(0)
    lat = rs.randn(1, 4, 8, 8, 4).astype(np.float32)
    cond = rs.randn(1, 4, 8, 8, 4).astype(np.float32)
    tc = rs.randn(1, 3, 12).astype(np.float32)
    tu = rs.randn(1, 3, 12).astype(np.float32)

    ref = torch_reference_loop(
        oracle,
        torch.from_numpy(lat.transpose(0, 1, 4, 2, 3)),
        torch.from_numpy(cond.transpose(0, 1, 4, 2, 3)),
        torch.from_numpy(tc), torch.from_numpy(tu), 7.5, 1.2)
    got = sample_video_window(
        unet_apply, params, tables, jnp.asarray(lat), jnp.asarray(cond),
        jnp.asarray(tc), jnp.asarray(tu), jax.random.PRNGKey(0),
        text_cfg=7.5, img_cfg=1.2)["latent"]
    np.testing.assert_allclose(
        np.asarray(got), ref.numpy().transpose(0, 1, 3, 4, 2), atol=2e-3)


def test_followup_window_with_anchoring_matches_reference_loop():
    oracle, params, tables, unet_apply = build()
    rs = np.random.RandomState(1)
    lat = rs.randn(1, 4, 8, 8, 4).astype(np.float32)
    cond = rs.randn(1, 4, 8, 8, 4).astype(np.float32)
    tc = rs.randn(1, 3, 12).astype(np.float32)
    tu = rs.randn(1, 3, 12).astype(np.float32)
    n_ref = 2
    ref_lat = rs.randn(1, n_ref, 8, 8, 4).astype(np.float32)
    ref_full = np.concatenate(
        [ref_lat, np.zeros((1, 4 - n_ref, 8, 8, 4), np.float32)], axis=1)

    ref = torch_reference_loop(
        oracle,
        torch.from_numpy(lat.transpose(0, 1, 4, 2, 3)),
        torch.from_numpy(cond.transpose(0, 1, 4, 2, 3)),
        torch.from_numpy(tc), torch.from_numpy(tu), 7.5, 1.2,
        latent_ref=torch.from_numpy(ref_lat.transpose(0, 1, 4, 2, 3)),
        num_ref=n_ref, noise_correct=0.5, start=2)
    got = sample_video_window(
        unet_apply, params, tables, jnp.asarray(lat), jnp.asarray(cond),
        jnp.asarray(tc), jnp.asarray(tu), jax.random.PRNGKey(0),
        text_cfg=7.5, img_cfg=1.2, video_start_index=2,
        latent_ref=jnp.asarray(ref_full), num_ref_frames=n_ref,
        noise_correct_step=0.5)["latent"]
    np.testing.assert_allclose(
        np.asarray(got), ref.numpy().transpose(0, 1, 3, 4, 2), atol=2e-3)
