"""Golden regression snapshots for the hot compute paths.

Frozen outputs of fixture-sized models under fixed seeds, committed as
.npz — so round-2 kernel/fusion work can verify numerics in seconds
without re-running the (slow) torch-oracle suites. Regenerate with:

    INSV2V_REGEN_GOLDEN=1 python -m pytest tests/test_golden.py

(they are seed+init-deterministic for a fixed jax version; regenerate on
jax upgrades if initializer streams change).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
REGEN = os.environ.get("INSV2V_REGEN_GOLDEN") == "1"


def check_or_regen(name, arrays):
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrays.items()})
        if REGEN:
            pytest.skip(f"regenerated {path}")
    stored = np.load(path)
    for k, v in arrays.items():
        np.testing.assert_allclose(
            np.asarray(v), stored[k], atol=2e-4,
            err_msg=f"{name}/{k} drifted from golden snapshot")


def test_unet3d_tiny_golden():
    from insv2v_tpu.models.unet3d import UNet3DConditionModel, UNetConfig

    model = UNet3DConditionModel(cfg=UNetConfig.tiny())
    x = jax.random.normal(jax.random.PRNGKey(10), (1, 2, 8, 8, 8))
    t = jnp.array([321])
    ctx = jax.random.normal(jax.random.PRNGKey(11), (1, 3, 12))
    params = model.init(jax.random.PRNGKey(12), x, t, ctx)["params"]
    out = model.apply({"params": params}, x, t, ctx, video_start_index=2)
    check_or_regen("unet3d_tiny", {"eps": out})


def test_vae_tiny_golden():
    from insv2v_tpu.models.vae import AutoencoderKL, VaeConfig

    cfg = VaeConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
                    embed_dim=4, resolution=16)
    model = AutoencoderKL(cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(13), (1, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(14), x, sample_posterior=False)
    z = model.apply(variables, x, sample_posterior=False,
                    method=AutoencoderKL.encode)
    rec = model.apply(variables, z, method=AutoencoderKL.decode)
    check_or_regen("vae_tiny", {"z": z, "rec": rec})


def test_window_sampler_golden():
    from insv2v_tpu.diffusion.samplers import sample_video_window
    from insv2v_tpu.diffusion.schedules import (
        DiffusionSchedule,
        make_sampler_tables,
    )
    from insv2v_tpu.models.unet3d import UNet3DConditionModel, UNetConfig

    model = UNet3DConditionModel(cfg=UNetConfig.tiny())
    params = model.init(
        jax.random.PRNGKey(15), jnp.zeros((1, 2, 8, 8, 8)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 3, 12)))["params"]
    tables = make_sampler_tables(DiffusionSchedule.create(), 3, kind="ddpm")
    lat = jax.random.normal(jax.random.PRNGKey(16), (1, 2, 8, 8, 4))
    cond = jax.random.normal(jax.random.PRNGKey(17), (1, 2, 8, 8, 4))
    tc = jax.random.normal(jax.random.PRNGKey(18), (1, 3, 12))
    out = sample_video_window(
        lambda p, s, t, c, v: model.apply({"params": p}, s, t, c,
                                          video_start_index=v),
        params, tables, lat, cond, tc, jnp.zeros_like(tc),
        jax.random.PRNGKey(19), text_cfg=7.5, img_cfg=1.2)
    check_or_regen("window_sampler", {"latent": out["latent"]})
