"""Synthetic data-gen throughput: one PTP video pair at the reference
shape (video_prompt_to_prompt.py:65-98 — latent (1,16,32,32), 30 DDIM
steps, ModelScope UNetSD + OpenCLIP ViT-H context), random weights
(throughput is weight-independent). Prints one JSON line:
pairs/hour + seconds/pair on this chip.

Usage: PYTHONPATH=. python tools/bench_datagen.py  (env: DG_STEPS/DG_REPS)
"""

import json
import os
import sys
import time


def main():
    from insv2v_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from insv2v_tpu.diffusion.ptp_sampler import sample_ptp_pair
    from insv2v_tpu.diffusion.schedules import (DiffusionSchedule,
                                                make_sampler_tables)
    from insv2v_tpu.models.modelscope_t2v import ModelScopeConfig, UNetSD
    from insv2v_tpu.models.vae import AutoencoderKL, VaeConfig

    steps = int(os.environ.get("DG_STEPS", "30"))
    reps = int(os.environ.get("DG_REPS", "3"))
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    ms_cfg = ModelScopeConfig()
    unet = UNetSD(cfg=ms_cfg, dtype=jnp.bfloat16)
    vae = AutoencoderKL(cfg=VaeConfig(), dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    f, hw = 16, 32

    def const_params(init_fn):
        shapes = jax.eval_shape(init_fn)["params"]
        build = jax.jit(lambda: jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.02, jnp.bfloat16), shapes))
        return jax.block_until_ready(build())

    t0 = time.perf_counter()
    unet_p = const_params(lambda: unet.init(
        rng, jnp.zeros((1, 2, hw, hw, 4), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, ms_cfg.context_dim), jnp.bfloat16)))
    vae_p = const_params(lambda: vae.init(
        rng, jnp.zeros((1, 64, 64, 3)), sample_posterior=False))
    print(f"# params materialized in {time.perf_counter()-t0:.1f}s",
          file=sys.stderr)

    sched = DiffusionSchedule.create(beta_schedule="scaled_linear",
                                     beta_start=0.00085, beta_end=0.012)
    tables = make_sampler_tables(sched, steps, kind="ddim")

    def unet_apply(p, x, t, ctx, sa_share):
        return unet.apply({"params": p}, x, t, ctx, sa_share=sa_share)

    sampler = jax.jit(
        lambda p, lat, cn, co, ckv, cu, k:
        sample_ptp_pair(unet_apply, p, tables, lat, cn, co, ckv, cu, k,
                        guidance_scale=9.0, sa_steps=9, ca_steps=24))
    decode = jax.jit(lambda p, z: vae.apply(
        {"params": p}, z / 0.18215, method=AutoencoderKL.decode))

    d = ms_cfg.context_dim
    cn = jax.random.normal(rng, (1, 77, d), jnp.bfloat16)
    co = jax.random.normal(jax.random.fold_in(rng, 1), (1, 77, d), jnp.bfloat16)
    ckv = (co, cn)
    cu = jnp.zeros((1, 77, d), jnp.bfloat16)
    lat = jax.random.normal(jax.random.fold_in(rng, 2), (1, f, hw, hw, 4))

    def one_pair(seed):
        out = sampler(unet_p, lat, cn, co, ckv, cu, jax.random.PRNGKey(seed))
        frames = [decode(vae_p, out[k].reshape(f, hw, hw, 4))
                  for k in ("latent_old", "latent")]
        return frames

    t_c = time.perf_counter()
    jax.block_until_ready(one_pair(0))
    print(f"# compile+warmup: {time.perf_counter()-t_c:.1f}s", file=sys.stderr)

    ts = []
    for i in range(reps):
        t_s = time.perf_counter()
        jax.block_until_ready(one_pair(i + 1))
        ts.append(time.perf_counter() - t_s)
    best = min(ts)
    print(f"# pair times: {[f'{t:.2f}' for t in ts]} s", file=sys.stderr)
    print(json.dumps({
        "metric": "datagen_pairs_per_hour_per_chip",
        "value": round(3600.0 / best, 1),
        "unit": "video pairs/hour/chip",
        "seconds_per_pair": round(best, 2),
        "config": f"PTP pair, 16x{hw}x{hw} latent, {steps}-step DDIM, "
                  "4-way phase-1 batch, incl. both VAE decodes",
    }))


if __name__ == "__main__":
    main()
