"""Diagnose param-materialization time (VERDICT r4 #2c).

BENCH_r04's driver tail showed 32.7 s of "params materialized" for the
bench trio (UNet + VAE + text const trees) vs the r2 claim of 10.5 s via
the jitted zeros-tree builder — regression or relay variance, never
attributed. This splits each const_params call into its phases:

  eval_shape   host-side abstract trace of model.init (full forward!)
  lower        jit trace+lower of the builder (host)
  compile      XLA compile (persistent-cache hit on warm runs)
  execute      device build + block_until_ready (relay round trip)

Usage: PYTHONPATH=.:/root/.axon_site python tools/diag_param_build.py
"""

import sys
import time


def main():
    from insv2v_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from insv2v_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
    from insv2v_tpu.models.unet3d import UNet3DConditionModel, UNetConfig
    from insv2v_tpu.models.vae import AutoencoderKL, VaeConfig

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    cfg = UNetConfig()
    model = UNet3DConditionModel(cfg=cfg, dtype=jnp.bfloat16)
    vae = AutoencoderKL(cfg=VaeConfig(), dtype=jnp.bfloat16)
    text = ClipTextEncoder(ClipTextConfig(), dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    h, w = 32, 48
    sample0 = jnp.zeros((3, 24, h, w, cfg.in_channels), jnp.bfloat16)
    ctx0 = jnp.zeros((3, 77, cfg.cross_attention_dim), jnp.bfloat16)
    t0 = jnp.zeros((3,), jnp.int32)
    frames0 = jnp.zeros((1, h * 8, w * 8, 3))
    ids0 = jnp.zeros((1, 77), jnp.int32)

    inits = {
        "unet": lambda: model.init(rng, sample0, t0, ctx0),
        "vae": lambda: vae.init(rng, frames0, sample_posterior=False),
        "text": lambda: text.init(rng, ids0),
    }

    grand = 0.0
    for name, init_fn in inits.items():
        t = time.perf_counter()
        shapes = jax.eval_shape(init_fn)["params"]
        t_eval = time.perf_counter() - t

        build = jax.jit(lambda: jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.02, jnp.bfloat16), shapes))
        t = time.perf_counter()
        lowered = build.lower()
        t_lower = time.perf_counter() - t
        t = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t
        t = time.perf_counter()
        jax.block_until_ready(compiled())
        t_exec = time.perf_counter() - t

        n_leaves = len(jax.tree_util.tree_leaves(shapes))
        tot = t_eval + t_lower + t_compile + t_exec
        grand += tot
        print(f"{name:5s}: eval_shape {t_eval:6.2f}s  lower {t_lower:5.2f}s  "
              f"compile {t_compile:6.2f}s  execute {t_exec:5.2f}s  "
              f"total {tot:6.2f}s  ({n_leaves} leaves)")
    print(f"total: {grand:.2f}s")


if __name__ == "__main__":
    main()
