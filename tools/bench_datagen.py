"""Synthetic data-gen throughput: PTP video pairs at the reference shape
(video_prompt_to_prompt.py:65-98 — latent (1,16,32,32), 30 DDIM steps,
ModelScope UNetSD + OpenCLIP ViT-H context), random weights (throughput
is weight-independent). Prints one JSON line: pairs/hour + seconds/pair
on this chip, issued-FLOPs utilization, and the pair-batching A/B
(VERDICT r4 #3: the 16x32x32 latent is far below the editing workload's
saturation point, so the editing negative-batching result need not
transfer).

Batched pairs are EXACTLY per-element equal to solo chains here: the
data-gen sampler is DDIM eta=0 (zero variance => the per-step noise is
never added), every other op is per-element, and sa_share's 4-way group
reshape pairs old/new elements correctly at any B (modelscope_t2v.py).

Usage: PYTHONPATH=. python tools/bench_datagen.py
(env: DG_STEPS/DG_REPS/DG_BATCHES, e.g. DG_BATCHES=1,2,4)
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

    from bench import _compiled_flops, _peak_tflops
    from insv2v_tpu.diffusion.ptp_sampler import sample_ptp_pair
    from insv2v_tpu.diffusion.schedules import (DiffusionSchedule,
                                                make_sampler_tables)
    from insv2v_tpu.models.modelscope_t2v import ModelScopeConfig, UNetSD
    from insv2v_tpu.models.vae import AutoencoderKL, VaeConfig

    steps = int(os.environ.get("DG_STEPS", "30"))
    reps = int(os.environ.get("DG_REPS", "3"))
    batches = [int(b) for b in
               os.environ.get("DG_BATCHES", "1,2,4").split(",")]
    sa_steps, ca_steps = 9, 24  # mid-grid draws (video_prompt_to_prompt.py:178-182)
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
                        guidance_scale=9.0, sa_steps=sa_steps,
                        ca_steps=ca_steps))
    decode = jax.jit(lambda p, z: vae.apply(
        {"params": p}, z / 0.18215, method=AutoencoderKL.decode))

    d = ms_cfg.context_dim

    def ctxs(b):
        cn = jnp.broadcast_to(
            jax.random.normal(rng, (1, 77, d), jnp.bfloat16), (b, 77, d))
        co = jnp.broadcast_to(jax.random.normal(
            jax.random.fold_in(rng, 1), (1, 77, d), jnp.bfloat16), (b, 77, d))
        return cn, co, (co, cn), jnp.zeros((b, 77, d), jnp.bfloat16)

    def one_call(seed, b):
        """b same-prompt pairs (distinct seeds/latents) in ONE chain —
        how video_prompt_to_prompt.py:147-192 collects its num_samples
        attempts per prompt; both VAE decodes per pair, chunked 16."""
        cn, co, ckv, cu = ctxs(b)
        lat = jax.random.normal(jax.random.PRNGKey(seed), (b, f, hw, hw, 4))
        out = sampler(unet_p, lat, cn, co, ckv, cu, jax.random.PRNGKey(seed))
        frames = []
        for key_ in ("latent_old", "latent"):
            z = out[key_].reshape(b * f, hw, hw, 4)
            frames += [decode(vae_p, z[i: i + 16])
                       for i in range(0, b * f, 16)]
        return frames

    results = {}
    for b in batches:
        t_c = time.perf_counter()
        jax.block_until_ready(one_call(0, b))
        print(f"# compile+warmup b={b}: {time.perf_counter()-t_c:.1f}s",
              file=sys.stderr)
        ts = []
        for i in range(max(1, reps if b == batches[0] else reps - 1)):
            t_s = time.perf_counter()
            jax.block_until_ready(one_call(i + 1, b))
            ts.append(time.perf_counter() - t_s)
        best = min(ts)
        results[b] = best
        print(f"# b={b} chain times: {[f'{t:.2f}' for t in ts]} s "
              f"=> {b/best*3600:.0f} pairs/h", file=sys.stderr)

    # issued-FLOPs utilization (VERDICT r4 #3): cost ONE step of each
    # phase at b=1 (cost_analysis counts a scan body once, so never cost
    # the whole chain — bench.py) x step counts + the 2F decode.
    # UNDERCOUNTS since r5: the long spatial attentions now run in the
    # Pallas flash kernel, whose FLOPs cost_analysis cannot see (same
    # caveat as bench.py's mfu) — treat util as a lower bound.
    lat1 = jnp.zeros((1, f, hw, hw, 4))
    cn1, co1, ckv1, cu1 = ctxs(1)
    t0i = tables.timesteps[0]

    @jax.jit
    def p1_step(p, old, new):  # 4-way joint batch (phase 1, sa_share)
        x4 = jnp.concatenate([old, new, old, new], axis=0)
        ctx4 = jnp.concatenate([cu1, cu1, co1, cn1], axis=0)
        return unet_apply(p, x4, t0i, ctx4, True)

    @jax.jit
    def p23_step(p, old, new):  # two separate 2-way passes (phases 2/3)
        x2 = jnp.concatenate([old, old], axis=0)
        e_old = unet_apply(p, x2, t0i, jnp.concatenate([cu1, co1], 0), False)
        x2n = jnp.concatenate([new, new], axis=0)
        kc = jnp.concatenate([cu1, ckv1[0]], 0)
        vc = jnp.concatenate([cu1, ckv1[1]], 0)
        return e_old + unet_apply(p, x2n, t0i, (kc, vc), False)

    util = None
    if os.environ.get("DG_MFU", "1") != "0":
        f_p1 = _compiled_flops(p1_step, unet_p, lat1, lat1)
        f_p23 = _compiled_flops(p23_step, unet_p, lat1, lat1)
        f_dec = _compiled_flops(decode, vae_p, jnp.zeros((16, hw, hw, 4)))
        chain_flops = (sa_steps * f_p1 + (steps - sa_steps) * f_p23
                       + 2 * f_dec)
        peak = _peak_tflops(dev)
        if peak and chain_flops:
            util = chain_flops / results[batches[0]] / (peak * 1e12)
            print(f"# chain {chain_flops/1e12:.2f} TF (p1 {f_p1/1e12:.3f} x "
                  f"{sa_steps} + p23 {f_p23/1e12:.3f} x {steps-sa_steps} + "
                  f"2 x dec {f_dec/1e12:.3f}), peak {peak} TF/s, "
                  f"issued util b=1: {util:.3f}", file=sys.stderr)

    b0 = batches[0]
    best_b = max(results, key=lambda b: b / results[b])
    print(json.dumps({
        "metric": "datagen_pairs_per_hour_per_chip",
        "value": round(3600.0 * best_b / results[best_b], 1),
        "unit": "video pairs/hour/chip",
        "seconds_per_pair": round(results[best_b] / best_b, 2),
        "batch_pairs": best_b,
        "per_batch": {str(b): {"seconds_per_pair": round(t / b, 2),
                               "pairs_per_hour": round(3600.0 * b / t, 1)}
                      for b, t in results.items()},
        "issued_flops_util_b1": round(util, 4) if util else None,
        "config": f"PTP pair, 16x{hw}x{hw} latent, {steps}-step DDIM, "
                  "4-way phase-1 batch, incl. both VAE decodes",
    }))


if __name__ == "__main__":
    main()
