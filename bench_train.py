"""Full-size training-step benchmark on real hardware (VERDICT r1 #2).

Runs the production train step — 0.86B-param UNet3D (bf16 compute, f32
params), frozen VAE+CLIP encodes inside the step, motion-only
grad/adam8bit, remat on all blocks, grad accumulation as a lax.scan —
at the reference's shape (micro-batch 1, 16 frames @ 256x256,
configs/instruct_v2v.yaml:3-12) and records step time + per-microbatch
time + peak HBM into BENCH_TRAIN.json (and one json line on stdout).

TRAIN_ACCUM scales the in-step accumulation count (default 4: enough to
amortize and extrapolate to the reference's 256 without a 10-minute
measurement); reported per-microbatch time is accum-independent.
"""

import dataclasses
import json
import os
import sys
import time


def main():
    # fail fast if backend init wedges (dead TPU relay) — see bench.py
    import threading

    init_done = threading.Event()
    budget = float(os.environ.get("BENCH_INIT_TIMEOUT_S", "600"))

    def _watchdog():
        if not init_done.wait(budget):
            print(f"# FATAL: jax backend init exceeded {budget:.0f}s "
                  "(TPU relay unreachable?)", file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    from insv2v_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    frames = int(os.environ.get("TRAIN_FRAMES", "16"))
    size = int(os.environ.get("TRAIN_SIZE", "256"))
    accum = int(os.environ.get("TRAIN_ACCUM", "4"))

    from insv2v_tpu.training.trainer import Trainer, TrainConfig
    from insv2v_tpu.utils.config import load_config
    from insv2v_tpu.utils.factory import get_models

    dev = jax.devices()[0]
    init_done.set()
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    cfg = load_config("configs/instruct_v2v.yaml")
    models = get_models(cfg, dtype=jnp.bfloat16)
    unet, vae, text = models["unet"], models["vae"], models["text_model"]
    unet = dataclasses.replace(unet, cfg=dataclasses.replace(unet.cfg, remat=True))

    tcfg = TrainConfig(
        optimizer=os.environ.get("TRAIN_OPT", "adam8bit"),
        accumulate_grad_batches=accum,
        loss_type=str(cfg["trainer"].get("loss_fn", "l2")),
        lr=float(cfg["trainer"].get("lr", 1e-5)),
    )
    trainer = Trainer(unet, vae, text, tcfg)

    # step time is weight-independent: constant params skip the ~25s
    # full-size random init through the relay
    rng = jax.random.PRNGKey(0)
    lat = size // 8
    t0 = time.perf_counter()
    shapes = {
        "unet": jax.eval_shape(
            lambda k: unet.init(k, jnp.zeros((1, 2, lat, lat, 8), jnp.bfloat16),
                                jnp.zeros((1,), jnp.int32),
                                jnp.zeros((1, 77, 768), jnp.bfloat16)), rng),
        "vae": jax.eval_shape(
            lambda k: vae.init(k, jnp.zeros((1, 32, 32, 3), jnp.bfloat16),
                               jax.random.PRNGKey(1)), rng),
        "text": jax.eval_shape(
            lambda k: text.init(k, jnp.zeros((1, 77), jnp.int32)), rng),
    }
    # ONE jitted builder per tree = one relay dispatch (the per-leaf
    # eager jnp.full loop was 64 s of warmup through the relay — same
    # fix as bench.py's const_params, PERF.md r3). Leaves are RANDOM
    # N(0, 0.02): with constant weights every conv output channel is
    # identical, so GroupNorm's group variance is ~0 and normalization
    # divides bf16 noise by noise — the accum-256 run went NaN that way.
    # Device-side normals cost ~nothing and keep the loss finite.
    def _rand_tree(tree, dtype_of):
        leaves, treedef = jax.tree_util.tree_flatten(tree)

        def build():
            ks = jax.random.split(jax.random.PRNGKey(42), len(leaves))
            return jax.tree_util.tree_unflatten(treedef, [
                (0.02 * jax.random.normal(k, s.shape)).astype(dtype_of(s, i))
                for i, (k, s) in enumerate(zip(ks, leaves))])

        return jax.block_until_ready(jax.jit(build)())

    const = lambda tree, dt=None: _rand_tree(
        tree, lambda s, i: dt or s.dtype)
    # Frozen weights live in bf16: they are consumed in bf16 by every
    # matmul anyway and are never updated, so an f32 master copy is pure
    # HBM waste (~3.8 GB at this scale — the difference between fitting
    # and faulting on a 16 GB v5e). Trainable motion leaves stay f32.
    from insv2v_tpu.training.trainer import motion_param_mask

    unet_shapes = shapes["unet"]["params"]
    mask_flat = jax.tree_util.tree_leaves(motion_param_mask(unet_shapes))
    unet_p = _rand_tree(
        unet_shapes,
        lambda s, i: s.dtype if mask_flat[i] else jnp.bfloat16)
    vae_p = const(shapes["vae"], jnp.bfloat16)["params"]
    text_p = const(shapes["text"], jnp.bfloat16)["params"]
    n_params = sum(int(np.prod(s.shape))
                   for s in jax.tree_util.tree_leaves(shapes["unet"]))
    print(f"# unet params: {n_params/1e9:.3f}B, materialized in "
          f"{time.perf_counter()-t0:.1f}s", file=sys.stderr)

    state = trainer.create_state(unet_p, vae_p, text_p)
    state = trainer.place_state(state)
    step_fn = trainer.jitted_step(state)  # raw jit: memory_analysis below

    def make_batch(seed):
        k = jax.random.PRNGKey(seed)
        k1, k2 = jax.random.split(k)
        # CHANNEL-PACKED (accum, F, H, W*3): a channel-minor (.., W, 3)
        # jit parameter is padded ~5x in HBM by the (sublane, lane)
        # tiling — at accum 256 the two videos alone overflowed the v5e
        # by 21 GB of pure padding. The packed form is lane-aligned; the
        # trainer unpacks per microbatch inside the step. bf16 at rest:
        # source pixels are 8-bit and the VAE casts to bf16 at its first
        # conv anyway, so f32 feeding doubles HBM (and left an extra
        # full-batch bf16 convert temp) for zero effective precision.
        shape = (accum, frames, size, size * 3)
        return {
            "input_video": jax.random.uniform(k1, shape, jnp.bfloat16, -1, 1),
            "edited_video": jax.random.uniform(k2, shape, jnp.bfloat16, -1, 1),
            "prompt_ids": jnp.ones((accum, 77), jnp.int32),
        }

    # motion-only-update assert at scale (VERDICT r2 #4): snapshot one
    # frozen and one motion leaf before the steps, compare after
    def _leaf(tree, want_motion):
        for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]:
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            if ("motion_modules_" in p) == want_motion and v.ndim >= 2:
                return p, np.asarray(v[(0,) * (v.ndim - 1)][:8], np.float32)
        raise AssertionError("no such leaf")

    frozen_path, frozen_before = _leaf(state.params, False)
    motion_path, motion_before = _leaf(state.params, True)

    # INSV2V_AOT_TRAIN=1: serve the compiled step from the AOT executable
    # cache (VERDICT r4 #1 — the accum-256 compile is 330-360 s on EVERY
    # launch and never hits the persistent compile cache). Timed so the
    # warm-start win (or the serialization failure) is measured either way.
    aot_train = os.environ.get("INSV2V_AOT_TRAIN", "0") == "1"
    aot_load_s = None
    run_step = step_fn
    if aot_train:
        t_a = time.perf_counter()
        run_step = trainer.aot_step(state, make_batch(0), rng)
        aot_load_s = round(time.perf_counter() - t_a, 1)
        print(f"# aot train-step load/compile: {aot_load_s}s "
              f"(served={'aot' if hasattr(run_step, '_aot_compiled') else 'jit-fallback'})",
              file=sys.stderr)

    t_c = time.perf_counter()
    state, metrics = run_step(state, make_batch(0), rng)
    jax.block_until_ready(metrics)
    print(f"# compile+warmup: {time.perf_counter()-t_c:.1f}s", file=sys.stderr)

    times = []
    for i in range(int(os.environ.get("TRAIN_REPS", "2"))):
        batch = make_batch(i + 1)
        jax.block_until_ready(batch)
        t_s = time.perf_counter()
        state, metrics = run_step(state, batch, rng)
        jax.block_until_ready(metrics)
        times.append(time.perf_counter() - t_s)
    best = min(times)
    loss = float(metrics["train_loss"])

    frozen_after = _leaf(state.params, False)[1]
    motion_after = _leaf(state.params, True)[1]
    motion_only = bool(
        np.array_equal(frozen_before, frozen_after)
        and not np.array_equal(motion_before, motion_after))
    print(f"# motion-only update: {motion_only} "
          f"(frozen {frozen_path} unchanged, motion {motion_path} moved)",
          file=sys.stderr)

    peak_hbm_gb = None
    peak_hbm_source = None
    try:
        stats = dev.memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            peak_hbm_gb = round(stats["peak_bytes_in_use"] / 2**30, 2)
            peak_hbm_source = "memory_stats"
    except Exception as e:
        print(f"# memory_stats unavailable: {e}", file=sys.stderr)

    # static fallback when the relay hides runtime memory stats: XLA's own
    # compile-time memory analysis (args + outputs + temps + generated code).
    # TRAIN_MEM_ANALYSIS=0 skips it: lower().compile() bypasses the jit
    # dispatch cache, so on an AOT-warm run this block alone would re-pay
    # the full 330 s compile the AOT cache just skipped.
    hbm_analysis_gb = None
    try:
        if os.environ.get("TRAIN_MEM_ANALYSIS", "1") == "0":
            raise RuntimeError("skipped (TRAIN_MEM_ANALYSIS=0)")
        ma = step_fn.lower(state, make_batch(0), rng).compile().memory_analysis()
        total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes + ma.generated_code_size_in_bytes
                 - ma.alias_size_in_bytes)
        hbm_analysis_gb = round(total / 2**30, 2)
        print(f"# xla memory analysis: args {ma.argument_size_in_bytes/2**30:.2f} "
              f"+ temps {ma.temp_size_in_bytes/2**30:.2f} "
              f"- aliased {ma.alias_size_in_bytes/2**30:.2f} "
              f"= {hbm_analysis_gb} GiB", file=sys.stderr)
    except Exception as e:
        print(f"# memory_analysis unavailable: {e}", file=sys.stderr)

    # Allocation-probe bound (VERDICT r3 #7): memory_stats() is None
    # through the axon relay, so BRACKET the true peak (residents + step
    # temps): the step ran bare (peak <= capacity), and the largest
    # ballast it still runs beside tightens the upper bound while the
    # smallest it fails beside gives a lower bound. Runs LAST — an
    # OOM-failed step leaves the donated state consumed, which is fine
    # once every other measurement is done.
    _HBM_CAPACITY = {"v5 lite": 15.75, "v5e": 15.75, "v5p": 95.0,
                     "v4": 31.75, "v6": 31.25, "v3": 16.0}
    if peak_hbm_gb is None and os.environ.get("TRAIN_PROBE_HBM", "1") != "0":
        kind = str(getattr(dev, "device_kind", "")).lower()
        cap = next((v for k, v in _HBM_CAPACITY.items() if k in kind), None)
        if cap is not None:
            ok_gb, fail_gb = 0.0, None
            ballast = None
            for gb in (0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0, 8.0):
                try:
                    del ballast
                    ballast = jax.block_until_ready(
                        jnp.zeros((int(gb * 2**30) // 4,), jnp.float32))
                    state, m2 = run_step(state, make_batch(99), rng)
                    jax.block_until_ready(m2)
                    ok_gb = gb
                    print(f"# hbm probe: step ran beside {gb} GiB ballast",
                          file=sys.stderr)
                except Exception as e:
                    fail_gb = gb
                    ballast = None  # free it
                    print(f"# hbm probe: failed at {gb} GiB ballast "
                          f"({type(e).__name__})", file=sys.stderr)
                    break
            peak_hbm_gb = round(cap - ok_gb, 2)
            lo = round(cap - fail_gb, 2) if fail_gb is not None else None
            peak_hbm_source = (
                f"alloc-probe: step ran beside {ok_gb} GiB ballast"
                + (f", failed beside {fail_gb} GiB" if fail_gb else "")
                + f" => peak in ({lo if lo is not None else '?'},"
                f" {peak_hbm_gb}] GiB of cap {cap}")

    result = {
        "metric": "train_microbatch_time_s",
        "value": round(best / accum, 3),
        "unit": "s/microbatch (1 video pair, 16f@256)",
        "step_time_s": round(best, 2),
        "accum": accum,
        "extrapolated_accum256_step_s": round(best / accum * 256, 1),
        "peak_hbm_gb": peak_hbm_gb,
        "peak_hbm_source": peak_hbm_source,
        # device.memory_stats() is None through the axon relay; the
        # static XLA memory analysis is the substitute (conservative:
        # accum-256 analyzes at 17.3 GiB yet executes on the 15.75 GiB
        # chip — the analysis double-counts some donated aliases)
        "hbm_analysis_gb": hbm_analysis_gb,
        "motion_only_update": motion_only,
        "aot_train": aot_train,
        "aot_load_s": aot_load_s,
        "unet_params_b": round(n_params / 1e9, 3),
        "loss_finite": bool(np.isfinite(loss)),
        "optimizer": tcfg.optimizer,
        "remat": True,
        "config": f"micro=1x{frames}f@{size}, motion-only grads, bf16/f32",
    }
    with open("BENCH_TRAIN.json", "w") as f:
        json.dump(result, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
