"""Benchmark: edited frames/sec/chip on the reference's headline workload.

Measures the FULL editing path — text encode, chunked VAE encode of the
32-frame conditioning video, the 50-step dual-CFG windowed denoise chain
(16-frame windows, 4 ref frames, noise anchoring), and the chunked VAE
decode — i.e. everything the reference's LOVEU runner does per video
(insv2v_run_loveu_tgve.py:98-168), at 256x384, with random weights
(throughput is weight-independent).

Prints ONE json line:
  {"metric": "edited_frames_per_sec_per_chip", "value": N,
   "unit": "frames/s/chip", "vs_baseline": N, ...}

``value`` is the END-TO-END batch-1 number; ``denoise_fps`` isolates the
denoise chain (the r1/r2 headline for cross-round comparison), and
``batched_fps`` is the end-to-end throughput with BENCH_B edit prompts
batched into one chain — the LOVEU grid runs 4 edits per video over
identical image conditioning, so batching is the production configuration
(apps/run_loveu_tgve.py).

``vs_baseline`` divides by an ESTIMATED A100 reference throughput for the
same workload — the reference publishes no numbers. The estimate, its
derivation and sensitivity band live in ONE place:
insv2v_tpu/utils/baseline.py (summarized in BASELINE.md); bench.py reports
``vs_baseline_range`` from that band. The guess-free absolute anchors are
``mfu`` (issued-FLOPs utilization, see below) and ``p50_edit_latency_s``.

Env knobs: BENCH_FRAMES/H/W/STEPS (workload), BENCH_REPS, BENCH_B
(batched-chain width, 0 disables), BENCH_E2E=0 (denoise-only probe mode,
skips VAE/text models entirely), BENCH_MFU=0 (skip the costing compile).
Warmup compiles ONE window variant (the ref-anchored sampler also serves
the first window with num_ref=0 — exact no-op correction) per batch size,
plus VAE encode/decode and the text encoder.
"""

import json
import os
import sys
import time

from insv2v_tpu.utils.baseline import A100_EST_FPS, A100_EST_FPS_RANGE

# bf16 peak TFLOP/s per chip by device_kind substring, for MFU: the
# guess-free absolute anchor VERDICT.md asked for alongside vs_baseline
TPU_PEAK_TFLOPS = {
    "v6": 918.0,   # Trillium
    "v5p": 459.0,
    "v5 lite": 197.0, "v5e": 197.0, "v5litepod": 197.0,
    "v4": 275.0,
    "v3": 123.0,
    "v2": 45.0,
}


def _peak_tflops(device) -> float:
    kind = str(getattr(device, "device_kind", "")).lower()
    for key, val in TPU_PEAK_TFLOPS.items():
        if key in kind:
            return val
    return 0.0


def _compiled_flops(jitted, *args) -> float:
    """XLA's own HLO cost analysis for one call of a jitted fn (0 if the
    backend doesn't expose it).

    NOTE: XLA counts a ``lax.scan``/while body ONCE, so never call this on
    a whole sampler chain — cost a single denoise step and multiply by the
    step count (the round-1 bench under-reported MFU ~50x this way). It
    also cannot see inside Pallas kernels (flash attention + fused FF), so
    callers cost the step with the kernels dispatched to their XLA
    fallbacks (same math, same matmuls => same FLOPs, all visible).
    """
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception as e:  # relay/backends without cost analysis
        print(f"# cost_analysis unavailable: {e}", file=sys.stderr)
        return 0.0


NUM_FRAMES = int(os.environ.get("BENCH_FRAMES", "32"))
HEIGHT = int(os.environ.get("BENCH_H", "256"))
WIDTH = int(os.environ.get("BENCH_W", "384"))
STEPS = int(os.environ.get("BENCH_STEPS", "50"))
REPS = int(os.environ.get("BENCH_REPS", "3"))
BATCH = int(os.environ.get("BENCH_B", "2"))
E2E = os.environ.get("BENCH_E2E", "1") != "0"
WINDOW = 16
NUM_REF = 4


def main():
    # Fail fast (with a diagnostic) if backend init wedges — a dead TPU
    # relay otherwise hangs jax.devices() forever and the driver's bench
    # window is lost in silence. Generous: healthy relay init is seconds.
    import threading

    init_done = threading.Event()
    init_budget = float(os.environ.get("BENCH_INIT_TIMEOUT_S", "600"))

    def _watchdog():
        if not init_done.wait(init_budget):
            print(f"# FATAL: jax backend init exceeded {init_budget:.0f}s "
                  "(TPU relay unreachable?)", file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    from insv2v_tpu.utils.jax_cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    print(f"# compilation cache: {cache_dir}", file=sys.stderr)

    from insv2v_tpu.diffusion.samplers import sample_video_window, split_windows
    from insv2v_tpu.diffusion.schedules import DiffusionSchedule, make_sampler_tables
    from insv2v_tpu.models.unet3d import UNet3DConditionModel, UNetConfig

    dev = jax.devices()[0]
    init_done.set()
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    cfg = UNetConfig()
    model = UNet3DConditionModel(cfg=cfg, dtype=jnp.bfloat16)
    h, w = HEIGHT // 8, WIDTH // 8
    rng = jax.random.PRNGKey(0)

    sample0 = jnp.zeros((3, WINDOW, h, w, cfg.in_channels), jnp.bfloat16)
    ctx0 = jnp.zeros((3, 77, cfg.cross_attention_dim), jnp.bfloat16)
    t0 = jnp.zeros((3,), jnp.int32)
    # throughput is weight-independent (MXU time is data-independent):
    # materialize cheap constant params instead of a 0.86B random init.
    # ONE jitted builder per model = one relay dispatch for the whole tree
    # (the per-leaf jnp.full loop was 38 s of r2 warmup — PERF.md).
    t_init = time.perf_counter()

    def const_params(init_fn):
        shapes = jax.eval_shape(init_fn)["params"]
        build = jax.jit(lambda: jax.tree_util.tree_map(
            lambda s: jnp.full(s.shape, 0.02, jnp.bfloat16), shapes))
        return jax.block_until_ready(build())

    params = const_params(lambda: model.init(rng, sample0, t0, ctx0))

    vae = text = None
    vae_params = text_params = None
    if E2E:
        from insv2v_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
        from insv2v_tpu.models.vae import AutoencoderKL, VaeConfig

        vae = AutoencoderKL(cfg=VaeConfig(), dtype=jnp.bfloat16)
        text = ClipTextEncoder(ClipTextConfig(), dtype=jnp.bfloat16)
        frames0 = jnp.zeros((1, HEIGHT, WIDTH, 3))
        ids0 = jnp.zeros((1, 77), jnp.int32)
        vae_params = const_params(  # full __call__ => encoder AND decoder
            lambda: vae.init(rng, frames0, sample_posterior=False))
        text_params = const_params(lambda: text.init(rng, ids0))
    print(f"# params materialized in {time.perf_counter()-t_init:.1f}s",
          file=sys.stderr)

    sched = DiffusionSchedule.create()
    tables = make_sampler_tables(sched, STEPS, kind="ddim")

    def unet_apply(p, s, t, c, vsi):
        return model.apply({"params": p}, s, t, c, video_start_index=vsi)

    # ONE compiled sampler serves every window: num_ref is traced and the
    # anchoring correction vanishes exactly at num_ref=0 (samplers.py).
    @jax.jit
    def window_ref(p, latent, cond, tc, tu, key, latent_ref, num_ref, vsi):
        return sample_video_window(
            unet_apply, p, tables, latent, cond, tc, tu, key,
            text_cfg=7.5, img_cfg=1.2, video_start_index=vsi,
            latent_ref=latent_ref, num_ref_frames=num_ref,
            noise_correct_step=0.5, share_batch_noise=True)["latent"]

    if E2E:
        encode_text = jax.jit(lambda p, ids: text.apply({"params": p}, ids))

        @jax.jit
        def vae_encode(p, x, key):
            return vae.apply({"params": p}, x, key, method=AutoencoderKL.encode)

        @jax.jit
        def vae_decode(p, z):
            return vae.apply({"params": p}, z / 0.18215,
                             method=AutoencoderKL.decode)

    windows = split_windows(NUM_FRAMES, WINDOW, NUM_REF)

    # BENCH_AOT=1 (default — VERDICT r4 #2a: the warm start must be
    # driver-visible): serve window_ref from the AOT executable cache
    # (utils/aot_cache.py) — a warm start then skips Python tracing +
    # StableHLO lowering of the huge window program, not just the XLA
    # compile (VERDICT r3 #8: the ~118 s cache-warm warmup paid per
    # LOVEU shard worker). Dispatcher keyed on batch size; falls back
    # to the plain jit for unseen shapes. The VAE encode/decode and text
    # encode executables (14.2 s + 1.8 s first calls) are AOT'd below
    # via lazy_aot, keyed by their first-call avals (VERDICT r4 #2b).
    if os.environ.get("BENCH_AOT", "1") == "1":
        from insv2v_tpu.utils.aot_cache import lazy_aot, load_or_compile

        if E2E:
            encode_text = lazy_aot("bench_text", encode_text)
            vae_encode = lazy_aot("bench_vae_enc", vae_encode)
            vae_decode = lazy_aot("bench_vae_dec", vae_decode)

        # example avals must match the REAL window shape: at
        # BENCH_FRAMES < WINDOW the chain runs smaller windows and a
        # WINDOW-sized executable would never serve (per-call fallback)
        f_win = windows[0].num_frames

        def _ex_args(b):
            z = lambda *s: jnp.zeros(s, jnp.float32)
            ctx_z = jnp.zeros((b, 77, cfg.cross_attention_dim), jnp.bfloat16)
            return (params, z(b, f_win, h, w, 4), z(b, f_win, h, w, 4),
                    ctx_z, ctx_z, jax.random.PRNGKey(0),
                    z(b, f_win, h, w, 4), jnp.int32(0), jnp.int32(0))

        _w_jit = window_ref
        _w_aot = {}
        # extra = the closure constants baked into window_ref (sampler
        # tables + CFG scales + anchoring fraction) — the AOT key cannot
        # see them (aot_cache docstring)
        _extra = ("ddim", STEPS, 7.5, 1.2, 0.5)
        for _b in {1, BATCH if BATCH > 1 else 1}:
            t_a = time.perf_counter()
            _w_aot[_b] = load_or_compile(f"window_ref_{STEPS}s", _w_jit,
                                         *_ex_args(_b), extra=_extra)
            print(f"# aot load/compile window_ref b={_b}: "
                  f"{time.perf_counter()-t_a:.1f}s", file=sys.stderr)

        def window_ref(p, latent, *rest):  # noqa: F811 — aot dispatcher
            return _w_aot.get(latent.shape[0], _w_jit)(p, latent, *rest)

    def run_chain(seed, b, tc, tu, cond_all):
        """The windowed denoise chain at video batch b (dual-CFG => 3b)."""
        key = jax.random.PRNGKey(seed)
        k1, key = jax.random.split(key)
        f0 = windows[0].num_frames
        init = jnp.broadcast_to(
            jax.random.normal(k1, (1, f0, h, w, 4)), (b, f0, h, w, 4))
        lat = window_ref(params, init, cond_all[:, :f0], tc, tu, k1,
                         jnp.zeros_like(init), jnp.int32(0), jnp.int32(0))
        prev_init = init
        outs = [lat]
        for spec in windows[1:]:
            kn, key = jax.random.split(key)
            n_new = spec.num_frames - spec.num_ref
            init = jnp.concatenate(
                [prev_init[:, -spec.num_ref:],
                 jnp.broadcast_to(jax.random.normal(kn, (1, n_new, h, w, 4)),
                                  (b, n_new, h, w, 4))], axis=1)
            ref = jnp.concatenate(
                [lat[:, -spec.num_ref:], jnp.zeros((b, n_new, h, w, 4))], axis=1)
            lat = window_ref(
                params, init, cond_all[:, spec.start: spec.start + spec.num_frames],
                tc, tu, kn, ref, jnp.int32(spec.num_ref), jnp.int32(spec.start))
            outs.append(lat[:, spec.num_ref:])
            prev_init = init
        return jnp.concatenate(outs, axis=1)

    def run_edit(seed, b):
        """Full edit: text encode + chunked VAE encode + chain + decode
        (the per-video work of insv2v_run_loveu_tgve.py:98-168)."""
        key = jax.random.PRNGKey(seed)
        if E2E:
            ids = jax.random.randint(key, (b + 1, 77), 0, 49408)
            ctx = encode_text(text_params, ids).astype(jnp.bfloat16)
            tc, tu = ctx[:b], jnp.broadcast_to(ctx[b:], ctx[:b].shape)
            frames = jax.random.uniform(key, (NUM_FRAMES, HEIGHT, WIDTH, 3),
                                        minval=-1.0, maxval=1.0)
            zs = [vae_encode(vae_params, frames[i: i + 16],
                             jax.random.fold_in(key, i))
                  for i in range(0, NUM_FRAMES, 16)]
            cond = (jnp.concatenate(zs, axis=0)[None]).astype(jnp.float32)
        else:
            tc = jax.random.normal(key, (b, 77, cfg.cross_attention_dim),
                                   jnp.bfloat16)
            tu = jnp.zeros_like(tc)
            cond = jax.random.normal(key, (1, NUM_FRAMES, h, w, 4), jnp.float32)
        cond_all = jnp.broadcast_to(cond, (b,) + cond.shape[1:])
        lat = run_chain(seed, b, tc, tu, cond_all)
        if E2E:
            flat = lat.reshape((-1,) + lat.shape[2:])
            outs = [vae_decode(vae_params, flat[i: i + 8])
                    for i in range(0, flat.shape[0], 8)]
            return jnp.concatenate(outs, axis=0)
        return lat

    def timed(fn, n, *args):
        ts = []
        for i in range(n):
            t_start = time.perf_counter()
            jax.block_until_ready(fn(i + 1, *args))
            ts.append(time.perf_counter() - t_start)
        return ts

    # warmup/compile (one window variant per batch size + VAE/text).
    # Per-piece first-call timing attributes the warmup (VERDICT r3 #8:
    # which compiles miss the persistent cache / dominate through the
    # relay); wrappers are pass-through after the first call.
    def timed_first(name, fn):
        done = []

        def wrap(*a):
            if done:
                return fn(*a)
            t0 = time.perf_counter()
            r = jax.block_until_ready(fn(*a))
            print(f"# first-call {name}: {time.perf_counter()-t0:.1f}s",
                  file=sys.stderr)
            done.append(1)
            return r

        return wrap

    window_ref = timed_first("window_ref(b=1)", window_ref)
    if E2E:
        encode_text = timed_first("text_encode", encode_text)
        vae_encode = timed_first("vae_encode", vae_encode)
        vae_decode = timed_first("vae_decode", vae_decode)
    t_c = time.perf_counter()
    jax.block_until_ready(run_edit(0, 1))
    print(f"# compile+warmup b=1: {time.perf_counter()-t_c:.1f}s",
          file=sys.stderr)

    times = timed(run_edit, REPS, 1)
    best = min(times)
    fps = NUM_FRAMES / best
    p50 = sorted(times)[len(times) // 2]
    print(f"# e2e edit times (b=1): {[f'{t:.2f}' for t in times]} s",
          file=sys.stderr)

    denoise_fps = None
    if E2E:
        # isolate the denoise chain (the r1/r2 headline) for comparability
        tcd = jnp.zeros((1, 77, cfg.cross_attention_dim), jnp.bfloat16)
        cond = jnp.zeros((1, NUM_FRAMES, h, w, 4), jnp.float32)
        jax.block_until_ready(run_chain(0, 1, tcd, tcd, cond))  # cached compile
        dts = timed(lambda s: run_chain(s, 1, tcd, tcd, cond), REPS)
        denoise_fps = NUM_FRAMES / min(dts)
        print(f"# denoise-chain times: {[f'{t:.2f}' for t in dts]} s",
              file=sys.stderr)
    else:
        denoise_fps = fps

    batched_fps = None
    if BATCH > 1:
        # the batched variant is a supplementary metric (prompt batching is
        # default-off per the r3 measured negative): a variant-only compile
        # failure must degrade to batched_fps=null, never kill the bench
        try:
            t_c = time.perf_counter()
            jax.block_until_ready(run_edit(0, BATCH))
            print(f"# compile+warmup b={BATCH}: {time.perf_counter()-t_c:.1f}s",
                  file=sys.stderr)
            bts = timed(run_edit, max(1, REPS - 1), BATCH)
            batched_fps = BATCH * NUM_FRAMES / min(bts)
            print(f"# e2e edit times (b={BATCH}): {[f'{t:.2f}' for t in bts]} s",
                  file=sys.stderr)
        except Exception as e:  # pragma: no cover - device/compiler specific
            print(f"# batched variant b={BATCH} failed: "
                  f"{str(e).splitlines()[0][:200]}", file=sys.stderr)

    # "mfu" = ISSUED-FLOPs utilization: XLA-counted FLOPs for ONE fused
    # 3xCFG denoise step x (steps x windows) / wall / peak. "Issued"
    # because the count includes the deliberately 8x-padded packed-temporal
    # matmuls (the graph that actually runs); conventional model-FLOPs MFU
    # (temporal attention at its unpadded FxF cost) is lower — see
    # PERF.md "Metric definitions". Costing the step (not the scanned
    # chain) sidesteps XLA counting the scan body once. BENCH_MFU=0 skips
    # the extra compile (ablation probes only need wall time).
    from insv2v_tpu.diffusion.samplers import dual_cfg_eps

    step_flops = 0.0
    model_step_flops = 0.0

    if os.environ.get("BENCH_MFU", "1") != "0":
        @jax.jit
        def one_step(p, lat, cond, tcc, tuu):
            return dual_cfg_eps(unet_apply, p, lat, cond, tables.timesteps[0],
                                tuu, tcc, 7.5, 1.2, jnp.int32(0))

        lat1 = jnp.zeros((1, WINDOW, h, w, 4), jnp.float32)
        cond1 = jnp.zeros((1, WINDOW, h, w, 4), jnp.float32)
        tc1 = jnp.zeros((1, 77, cfg.cross_attention_dim), jnp.bfloat16)
        # cost the step with the Pallas kernels dispatched to their XLA
        # fallbacks: cost_analysis can't see inside custom calls, so the
        # r2 bench under-reported MFU by the flash+fused-FF FLOPs
        # (0.30 reported vs ~0.42 true — PERF.md). The fallback graph
        # computes the same matmuls, so its count IS the step's FLOPs.
        # (Counts FLOPs as issued, incl. the 8x-padded packed temporal
        # matmuls — the graph that actually runs.)
        from insv2v_tpu.models import unet3d as _u3d
        from insv2v_tpu.ops import attention as _att
        from insv2v_tpu.ops import fused_ff as _fff

        _saved = (_att._FLASH_DISABLED, _fff._FUSED_FF, _u3d._PACKED_TEMPORAL)
        _att._FLASH_DISABLED, _fff._FUSED_FF = True, False
        try:
            step_flops = _compiled_flops(one_step, params, lat1, cond1, tc1, tc1)
            # model-FLOPs count: same step with the per-head (unpadded FxF)
            # temporal attention — the conventional MFU numerator. Fresh
            # jit wrapper: the flag is read at trace time, so re-lowering
            # one_step could reuse the cached packed trace.
            _u3d._PACKED_TEMPORAL = "0"

            @jax.jit
            def one_step_unpadded(p, lat, cond, tcc, tuu):
                return dual_cfg_eps(unet_apply, p, lat, cond,
                                    tables.timesteps[0], tuu, tcc, 7.5, 1.2,
                                    jnp.int32(0))

            model_step_flops = _compiled_flops(
                one_step_unpadded, params, lat1, cond1, tc1, tc1)
        finally:
            _att._FLASH_DISABLED, _fff._FUSED_FF, _u3d._PACKED_TEMPORAL = _saved
    total_flops = step_flops * STEPS * len(windows)
    peak = _peak_tflops(dev)
    denoise_wall = NUM_FRAMES / denoise_fps if denoise_fps else None
    mfu = (total_flops / denoise_wall / (peak * 1e12)
           if (peak and total_flops and denoise_wall) else None)
    model_mfu = (model_step_flops * STEPS * len(windows) / denoise_wall
                 / (peak * 1e12)
                 if (peak and model_step_flops and denoise_wall) else None)
    if mfu is not None:
        print(f"# step flops: {step_flops/1e12:.2f} TF x {STEPS * len(windows)}"
              f" steps, peak {peak} TF/s, issued-FLOPs util {mfu:.3f}"
              + (f", model-FLOPs MFU {model_mfu:.3f}" if model_mfu else ""),
              file=sys.stderr)

    print(json.dumps({
        "metric": "edited_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / A100_EST_FPS, 3),
        "vs_baseline_range": [round(fps / A100_EST_FPS_RANGE[1], 2),
                              round(fps / A100_EST_FPS_RANGE[0], 2)],
        "denoise_fps": round(denoise_fps, 3) if denoise_fps else None,
        "batched_fps": round(batched_fps, 3) if batched_fps else None,
        "batch": BATCH if batched_fps else 1,
        "p50_edit_latency_s": round(p50, 2),
        "mfu": round(mfu, 4) if mfu is not None else None,  # issued-FLOPs
        "model_mfu": round(model_mfu, 4) if model_mfu is not None else None,
        "chain_tflops": round(total_flops / 1e12, 1) if total_flops else None,
        "config": (f"{NUM_FRAMES}f@{HEIGHT}x{WIDTH},{STEPS}-step DDIM, "
                   f"dual CFG{', e2e' if E2E else ', denoise-only'}"),
    }))


if __name__ == "__main__":
    main()
