"""Capture a device trace of the fused denoise step and print the top ops.

Writes a perfetto trace (plain JSON.gz — no tensorboard needed) via
jax.profiler, then aggregates device-side op durations. Per-op wall times
through the axon relay are unreliable for *host* timing, but the xplane
device events are recorded on-device, so their relative shares are
meaningful even if absolute times skew.

Usage: python tools/profile_step.py [steps]
"""

import glob
import gzip
import json
import os
import sys


def main():
    from insv2v_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from insv2v_tpu.diffusion.samplers import dual_cfg_eps
    from insv2v_tpu.diffusion.schedules import DiffusionSchedule, make_sampler_tables
    from insv2v_tpu.models.unet3d import UNet3DConditionModel, UNetConfig

    cfg = UNetConfig()
    model = UNet3DConditionModel(cfg=cfg, dtype=jnp.bfloat16)
    h, w = 32, 48
    rng = jax.random.PRNGKey(0)
    shapes = jax.eval_shape(
        lambda k: model.init(
            k, jnp.zeros((3, 16, h, w, 8), jnp.bfloat16),
            jnp.zeros((3,), jnp.int32),
            jnp.zeros((3, 77, 768), jnp.bfloat16)), rng)
    params = jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.02, jnp.bfloat16), shapes)["params"]

    sched = DiffusionSchedule.create()
    tables = make_sampler_tables(sched, 10, kind="ddim")

    def unet_apply(p, s, t, c, vsi):
        return model.apply({"params": p}, s, t, c, video_start_index=vsi)

    @jax.jit
    def one_step(p, lat, cond, tcc, tuu):
        return dual_cfg_eps(unet_apply, p, lat, cond, tables.timesteps[0],
                            tuu, tcc, 7.5, 1.2, jnp.int32(0))

    lat = jax.random.normal(rng, (1, 16, h, w, 4), jnp.float32)
    cond = jax.random.normal(rng, (1, 16, h, w, 4), jnp.float32)
    tc = jax.random.normal(rng, (1, 77, 768), jnp.bfloat16)
    tu = jnp.zeros_like(tc)

    one_step(params, lat, cond, tc, tu).block_until_ready()  # compile

    trace_dir = "/tmp/jaxtrace"
    os.system(f"rm -rf {trace_dir}")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    with jax.profiler.trace(trace_dir, create_perfetto_trace=True):
        for _ in range(n):
            one_step(params, lat, cond, tc, tu).block_until_ready()

    traces = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not traces:
        print("no perfetto trace produced; files:",
              glob.glob(f"{trace_dir}/**/*", recursive=True))
        return
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-side complete events: aggregate duration by name
    agg = {}
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in str(pname) and "device" not in str(pname).lower():
            continue
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e.get("dur", 0.0)
    total = sum(agg.values())
    print(f"# {len(events)} events, device total {total/1e3:.1f} ms "
          f"across {n} steps")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur/1e3/n:9.3f} ms/step  {100*dur/total:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
