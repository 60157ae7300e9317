"""Device-trace ONE training microbatch (fwd+bwd+update) and print top ops.

VERDICT r3 #9: attribute the 0.219 s/microbatch train step — how much is
the remat-driven recompute of the flash/fused-FF forwards inside the XLA
backward, vs convs, vs optimizer. Same aggregation as profile_step.py
(device-side xplane events, so shares are meaningful through the relay).

Usage: python tools/profile_train.py [accum] [reps]
env: TRAIN_FRAMES/TRAIN_SIZE/TRAIN_OPT as bench_train.py.
"""

import dataclasses
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

    from insv2v_tpu.training.trainer import (Trainer, TrainConfig,
                                             motion_param_mask)
    from insv2v_tpu.utils.config import load_config
    from insv2v_tpu.utils.factory import get_models

    frames = int(os.environ.get("TRAIN_FRAMES", "16"))
    size = int(os.environ.get("TRAIN_SIZE", "256"))
    accum = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    cfg = load_config("configs/instruct_v2v.yaml")
    models = get_models(cfg, dtype=jnp.bfloat16)
    unet = dataclasses.replace(
        models["unet"], cfg=dataclasses.replace(models["unet"].cfg, remat=True))
    trainer = Trainer(unet, models["vae"], models["text_model"],
                      TrainConfig(optimizer=os.environ.get("TRAIN_OPT",
                                                           "adam8bit"),
                                  accumulate_grad_batches=accum))

    rng = jax.random.PRNGKey(0)
    lat = size // 8
    shapes = {
        "unet": jax.eval_shape(
            lambda k: unet.init(k, jnp.zeros((1, 2, lat, lat, 8), jnp.bfloat16),
                                jnp.zeros((1,), jnp.int32),
                                jnp.zeros((1, 77, 768), jnp.bfloat16)), rng),
        "vae": jax.eval_shape(
            lambda k: models["vae"].init(
                k, jnp.zeros((1, 32, 32, 3), jnp.bfloat16),
                jax.random.PRNGKey(1)), rng),
        "text": jax.eval_shape(
            lambda k: models["text_model"].init(
                k, jnp.zeros((1, 77), jnp.int32)), rng),
    }

    def rand_tree(tree, dtype_of):
        leaves, treedef = jax.tree_util.tree_flatten(tree)

        def build():
            ks = jax.random.split(jax.random.PRNGKey(42), len(leaves))
            return jax.tree_util.tree_unflatten(treedef, [
                (0.02 * jax.random.normal(k, s.shape)).astype(dtype_of(s, i))
                for i, (k, s) in enumerate(zip(ks, leaves))])

        return jax.block_until_ready(jax.jit(build)())

    unet_shapes = shapes["unet"]["params"]
    mask_flat = jax.tree_util.tree_leaves(motion_param_mask(unet_shapes))
    unet_p = rand_tree(unet_shapes,
                       lambda s, i: s.dtype if mask_flat[i] else jnp.bfloat16)
    vae_p = rand_tree(shapes["vae"], lambda s, i: jnp.bfloat16)["params"]
    text_p = rand_tree(shapes["text"], lambda s, i: jnp.bfloat16)["params"]

    state = trainer.place_state(trainer.create_state(unet_p, vae_p, text_p))
    step_fn = trainer.jitted_step(state)

    def make_batch(seed):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        shape = (accum, frames, size, size * 3)
        return {
            "input_video": jax.random.uniform(k1, shape, jnp.bfloat16, -1, 1),
            "edited_video": jax.random.uniform(k2, shape, jnp.bfloat16, -1, 1),
            "prompt_ids": jnp.ones((accum, 77), jnp.int32),
        }

    state, m = step_fn(state, make_batch(0), rng)  # compile
    jax.block_until_ready(m)
    print("# compiled; tracing", file=sys.stderr)

    trace_dir = "/tmp/jaxtrace_train"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir, create_perfetto_trace=True):
        for i in range(reps):
            state, m = step_fn(state, make_batch(i + 1), rng)
            jax.block_until_ready(m)

    traces = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not traces:
        print("no perfetto trace produced; files:",
              glob.glob(f"{trace_dir}/**/*", recursive=True))
        return
    import re

    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    # the backward is tens of thousands of distinct fusion names at <0.3%
    # each — aggregate by op CLASS (name sans trailing digits), dropping
    # the whole-program jit_* envelope and numeric queue-lane rows that
    # double-count everything
    agg = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = str(pid_names.get(e.get("pid"), ""))
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        name = e.get("name", "?")
        if name.startswith("jit_") or name.isdigit():
            continue
        cls = re.sub(r"[.\d]+$", "", name)
        agg[cls] = agg.get(cls, 0.0) + e.get("dur", 0.0)
    total = sum(agg.values())
    nmb = reps * accum
    print(f"# {len(events)} events, device op total {total/1e3:.1f} ms "
          f"across {reps} steps x accum {accum} = {nmb} microbatches")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{dur/1e3/nmb:9.3f} ms/microbatch  {100*dur/total:5.1f}%  "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
