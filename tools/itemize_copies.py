"""Itemize the denoise step's copy class (VERDICT r4 #6).

The r4 trace shows copies at ~22.5 ms/step (12.5%) — the largest
non-floor op class — previously dismissed as "mostly inherent lane
retiling" without receipts. This tool produces them: it captures a
device trace of the fused dual-CFG denoise step (same program as
tools/profile_step.py / bench.py), pulls every `copy*` / `*transpose*`
device op >= THRESH_MS, and cross-references each against the optimized
HLO text to recover its tensor shape, layout change, producer
(operand) and consumers (users) — enough to judge per copy whether it
is inherent (lane/sublane re-tiling between ops that need different
layouts) or removable (a layout mismatch XLA could have avoided).

Usage: python tools/itemize_copies.py [steps]   (env: COPY_THRESH_MS)
"""

import glob
import gzip
import json
import os
import re
import sys


def _hlo_index(hlo_text):
    """name -> (result_ty, op_kind, operand_names) for every instruction,
    plus name -> [user names]. HLO lines look like:
      %copy.123 = bf16[16,1536,320]{2,1,0:T(8,128)(2,1)} copy(%fusion.4), ...
    """
    defs = {}
    users = {}
    line_re = re.compile(
        r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*([^=]+?)\s+([\w\-]+)\((.*)$")
    for line in hlo_text.splitlines():
        m = line_re.match(line)
        if not m:
            continue
        name, rty, kind, rest = m.groups()
        operands = re.findall(r"%([\w.\-]+)", rest.split(
            "metadata=")[0].split("backend_config")[0])
        defs[name] = (rty.strip(), kind, operands)
        for op in operands:
            users.setdefault(op, []).append(name)
    return defs, users


def _describe(name, defs, users):
    rty, kind, operands = defs.get(name, ("?", "?", []))
    prod = []
    for op in operands:
        oty, okind, _ = defs.get(op, ("?", "?", []))
        prod.append(f"{op}<{okind}> {oty.split('{')[0]}")
    cons = []
    for u in users.get(name, [])[:3]:
        uty, ukind, _ = defs.get(u, ("?", "?", []))
        cons.append(f"{u}<{ukind}>")
    return rty, " | ".join(prod) or "?", ", ".join(cons) or "?"


def main():
    from insv2v_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from insv2v_tpu.diffusion.samplers import dual_cfg_eps
    from insv2v_tpu.diffusion.schedules import (DiffusionSchedule,
                                                make_sampler_tables)
    from insv2v_tpu.models.unet3d import UNet3DConditionModel, UNetConfig

    thresh_ms = float(os.environ.get("COPY_THRESH_MS", "1.0"))
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

    compiled = one_step.lower(params, lat, cond, tc, tu).compile()
    hlo = compiled.as_text()
    defs, users = _hlo_index(hlo)
    print(f"# hlo: {len(defs)} instructions indexed", file=sys.stderr)

    one_step(params, lat, cond, tc, tu).block_until_ready()  # warm
    trace_dir = "/tmp/jaxtrace_copies"
    os.system(f"rm -rf {trace_dir}")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    with jax.profiler.trace(trace_dir, create_perfetto_trace=True):
        for _ in range(n):
            one_step(params, lat, cond, tc, tu).block_until_ready()

    traces = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not traces:
        print("no perfetto trace produced")
        return
    with gzip.open(traces[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    agg = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = str(pid_names.get(e.get("pid"), ""))
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        name = e.get("name", "?")
        agg[name] = agg.get(name, 0.0) + e.get("dur", 0.0)

    total = sum(agg.values())
    copies = {k: v for k, v in agg.items()
              if k.split(".")[0] in ("copy", "transpose", "bitcast-convert")
              or k.startswith("copy")}
    csum = sum(copies.values())
    print(f"# device total {total/1e3/n:.1f} ms/step; copy-class "
          f"{csum/1e3/n:.1f} ms/step ({100*csum/total:.1f}%) across "
          f"{len(copies)} distinct ops")
    print(f"# itemization (>= {thresh_ms} ms/step):")
    for name, dur in sorted(copies.items(), key=lambda kv: -kv[1]):
        ms = dur / 1e3 / n
        if ms < thresh_ms:
            continue
        rty, prod, cons = _describe(name, defs, users)
        print(f"{ms:8.3f} ms/step  {name}")
        print(f"          result: {rty}")
        print(f"          from:   {prod}")
        print(f"          to:     {cons}")


if __name__ == "__main__":
    main()
