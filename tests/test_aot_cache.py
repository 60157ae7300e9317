"""AOT executable cache (utils/aot_cache.py): roundtrip, lazy wrapper,
shape-drift fallback. CPU-backend serialization works in this image
(feature-flag warnings aside, same host => same flags)."""

import os

import jax
import jax.numpy as jnp
import numpy as np


def test_load_or_compile_roundtrip(tmp_path, monkeypatch):
    from insv2v_tpu.utils import aot_cache

    monkeypatch.setattr(aot_cache, "AOT_DIR", str(tmp_path))
    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((8, 8))
    c1 = aot_cache.load_or_compile("t1", f, x)
    assert c1._aot_compiled is not None  # really compiled AOT
    np.testing.assert_allclose(np.asarray(c1(x)), 3.0)
    files = os.listdir(tmp_path)
    assert len(files) == 1 and files[0].endswith(".pjrt")
    # second load deserializes from disk (same key) and computes the same
    # thing (possibly via the safe fallback on the 8-device test mesh —
    # the deserialized executable pins the builder's device layout)
    c2 = aot_cache.load_or_compile("t1", f, x)
    assert c2._aot_compiled is not None
    np.testing.assert_allclose(np.asarray(c2(x)), 3.0)


def test_key_separates_shapes_and_names(tmp_path, monkeypatch):
    from insv2v_tpu.utils import aot_cache

    monkeypatch.setattr(aot_cache, "AOT_DIR", str(tmp_path))
    f = jax.jit(lambda x: x + 1)
    aot_cache.load_or_compile("a", f, jnp.ones((4,)))
    aot_cache.load_or_compile("a", f, jnp.ones((8,)))
    aot_cache.load_or_compile("b", f, jnp.ones((4,)))
    assert len(os.listdir(tmp_path)) == 3


def test_lazy_aot_static_kwargs_and_fallback(tmp_path, monkeypatch):
    from insv2v_tpu.utils import aot_cache

    monkeypatch.setattr(aot_cache, "AOT_DIR", str(tmp_path))

    def g(x, *, gain=1.0):
        return x * gain

    jitted = jax.jit(g, static_argnames=("gain",))
    wrapped = aot_cache.lazy_aot("g", jitted, static_names=("gain",))
    x4 = jnp.full((4,), 2.0)
    np.testing.assert_allclose(np.asarray(wrapped(x4, gain=3.0)), 6.0)
    np.testing.assert_allclose(np.asarray(wrapped(x4, gain=2.0)), 4.0)
    # distinct static values => distinct cache entries
    assert len(os.listdir(tmp_path)) == 2
    # a new shape lazily gets its own entry; result stays correct
    x8 = jnp.full((8,), 2.0)
    np.testing.assert_allclose(np.asarray(wrapped(x8, gain=3.0)), 6.0)


def test_extra_separates_closure_constants(tmp_path, monkeypatch):
    """Closure constants are invisible to the aval-based key: callers
    pass them via ``extra`` — two jits differing only in a baked
    constant must NOT share an executable (the r4 self-review found a
    stale num_steps=2 sampler served for a num_steps=5 call)."""
    from insv2v_tpu.utils import aot_cache

    monkeypatch.setattr(aot_cache, "AOT_DIR", str(tmp_path))

    def make(nsteps):
        return jax.jit(lambda x: x * nsteps)

    x = jnp.full((4,), 2.0)
    a = aot_cache.lazy_aot("w", make(2), extra=(2,))
    b = aot_cache.lazy_aot("w", make(5), extra=(5,))
    np.testing.assert_allclose(np.asarray(a(x)), 4.0)
    np.testing.assert_allclose(np.asarray(b(x)), 10.0)  # not the stale 4.0
    assert len(os.listdir(tmp_path)) == 2


def test_prune_respects_cap_and_orphans(tmp_path, monkeypatch):
    from insv2v_tpu.utils import aot_cache

    monkeypatch.setattr(aot_cache, "AOT_DIR", str(tmp_path))
    names = ["a.pjrt", "b.pjrt", "c.pjrt"]
    for i, n in enumerate(names):
        p = tmp_path / n
        p.write_bytes(b"x" * 100)
        os.utime(p, (i, i))  # a oldest
    orphan = tmp_path / "d.pjrt.tmp123"
    orphan.write_bytes(b"x" * 100)
    os.utime(orphan, (0, 0))  # stale (>1h old)
    aot_cache._prune(keep=str(tmp_path / "c.pjrt"), max_bytes=250)
    left = sorted(os.listdir(tmp_path))
    assert "d.pjrt.tmp123" not in left  # stale orphan removed
    assert "c.pjrt" in left and "a.pjrt" not in left  # oldest pruned


def test_disabled_env_returns_jitted(monkeypatch):
    from insv2v_tpu.utils import aot_cache

    monkeypatch.setattr(aot_cache, "_DISABLED", True)
    f = jax.jit(lambda x: x)
    assert aot_cache.load_or_compile("x", f, jnp.ones(3)) is f
    assert aot_cache.lazy_aot("x", f) is f


def test_trainer_aot_step(tmp_path, monkeypatch):
    """INSV2V_AOT_TRAIN=1 serves the compiled train step from the AOT
    cache (VERDICT r4 #1: the accum-256 compile is 330-360 s on every
    launch); off by default; the served step trains motion params."""
    from insv2v_tpu.utils import aot_cache

    monkeypatch.setattr(aot_cache, "AOT_DIR", str(tmp_path))
    from insv2v_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
    from insv2v_tpu.models.unet3d import UNet3DConditionModel, UNetConfig
    from insv2v_tpu.models.vae import AutoencoderKL, VaeConfig
    from insv2v_tpu.training.trainer import TrainConfig, Trainer

    unet = UNet3DConditionModel(cfg=UNetConfig.tiny(in_channels=8,
                                                    out_channels=4))
    vae = AutoencoderKL(cfg=VaeConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                                      z_channels=4, embed_dim=4,
                                      resolution=16))
    clip = ClipTextEncoder(ClipTextConfig(vocab_size=50, hidden_size=12,
                                          num_layers=1, num_heads=2,
                                          intermediate_size=24))
    k = jax.random.PRNGKey(0)
    unet_p = unet.init(k, jnp.zeros((1, 2, 8, 8, 8)),
                       jnp.zeros((1,), jnp.int32),
                       jnp.zeros((1, 77, 12)))["params"]
    vae_p = vae.init(k, jnp.zeros((1, 16, 16, 3)),
                     sample_posterior=False)["params"]
    clip_p = clip.init(k, jnp.zeros((1, 77), jnp.int32))["params"]
    trainer = Trainer(unet, vae, clip, TrainConfig(accumulate_grad_batches=2))

    def make_state():
        copy = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), t)
        return trainer.place_state(
            trainer.create_state(copy(unet_p), copy(vae_p), copy(clip_p)))

    rs = np.random.RandomState(0)
    n = 2 * jax.device_count()
    batch = {
        "input_video": jnp.asarray(rs.randn(n, 2, 16, 16, 3), jnp.float32),
        "edited_video": jnp.asarray(rs.randn(n, 2, 16, 16, 3), jnp.float32),
        "prompt_ids": jnp.asarray(rs.randint(0, 50, (n, 77)), jnp.int32),
    }
    rng = jax.random.PRNGKey(1)

    # default off: aot_step returns the plain jitted step
    state = make_state()
    assert trainer.aot_step(state, batch, rng) is trainer.jitted_step(state)

    monkeypatch.setenv("INSV2V_AOT_TRAIN", "1")
    step = trainer.aot_step(state, batch, rng)
    assert getattr(step, "_aot_compiled", None) is not None
    assert any(f.endswith(".pjrt") for f in os.listdir(tmp_path))
    new_state, metrics = step(state, batch, rng)
    assert np.isfinite(float(metrics["train_loss"]))
    assert int(new_state.step) == 1
    # warm path: a fresh load deserializes the same entry (count unchanged)
    n_entries = len(os.listdir(tmp_path))
    step2 = trainer.aot_step(new_state, batch, rng)
    assert getattr(step2, "_aot_compiled", None) is not None
    assert len(os.listdir(tmp_path)) == n_entries
    s2, m2 = step2(new_state, batch, rng)
    assert int(s2.step) == 2 and np.isfinite(float(m2["train_loss"]))


def test_pipeline_aot_env_smoke(tmp_path, monkeypatch):
    """VideoEditor with INSV2V_AOT_PIPELINE=1 produces the same frames as
    without (tiny model, CPU)."""
    from insv2v_tpu.utils import aot_cache

    monkeypatch.setattr(aot_cache, "AOT_DIR", str(tmp_path))
    from insv2v_tpu.diffusion.pipeline import VideoEditor
    from insv2v_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
    from insv2v_tpu.models.unet3d import UNet3DConditionModel, UNetConfig
    from insv2v_tpu.models.vae import AutoencoderKL, VaeConfig
    from insv2v_tpu.text.tokenizer import HashTokenizer

    class TinyTokenizer(HashTokenizer):
        vocab_size = 100
        sot_id = 98
        eot_id = 99

    unet = UNet3DConditionModel(cfg=UNetConfig.tiny(in_channels=8,
                                                    out_channels=4))
    vae = AutoencoderKL(cfg=VaeConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                                      z_channels=4, embed_dim=4,
                                      resolution=32))
    clip = ClipTextEncoder(ClipTextConfig(vocab_size=100, hidden_size=12,
                                          num_layers=1, num_heads=2,
                                          intermediate_size=24))
    k = jax.random.PRNGKey(0)
    params = {
        "unet": unet.init(k, jnp.zeros((1, 2, 16, 16, 8)),
                          jnp.zeros((1,), jnp.int32),
                          jnp.zeros((1, 77, 12)))["params"],
        "vae": vae.init(k, jnp.zeros((1, 32, 32, 3)),
                        sample_posterior=False)["params"],
        "text": clip.init(k, jnp.zeros((1, 77), jnp.int32))["params"],
    }
    frames = np.clip(np.random.RandomState(0).randn(4, 32, 32, 3) * 0.3,
                     -1, 1).astype(np.float32)

    def run():
        ed = VideoEditor(unet, vae, clip, params, tokenizer=TinyTokenizer(),
                         num_steps=2, params_dtype=None)
        return ed(frames, "make it snowy", frames_per_window=4,
                  num_ref_frames=2, seed=0)

    ref = run()
    monkeypatch.setenv("INSV2V_AOT_PIPELINE", "1")
    out = run()  # first: compiles + serializes
    out2 = run()  # second: deserializes from disk
    np.testing.assert_allclose(out, ref, atol=1e-5)
    np.testing.assert_allclose(out2, ref, atol=1e-5)
