"""End-to-end VideoEditor integration on fixture-sized models: shapes,
determinism, window chaining, and the motion-compensated path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insv2v_tpu.diffusion.pipeline import VideoEditor
from insv2v_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
from insv2v_tpu.models.unet3d import UNet3DConditionModel, UNetConfig
from insv2v_tpu.models.vae import AutoencoderKL, VaeConfig
from insv2v_tpu.text.tokenizer import HashTokenizer


class TinyTokenizer(HashTokenizer):
    vocab_size = 100
    sot_id = 98
    eot_id = 99


@pytest.fixture(scope="module")
def editor():
    unet_cfg = UNetConfig.tiny(in_channels=8, out_channels=4)
    vae_cfg = VaeConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
                        embed_dim=4, resolution=32)
    clip_cfg = ClipTextConfig(vocab_size=100, hidden_size=12, num_layers=1,
                              num_heads=2, intermediate_size=24)
    unet = UNet3DConditionModel(cfg=unet_cfg)
    vae = AutoencoderKL(cfg=vae_cfg)
    clip = ClipTextEncoder(clip_cfg)
    k = jax.random.PRNGKey(0)
    params = {
        "unet": unet.init(k, jnp.zeros((1, 2, 16, 16, 8)),
                          jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 12)))["params"],
        "vae": vae.init(k, jnp.zeros((1, 32, 32, 3)), sample_posterior=False)["params"],
        "text": clip.init(k, jnp.zeros((1, 77), jnp.int32))["params"],
    }
    return VideoEditor(unet, vae, clip, params, tokenizer=TinyTokenizer(),
                       scheduler="ddpm", num_steps=3)


def video(f=10):
    rs = np.random.RandomState(0)
    return np.clip(rs.randn(f, 32, 32, 3) * 0.3, -1, 1).astype(np.float32)


def test_single_window_edit_shapes(editor):
    frames = video(4)
    out = editor(frames, "make it snowy", frames_per_window=6, num_ref_frames=2,
                 seed=1)
    assert out.shape == frames.shape
    assert out.dtype == np.float32
    assert np.abs(out).max() <= 1.0


def test_multi_window_chain(editor):
    frames = video(10)  # windows: [6], then refs chain (6-frame windows)
    out = editor(frames, "van gogh style", frames_per_window=6, num_ref_frames=2,
                 noise_correct_step=0.5, seed=2)
    assert out.shape == frames.shape


def test_deterministic_under_seed(editor):
    frames = video(6)
    a = editor(frames, "sunset", frames_per_window=6, seed=3)
    b = editor(frames, "sunset", frames_per_window=6, seed=3)
    np.testing.assert_allclose(a, b)
    c = editor(frames, "sunset", frames_per_window=6, seed=4)
    assert np.abs(a - c).max() > 1e-5


def test_motion_compensation_path(editor):
    frames = video(8)
    out = editor(frames, "winter scene", frames_per_window=6, num_ref_frames=2,
                 noise_correct_step=0.5, use_motion_compensation=True,
                 flow_estimator=lambda q, r: np.zeros(q.shape[:2] + (2,), np.float32),
                 seed=5)
    assert out.shape == frames.shape


def test_cfg_values_do_not_recompile_but_change_result(editor):
    frames = video(4)
    a = editor(frames, "red car", frames_per_window=6, text_cfg=7.5, seed=6)
    b = editor(frames, "red car", frames_per_window=6, text_cfg=2.0, seed=6)
    assert np.abs(a - b).max() > 1e-5


def test_flow_estimator_raft_requires_weights(monkeypatch):
    """get_flow_estimator('raft') must never silently run random-init RAFT
    (the reference always loads pretrained RAFT, flow_utils.py:134-189);
    'auto' falls back to Farneback with a warning."""
    import warnings

    import pytest

    from insv2v_tpu.utils.flow import FarnebackFlow, get_flow_estimator

    monkeypatch.delenv("INSV2V_RAFT_WEIGHTS", raising=False)
    with pytest.raises(ValueError, match="pretrained weights"):
        get_flow_estimator("raft")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        est = get_flow_estimator("auto")
    assert isinstance(est, FarnebackFlow)
    assert any("Farneback" in str(w.message) for w in caught)


def test_batched_prompts_match_solo(editor):
    """A list of edit prompts runs one B=len(prompts) denoise chain whose
    element k reproduces the solo call with the same seed (shared init
    noise + share_batch_noise step noise), incl. the DDPM stochastic path
    and multi-window chaining."""
    frames = video(10)
    kw = dict(frames_per_window=6, num_ref_frames=2, seed=3)
    batched = editor(frames, ["red car", "van gogh style"], **kw)
    assert batched.shape == (2, 10, 32, 32, 3)
    solo_a = editor(frames, "red car", **kw)
    solo_b = editor(frames, "van gogh style", **kw)
    np.testing.assert_allclose(batched[0], solo_a, atol=2e-5)
    np.testing.assert_allclose(batched[1], solo_b, atol=2e-5)
