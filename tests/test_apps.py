"""App-level smoke tests: config->factory->CLI wiring on tiny configs."""

import json
import os

import numpy as np
import pytest

TINY_YAML = """
expt_dir: {tmp}/experiments
expt_name: tiny
trainer:
  max_steps: 2
  accumulate_grad_batches: 2
  micro_batch_size: 1
  lr: 1.0e-3
  loss_fn: l2
  cond_image_dropout: 0.1
  prompt_type: edit_prompt
  scale_factor: 0.18215
  checkpoint_every: 2
diffusion:
  beta_schedule: scaled_linear
  num_train_timesteps: 1000
  beta_start: 0.00085
  beta_end: 0.012
unet:
  target: modules.video_unet_temporal.unet.UNet3DConditionModel
  params:
    in_channels: 8
    out_channels: 4
    attention_head_dim: 2
    block_out_channels: [8, 16, 16, 16]
    cross_attention_dim: 768
    norm_num_groups: 4
    motion_module_kwargs:
      num_attention_heads: 2
      temporal_position_encoding_max_len: 8
vae:
  target: modules.kl_autoencoder.autoencoder.AutoencoderKL
  params:
    embed_dim: 4
    ddconfig:
      z_channels: 4
      ch: 8
      ch_mult: [1, 2]
      num_res_blocks: 1
      resolution: 32
data:
  train:
    target: dataset.videoP2P.VideoPromptToPrompt
    params:
      root_dirs: [{tmp}/ptp]
      num_frames: 2
  val:
    target: dataset.videoP2P.VideoPromptToPrompt
    params:
      root_dirs: [{tmp}/ptp]
      num_frames: 2
text_model:
  target: modules.openclip.modules.FrozenCLIPEmbedder
  params:
    freeze: true
"""


def write_tiny_config(tmp_path):
    cfg = str(tmp_path / "tiny.yaml")
    with open(cfg, "w") as f:
        f.write(TINY_YAML.format(tmp=tmp_path))
    return cfg


def make_ptp_data(tmp_path, n_samples=2):
    import cv2

    root = tmp_path / "ptp"
    rs = np.random.RandomState(0)
    for s in range(n_samples):
        d = root / f"sample_{s:03d}"
        (d / "image").mkdir(parents=True)
        for which in (0, 1):
            for i in range(16):
                cv2.imwrite(str(d / "image" / f"1_{which}_{i:04d}.jpg"),
                            (rs.rand(16, 16, 3) * 255).astype(np.uint8))
        with open(d / "metadata.jsonl", "w") as f:
            f.write(json.dumps({"seed": 1, "sim_0": 0.5, "sim_1": 0.5,
                                "sim_dir": 0.5, "sim_image": 0.9}) + "\n")
        with open(d / "prompt.json", "w") as f:
            json.dump({"input": "a", "output": "b", "edit": "c"}, f)
    return str(root)


def test_factory_builds_reference_config():
    from insv2v_tpu.utils.config import load_config
    from insv2v_tpu.utils.factory import get_models

    cfg = load_config("configs/instruct_v2v.yaml")
    models = get_models(cfg)
    assert models["unet"].cfg.block_out_channels == (320, 640, 1280, 1280)
    assert models["unet"].cfg.motion_max_seq_length == 32
    assert models["vae"].cfg.ch_mult == (1, 2, 4, 4)
    assert models["text_model"].cfg.hidden_size == 768


def test_config_interpolation(tmp_path):
    from insv2v_tpu.utils.config import load_config

    p = tmp_path / "c.yaml"
    p.write_text("a: x\nb: ${a}/y\nnested:\n  c: ${b}/z\n")
    cfg = load_config(str(p))
    assert cfg["b"] == "x/y"
    assert cfg["nested"]["c"] == "x/y/z"


def _patch_tiny_text_model(monkeypatch):
    from insv2v_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
    from insv2v_tpu.utils import factory
    from insv2v_tpu.utils.registry import _REGISTRY

    build = lambda **kw: ClipTextEncoder(ClipTextConfig(
        vocab_size=49408, hidden_size=768, num_layers=1, num_heads=4,
        intermediate_size=32))
    monkeypatch.setattr(factory, "build_text_model", build)
    monkeypatch.setitem(_REGISTRY, "modules.openclip.modules.FrozenCLIPEmbedder",
                        build)


@pytest.mark.slow
def test_edit_video_cli_smoke(tmp_path, monkeypatch):
    import cv2

    cfg = write_tiny_config(tmp_path)
    _patch_tiny_text_model(monkeypatch)
    mp4 = str(tmp_path / "in.mp4")
    vw = cv2.VideoWriter(mp4, cv2.VideoWriter_fourcc(*"mp4v"), 8, (48, 48))
    rs = np.random.RandomState(0)
    for _ in range(8):
        vw.write((rs.rand(48, 48, 3) * 255).astype(np.uint8))
    vw.release()

    from insv2v_tpu.apps import edit_video

    out = str(tmp_path / "out.gif")
    edit_video.main([
        "--video", mp4, "--prompt", "make it snowy", "--output", out,
        "--config", cfg, "--allow-random-weights", "--image-size", "32",
        "--num-frames", "6", "--frames-in-batch", "4", "--num-ref-frames", "2",
        "--steps", "2", "--sampling-fps", "8",
    ])
    assert os.path.exists(out)
    from insv2v_tpu.utils.media import load_gif

    gif = load_gif(out)
    assert gif.shape[0] == 6 and gif.shape[2] == 64  # original|edited concat


@pytest.mark.slow
def test_run_loveu_cli_smoke(tmp_path, monkeypatch):
    import cv2

    cfg = write_tiny_config(tmp_path)
    _patch_tiny_text_model(monkeypatch)
    # tiny LOVEU fixture: one DAVIS video + CSV
    (tmp_path / "DAVIS_480p" / "480p_videos").mkdir(parents=True)
    vw = cv2.VideoWriter(str(tmp_path / "DAVIS_480p/480p_videos/bear.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 8, (48, 48))
    rs = np.random.RandomState(0)
    for _ in range(8):
        vw.write((rs.rand(48, 48, 3) * 255).astype(np.uint8))
    vw.release()
    with open(tmp_path / "LOVEU-TGVE-2023_Dataset.csv", "w") as f:
        f.write("Video name,Original,Style,Object,Background,Multiple\n")
        f.write("DAVIS Videos:,,,,,\n")
        f.write("bear,a bear,styled bear,a panda,bear on moon,panda on moon\n")

    from insv2v_tpu.apps import run_loveu_tgve

    out_dir = str(tmp_path / "outputs")
    run_loveu_tgve.main([
        "--config-path", cfg, "--data-dir", str(tmp_path),
        "--output-dir", out_dir, "--allow-random-weights",
        "--image-size", "32", "--num-frames", "4", "--steps", "2",
        "--frames-in-batch", "4", "--num-ref-frames", "2",
        "--text-cfg", "7.5", "--video-cfg", "1.2",
    ])
    gifs = [f for f in os.listdir(out_dir) if f.endswith(".gif")]
    assert len(gifs) == 4  # one per edit type
    assert os.path.exists(os.path.join(out_dir, "throughput.json"))
    # idempotent resume: second run produces no new work
    run_loveu_tgve.main([
        "--config-path", cfg, "--data-dir", str(tmp_path),
        "--output-dir", out_dir, "--allow-random-weights",
        "--image-size", "32", "--num-frames", "4", "--steps", "2",
        "--frames-in-batch", "4", "--num-ref-frames", "2",
        "--text-cfg", "7.5", "--video-cfg", "1.2",
    ])
    metrics = json.load(open(os.path.join(out_dir, "throughput.json")))
    assert metrics["videos"] == 0  # all skipped on resume


def _write_loveu_fixture(tmp_path, name="bear"):
    import cv2

    (tmp_path / "DAVIS_480p" / "480p_videos").mkdir(parents=True)
    vw = cv2.VideoWriter(str(tmp_path / f"DAVIS_480p/480p_videos/{name}.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 8, (48, 48))
    rs = np.random.RandomState(0)
    for _ in range(8):
        vw.write((rs.rand(48, 48, 3) * 255).astype(np.uint8))
    vw.release()
    with open(tmp_path / "LOVEU-TGVE-2023_Dataset.csv", "w") as f:
        f.write("Video name,Original,Style,Object,Background,Multiple\n")
        f.write("DAVIS Videos:,,,,,\n")
        f.write(f"{name},a bear,styled bear,a panda,bear on moon,"
                "panda on moon\n")


def test_run_loveu_prompt_source(tmp_path, monkeypatch):
    """--prompt-source must drive which prompt is fed: 'edit' uses the
    edit-instruction dict (the reference's default benchmark mode,
    insv2v_run_loveu_tgve.py:100-111), 'original' the CSV captions, and
    a missing dict falls back to captions with a warning."""
    _write_loveu_fixture(tmp_path)
    edit_dict = {"bear": {"edit_style": "make it impressionist",
                          "edit_object": "turn the bear into a panda",
                          "edit_background": "set it on the moon",
                          "edit_multiple": "panda, moon, impressionist"}}
    with open(tmp_path / "loveu_tgve_edit_prompt_dict.json", "w") as f:
        json.dump(edit_dict, f)

    from insv2v_tpu.apps import edit_video, run_loveu_tgve

    seen = []

    def fake_make_editor(*a, **k):
        def editor(frames, prompts, **kw):
            seen.extend(prompts)
            return np.zeros((len(prompts),) + frames.shape, np.float32)

        return editor

    monkeypatch.setattr(edit_video, "make_editor", fake_make_editor)
    common = ["--config-path", "unused.yaml", "--data-dir", str(tmp_path),
              "--allow-random-weights", "--image-size", "32",
              "--num-frames", "4", "--steps", "2",
              "--frames-in-batch", "4", "--num-ref-frames", "2"]

    out_edit = str(tmp_path / "out_edit")
    run_loveu_tgve.main(common + ["--output-dir", out_edit,
                                  "--prompt-source", "edit"])
    assert set(seen) == {v for v in edit_dict["bear"].values()}
    used = json.load(open(os.path.join(out_edit, "prompts_used.json")))
    assert used[[t for t in used if "style" in t][0]] == "make it impressionist"

    seen.clear()
    out_orig = str(tmp_path / "out_orig")
    run_loveu_tgve.main(common + ["--output-dir", out_orig,
                                  "--prompt-source", "original"])
    assert set(seen) == {"styled bear", "a panda", "bear on moon",
                         "panda on moon"}

    # no local dict: the packaged copy is found instead, but it has no
    # 'bear' entry, so the per-video fallback feeds the caption columns
    seen.clear()
    os.remove(tmp_path / "loveu_tgve_edit_prompt_dict.json")
    out_fb = str(tmp_path / "out_fb")
    run_loveu_tgve.main(common + ["--output-dir", out_fb,
                                  "--prompt-source", "edit"])
    assert set(seen) == {"styled bear", "a panda", "bear on moon",
                         "panda on moon"}


def test_run_loveu_packaged_edit_dict(tmp_path, monkeypatch):
    """With NO dict on disk, --prompt-source edit must find the benchmark
    data file packaged in insv2v_tpu/data/ (VERDICT r4 #5: the paper's
    benchmark mode works out of the box) and feed its edit instructions
    for a real LOVEU video name."""
    _write_loveu_fixture(tmp_path, name="gold-fish")

    from insv2v_tpu.apps import edit_video, run_loveu_tgve

    seen = []

    def fake_make_editor(*a, **k):
        def editor(frames, prompts, **kw):
            seen.extend(prompts)
            return np.zeros((len(prompts),) + frames.shape, np.float32)

        return editor

    monkeypatch.setattr(edit_video, "make_editor", fake_make_editor)
    run_loveu_tgve.main([
        "--config-path", "unused.yaml", "--data-dir", str(tmp_path),
        "--allow-random-weights", "--image-size", "32",
        "--num-frames", "4", "--steps", "2", "--frames-in-batch", "4",
        "--num-ref-frames", "2", "--output-dir", str(tmp_path / "out"),
        "--prompt-source", "edit"])

    import insv2v_tpu.data as data_pkg

    packaged = os.path.join(os.path.dirname(data_pkg.__file__),
                            "loveu_tgve_edit_prompt_dict.json")
    expected = json.load(open(packaged))["gold-fish"]
    assert set(seen) == set(expected.values())
    assert "make the style impressionist" in seen  # known dict content


@pytest.mark.slow
def test_train_cli_smoke(tmp_path, monkeypatch):
    cfg = write_tiny_config(tmp_path)
    make_ptp_data(tmp_path)
    from insv2v_tpu.apps import train

    # tiny text model instead of full CLIP (the factory builds ViT-L)
    from insv2v_tpu.models.clip_text import ClipTextConfig, ClipTextEncoder
    from insv2v_tpu.utils import factory

    monkeypatch.setattr(
        factory, "build_text_model",
        lambda **kw: ClipTextEncoder(ClipTextConfig(
            vocab_size=49408, hidden_size=768, num_layers=1, num_heads=4,
            intermediate_size=32)),
    )
    from insv2v_tpu.utils.registry import _REGISTRY

    monkeypatch.setitem(_REGISTRY, "modules.openclip.modules.FrozenCLIPEmbedder",
                        factory.build_text_model)

    train.main(["--config", cfg, "--allow-random-weights", "--max-steps", "2"])
    expt = tmp_path / "experiments" / "tiny"
    assert (expt / "metrics.jsonl").exists()
    lines = [json.loads(l) for l in open(expt / "metrics.jsonl")]
    assert lines[-1]["step"] == 2
    ckpts = [d for d in os.listdir(expt) if d.startswith("step_")]
    assert ckpts, os.listdir(expt)

    # resume: restart from the checkpoint and continue to step 4
    train.main(["--config", cfg, "--allow-random-weights", "--max-steps", "4",
                "-r"])
    lines = [json.loads(l) for l in open(expt / "metrics.jsonl")]
    steps = [l["step"] for l in lines if "train_loss" in l]
    assert steps[-1] == 4
    assert 3 in steps and 1 in steps  # first run did 1-2, resumed run 3-4


@pytest.mark.slow
@pytest.mark.parametrize("ptp_version", ["v2", "v1"])
def test_generate_dataset_cli_smoke(tmp_path, ptp_version):
    prompts = [{"input": "a cat walking", "output": "a dog walking",
                "edit": "turn the cat into a dog"}]
    pfile = str(tmp_path / "prompts.json")
    with open(pfile, "w") as f:
        json.dump(prompts, f)
    out_dir = str(tmp_path / "gen")

    from insv2v_tpu.apps import generate_dataset

    generate_dataset.main([
        "--prompts", pfile, "--output-dir", out_dir, "--tiny",
        "--allow-random-weights", "--no-clip-filter",
        "--num-samples", "1", "--max-attempts", "1",
        "--steps", "3", "--num-frames", "2", "--latent-size", "8",
        "--ptp-version", ptp_version,
    ])
    sample = os.path.join(out_dir, "sample_000000")
    assert os.path.exists(os.path.join(sample, "prompt.json"))
    assert os.path.exists(os.path.join(sample, "metadata.jsonl"))
    imgs = os.listdir(os.path.join(sample, "image"))
    # 2 frames x 2 videos (old/new)
    assert len([i for i in imgs if i.endswith(".jpg")]) == 4
    # variant provenance is recorded per attempt (r4 advisor)
    records = [json.loads(l) for l in open(os.path.join(sample,
                                                        "metadata.jsonl"))]
    assert all(r["ptp_version"] == ptp_version for r in records)
    # the generated folder is loadable by the training dataset
    from insv2v_tpu.data.datasets import VideoPromptToPromptDataset

    ds = VideoPromptToPromptDataset.__new__(VideoPromptToPromptDataset)
    seeds = ds._accepted_seeds(sample)
    assert len(seeds) == 1
    # resuming with the OTHER variant warns about mixing (r4 advisor)
    other = "v1" if ptp_version == "v2" else "v2"
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        generate_dataset.main([
            "--prompts", pfile, "--output-dir", out_dir, "--tiny",
            "--allow-random-weights", "--no-clip-filter",
            "--num-samples", "2", "--max-attempts", "1",
            "--steps", "3", "--num-frames", "2", "--latent-size", "8",
            "--ptp-version", other,
        ])
    assert "mix PTP variants" in buf.getvalue()


def test_frac_phase_steps_reference_semantics():
    """Phase boundaries quantize like the reference's `i < frac*steps`
    (fractional step INCLUDED): sa_end=0.35 @ 30 steps is 11 steps, not
    int()'s 10 (r4 advisor — half the data-gen grid hit the off-by-one)."""
    from insv2v_tpu.diffusion.ptp_sampler import frac_phase_steps

    assert frac_phase_steps(0.35, 30) == 11
    assert frac_phase_steps(0.3, 30) == 9     # exact products unchanged
    assert frac_phase_steps(0.45, 30) == 14
    assert frac_phase_steps(0.65, 30) == 20   # 19.5 -> 20
    assert frac_phase_steps(1.0, 30) == 30
    assert frac_phase_steps(0.0, 30) == 0
    # the literal-count form matches the reference comparison bit-for-bit
    for frac in (0.3, 0.35, 0.4, 0.45, 0.6, 0.65, 0.7, 0.75, 0.8, 0.85):
        for s in (6, 20, 30, 50):
            assert frac_phase_steps(frac, s) == sum(
                1 for i in range(s) if i < frac * s)


@pytest.mark.slow
def test_tpu_parity_cpu_smoke():
    """tools/tpu_parity.py --small must pass on CPU (interpret-mode
    kernels) — the numerics gate's smoke coverage (r4 advisor: the
    docstring claimed this test existed)."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "tpu_parity.py"),
         "--small"],
        capture_output=True, text=True, timeout=1500, env=env, cwd=repo)
    assert proc.returncode == 0, f"rc={proc.returncode}\n{proc.stdout}\n{proc.stderr}"
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["failures"] == 0
    assert {c["name"] for c in result["checks"]} >= {
        "flash_l0", "flash_l1", "flash_vjp", "ff_resident", "ff_streamed",
        "ff_vjp", "packed_xla"}
