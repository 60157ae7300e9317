"""Dataset layer tests over synthetic on-disk fixtures."""

import json
import os

import numpy as np
import pytest

from insv2v_tpu.data.datasets import (
    LoveuTgveVideoDataset,
    SingleVideoDataset,
    VideoPromptToPromptDataset,
    VideoPromptToPromptMotionAug,
)
from insv2v_tpu.utils.media import (
    from_uint8,
    load_gif,
    read_video_frames,
    save_frames,
    save_gif,
    to_uint8,
)


@pytest.fixture
def ptp_root(tmp_path):
    """One sample folder: 16-frame pair for seed 7 (passing gates) and
    seed 9 (failing gates)."""
    import cv2

    d = tmp_path / "sample_000"
    (d / "image").mkdir(parents=True)
    rs = np.random.RandomState(0)
    for seed in (7, 9):
        for which in (0, 1):
            for i in range(16):
                img = (rs.rand(32, 32, 3) * 255).astype(np.uint8)
                cv2.imwrite(str(d / "image" / f"{seed}_{which}_{i:04d}.jpg"), img)
    with open(d / "metadata.jsonl", "w") as f:
        f.write(json.dumps({"seed": 7, "sim_0": 0.5, "sim_1": 0.5,
                            "sim_dir": 0.5, "sim_image": 0.9}) + "\n")
        f.write(json.dumps({"seed": 9, "sim_0": 0.1, "sim_1": 0.5,
                            "sim_dir": 0.5, "sim_image": 0.9}) + "\n")
    with open(d / "prompt.json", "w") as f:
        json.dump({"input": "a cat", "output": "a dog", "edit": "turn cat into dog"}, f)
    return str(tmp_path)


def test_ptp_dataset_filters_and_windows(ptp_root):
    ds = VideoPromptToPromptDataset(ptp_root, num_frames=8,
                                    rng=np.random.RandomState(0))
    assert len(ds) == 1
    assert ds._accepted_seeds(ds.image_folders[0]) == [7]  # seed 9 gated out
    item = ds[0]
    assert item["input_video"].shape == (8, 32, 32, 3)
    assert item["edited_video"].shape == (8, 32, 32, 3)
    assert -1.0 <= item["input_video"].min() and item["input_video"].max() <= 1.0
    assert item["edit_prompt"] == "turn cat into dog"


def test_motion_aug_preserves_shape_and_pairing(ptp_root):
    ds = VideoPromptToPromptMotionAug(
        ptp_root, num_frames=8, zoom_ratio=1.0, max_zoom=1.25,
        translation_ratio=1.0, translation_range=(0.1, 0.2),
        rng=np.random.RandomState(3),
    )
    item = ds[0]
    assert item["input_video"].shape == (8, 32, 32, 3)
    assert item["edited_video"].shape == (8, 32, 32, 3)


def test_translation_crop_moves_content():
    ds = VideoPromptToPromptMotionAug.__new__(VideoPromptToPromptMotionAug)
    ds.num_frames = 4
    img = np.zeros((4, 32, 32, 3), np.float32)
    img[:, 10:16, 10:16] = 1.0
    out = ds.translation_crop(6.0, 6.0, img)
    assert out.shape == img.shape
    # content must shift between first and last frame
    assert np.abs(out[0] - out[-1]).max() > 0.1


@pytest.fixture
def loveu_root(tmp_path):
    import cv2

    (tmp_path / "DAVIS_480p" / "480p_videos").mkdir(parents=True)
    vw = cv2.VideoWriter(str(tmp_path / "DAVIS_480p/480p_videos/bear.mp4"),
                         cv2.VideoWriter_fourcc(*"mp4v"), 24, (64, 48))
    rs = np.random.RandomState(1)
    for _ in range(12):
        vw.write((rs.rand(48, 64, 3) * 255).astype(np.uint8))
    vw.release()
    with open(tmp_path / "LOVEU-TGVE-2023_Dataset.csv", "w") as f:
        f.write("Video name,Original,Style,Object,Background,Multiple\n")
        f.write("DAVIS Videos:,,,,,\n")
        f.write("bear,a bear walking,a bear in van gogh style,"
                "a panda walking,a bear on the moon,a panda on the moon\n")
    return str(tmp_path)


def test_loveu_dataset(loveu_root):
    ds = LoveuTgveVideoDataset(loveu_root, image_size=(32, 32))
    assert len(ds) == 1
    item = ds["bear"]
    assert item["frames"].shape == (12, 32, 32, 3)
    assert item["style"] == "a bear in van gogh style"
    assert item["original"] == "a bear walking"
    assert set(LoveuTgveVideoDataset.EDIT_KEYS) <= set(item.keys())


@pytest.fixture
def mp4(tmp_path):
    import cv2

    p = str(tmp_path / "clip.mp4")
    vw = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 16, (64, 48))
    rs = np.random.RandomState(2)
    for _ in range(64):
        vw.write((rs.rand(48, 64, 3) * 255).astype(np.uint8))
    vw.release()
    return p


def test_single_video_dataset(mp4):
    ds = SingleVideoDataset(mp4, "a test clip", sampling_fps=8, num_frames=8,
                            output_size=(32, 32))
    item = ds[0]
    assert item["frames"].shape == (8, 32, 32, 3)
    assert item["text"] == "a test clip"
    assert len(ds) >= 3


def test_media_roundtrips(tmp_path, mp4):
    frames = np.clip(np.random.RandomState(0).randn(4, 16, 16, 3) * 0.5, -1, 1)
    frames = frames.astype(np.float32)
    u8 = to_uint8(frames)
    back = from_uint8(u8)
    assert np.abs(back - frames).max() < 1 / 120
    gif = str(tmp_path / "x.gif")
    save_gif(frames, gif)
    loaded = load_gif(gif)
    assert loaded.shape == frames.shape
    paths = save_frames(frames, str(tmp_path / "frames"))
    assert len(paths) == 4 and os.path.exists(paths[0])
    vid = read_video_frames(mp4, num_frames=5, height=24, width=24)
    assert vid.shape == (5, 24, 24, 3)
