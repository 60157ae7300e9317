"""Image/video IO + tensor conversion utilities (host-side).

Covers the reference's misc_utils/image_utils.py surface the pipelines
actually use: GIF save/load/concat, tensor->gif/images, mp4 frame
extraction, uint8<->[-1,1] conversion.  All tensors are numpy,
channels-last, float in [-1, 1] unless noted.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

__all__ = [
    "to_uint8",
    "from_uint8",
    "save_gif",
    "load_gif",
    "save_frames",
    "read_video_frames",
    "resize_frame",
    "concat_videos",
]


def to_uint8(frames: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> uint8."""
    return (np.clip(frames, -1.0, 1.0) * 127.5 + 127.5).round().astype(np.uint8)


def from_uint8(frames: np.ndarray) -> np.ndarray:
    return frames.astype(np.float32) / 127.5 - 1.0


def save_gif(frames: np.ndarray, path: str, fps: int = 8) -> None:
    """frames (F, H, W, 3) in [-1,1] -> animated gif."""
    import imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imageio.mimsave(path, list(to_uint8(frames)), duration=1000.0 / fps, loop=0)


def load_gif(path: str) -> np.ndarray:
    import imageio

    frames = imageio.mimread(path)
    out = np.stack([f[..., :3] for f in frames])
    return from_uint8(out)


def save_frames(frames: np.ndarray, out_dir: str, prefix: str = "") -> List[str]:
    """Dump frames as jpgs (LOVEU runner output layout,
    insv2v_run_loveu_tgve.py:164-172)."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, fr in enumerate(to_uint8(frames)):
        p = os.path.join(out_dir, f"{prefix}{i:05d}.jpg")
        cv2.imwrite(p, cv2.cvtColor(fr, cv2.COLOR_RGB2BGR))
        paths.append(p)
    return paths


def resize_frame(frame: np.ndarray, height: int, width: int,
                 keep_aspect: bool = True) -> np.ndarray:
    """Aspect-preserving resize + center crop (single_video_dataset.py:82-94)."""
    import cv2

    h, w = frame.shape[:2]
    if keep_aspect:
        scale = max(height / h, width / w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        frame = cv2.resize(frame, (nw, nh), interpolation=cv2.INTER_AREA)
        top = (nh - height) // 2
        left = (nw - width) // 2
        return frame[top: top + height, left: left + width]
    return cv2.resize(frame, (width, height), interpolation=cv2.INTER_AREA)


def read_video_frames(
    path: str,
    num_frames: Optional[int] = None,
    start_frame: int = 0,
    frame_skip: int = 1,
    height: Optional[int] = None,
    width: Optional[int] = None,
) -> np.ndarray:
    """Decode an mp4 into (F, H, W, 3) in [-1, 1] (single_video_dataset.py)."""
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    idx = 0
    while True:
        ok, fr = cap.read()
        if not ok:
            break
        if idx >= start_frame and (idx - start_frame) % frame_skip == 0:
            fr = cv2.cvtColor(fr, cv2.COLOR_BGR2RGB)
            if height is not None and width is not None:
                fr = resize_frame(fr, height, width)
            frames.append(fr)
            if num_frames is not None and len(frames) >= num_frames:
                break
        idx += 1
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return from_uint8(np.stack(frames))


def concat_videos(videos: Sequence[np.ndarray], axis: int = 2) -> np.ndarray:
    """Side-by-side (axis=2 width) concat of equal-length videos."""
    return np.concatenate(list(videos), axis=axis)


def canny_edges(frames: np.ndarray, low: int = 100, high: int = 200) -> np.ndarray:
    """Batch canny edge maps (image_utils.py canny batch helper):
    (F, H, W, 3) in [-1,1] -> (F, H, W, 1) in [-1, 1]."""
    import cv2

    outs = []
    for fr in to_uint8(frames):
        gray = cv2.cvtColor(fr, cv2.COLOR_RGB2GRAY)
        outs.append(cv2.Canny(gray, low, high))
    edges = np.stack(outs)[..., None]
    return from_uint8(edges)


def match_histogram(source: np.ndarray, reference: np.ndarray) -> np.ndarray:
    """Per-channel histogram matching of ``source`` to ``reference``
    (image_utils.py histogram matching): both (H, W, 3) in [-1, 1]."""
    src = to_uint8(source)
    ref = to_uint8(reference)
    out = np.empty_like(src)
    for c in range(src.shape[-1]):
        s_vals, s_idx, s_counts = np.unique(
            src[..., c].ravel(), return_inverse=True, return_counts=True)
        r_vals, r_counts = np.unique(ref[..., c].ravel(), return_counts=True)
        s_q = np.cumsum(s_counts).astype(np.float64)
        s_q /= s_q[-1]
        r_q = np.cumsum(r_counts).astype(np.float64)
        r_q /= r_q[-1]
        interp = np.interp(s_q, r_q, r_vals)
        out[..., c] = interp[s_idx].reshape(src[..., c].shape)
    return from_uint8(out)


def overlay_text(frame: np.ndarray, text: str, scale: float = 0.5) -> np.ndarray:
    """Burn a caption into a frame (image_utils.py text overlay)."""
    import cv2

    img = to_uint8(frame).copy()
    cv2.putText(img, text, (4, img.shape[0] - 8), cv2.FONT_HERSHEY_SIMPLEX,
                scale, (255, 255, 255), 1, cv2.LINE_AA)
    return from_uint8(img)
