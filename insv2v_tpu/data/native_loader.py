"""ctypes bindings for the native (C++) batch-assembly kernels.

Builds ``native/batch_ops.cpp`` on demand (g++, cached in the repo's
native/ dir) and exposes the threaded uint8->float conversion / resize /
crop-augmentation loops. Falls back to numpy implementations when no
compiler is available, so the framework never hard-requires the native
path — it just gets faster with it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        src = os.path.abspath(os.path.join(_SRC_DIR, "batch_ops.cpp"))
        so = os.path.abspath(os.path.join(_SRC_DIR, "libbatch_ops.so"))
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     "-o", so, src, "-lpthread"],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so)
        except (OSError, subprocess.CalledProcessError):
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.normalize_frames.argtypes = [u8p] + [ctypes.c_int] * 4 + [f32p, ctypes.c_int]
        lib.resize_normalize.argtypes = [u8p] + [ctypes.c_int] * 6 + [f32p, ctypes.c_int]
        lib.crop_resize_normalize.argtypes = (
            [u8p] + [ctypes.c_int] * 4 + [f32p, f32p, i32p, i32p, f32p,
                                          ctypes.c_int])
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return _build_and_load() is not None


def _threads() -> int:
    return max(1, (os.cpu_count() or 2) - 1)


def normalize_frames(frames_u8: np.ndarray) -> np.ndarray:
    """(N, H, W, C) uint8 -> float32 in [-1, 1]."""
    frames_u8 = np.ascontiguousarray(frames_u8)
    lib = _build_and_load()
    if lib is None:
        return frames_u8.astype(np.float32) / 127.5 - 1.0
    n, h, w, c = frames_u8.shape
    out = np.empty((n, h, w, c), np.float32)
    lib.normalize_frames(
        frames_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, c,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), _threads())
    return out


def resize_normalize(frames_u8: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """(N, H, W, C) uint8 -> float32 (N, oh, ow, C) in [-1, 1], bilinear."""
    frames_u8 = np.ascontiguousarray(frames_u8)
    n, h, w, c = frames_u8.shape
    lib = _build_and_load()
    if lib is None:
        import jax.numpy as jnp

        from insv2v_tpu.ops.resize import bilinear_resize

        x = np.asarray(bilinear_resize(
            jnp.asarray(frames_u8.astype(np.float32)), oh, ow))
        return x / 127.5 - 1.0
    out = np.empty((n, oh, ow, c), np.float32)
    lib.resize_normalize(
        frames_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, c, oh, ow,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), _threads())
    return out


def crop_resize_normalize(frames_u8: np.ndarray, cx: np.ndarray,
                          cy: np.ndarray, crop_h: np.ndarray,
                          crop_w: np.ndarray) -> np.ndarray:
    """Per-frame center-crop + resize-back + normalize (motion-aug loop)."""
    frames_u8 = np.ascontiguousarray(frames_u8)
    n, h, w, c = frames_u8.shape
    cx = np.ascontiguousarray(cx, np.float32)
    cy = np.ascontiguousarray(cy, np.float32)
    crop_h = np.ascontiguousarray(crop_h, np.int32)
    crop_w = np.ascontiguousarray(crop_w, np.int32)
    lib = _build_and_load()
    if lib is None:  # numpy fallback via cv2
        import cv2

        outs = []
        for i in range(n):
            y0 = int(cy[i] - crop_h[i] / 2)
            x0 = int(cx[i] - crop_w[i] / 2)
            crop = frames_u8[i, y0: y0 + crop_h[i], x0: x0 + crop_w[i]]
            outs.append(cv2.resize(crop, (w, h), interpolation=cv2.INTER_LINEAR))
        return np.stack(outs).astype(np.float32) / 127.5 - 1.0
    out = np.empty((n, h, w, c), np.float32)
    lib.crop_resize_normalize(
        frames_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, c,
        cx.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cy.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        crop_h.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        crop_w.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), _threads())
    return out


class PrefetchLoader:
    """Background-thread batch prefetcher: assembles the next batches
    (dataset indexing + native conversion) while the device runs the
    current step — the 4-workers-per-GPU DataLoader analogue
    (misc_utils/train_utils.py:64-71) without torch."""

    def __init__(self, batch_fn, depth: int = 2):
        import queue

        self._fn = batch_fn
        self._q = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while not self._stop.is_set():
            try:
                batch = self._fn()
            except StopIteration:
                self._q.put(None)
                return
            self._q.put(batch)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is None:
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except Exception:
            pass
