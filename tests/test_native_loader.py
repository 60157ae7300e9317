"""Native C++ batch-assembly kernels vs numpy/cv2 references."""

import numpy as np
import pytest

from insv2v_tpu.data import native_loader as nl


@pytest.fixture(scope="module")
def lib_ok():
    if not nl.native_available():
        pytest.skip("no g++ / native build failed")
    return True


def test_normalize_frames_matches_numpy(lib_ok):
    rs = np.random.RandomState(0)
    u8 = rs.randint(0, 256, (4, 8, 10, 3), dtype=np.uint8)
    got = nl.normalize_frames(u8)
    ref = u8.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_resize_normalize_matches_cv2(lib_ok):
    import cv2

    rs = np.random.RandomState(1)
    u8 = rs.randint(0, 256, (2, 16, 12, 3), dtype=np.uint8)
    got = nl.resize_normalize(u8, 8, 20)
    ref = np.stack([
        cv2.resize(f, (20, 8), interpolation=cv2.INTER_LINEAR) for f in u8
    ]).astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(got, ref, atol=2e-2)  # cv2 fixed-point vs f32


def test_crop_resize_normalize_identity_crop(lib_ok):
    rs = np.random.RandomState(2)
    n, h, w = 3, 16, 16
    u8 = rs.randint(0, 256, (n, h, w, 3), dtype=np.uint8)
    cx = np.full(n, w / 2, np.float32)
    cy = np.full(n, h / 2, np.float32)
    ch = np.full(n, h, np.int32)
    cw = np.full(n, w, np.int32)
    got = nl.crop_resize_normalize(u8, cx, cy, ch, cw)
    ref = u8.astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_crop_shifts_content(lib_ok):
    u8 = np.zeros((1, 16, 16, 1), dtype=np.uint8)
    u8[0, 4:8, 4:8] = 255
    # crop the left-top 8x8 quadrant -> bright square fills more area
    got = nl.crop_resize_normalize(
        u8, np.array([4.0], np.float32), np.array([4.0], np.float32),
        np.array([8], np.int32), np.array([8], np.int32))
    assert got.mean() > (u8.astype(np.float32) / 127.5 - 1.0).mean()


def test_prefetch_loader_round_trip():
    calls = []

    def make():
        if len(calls) >= 3:
            raise StopIteration
        calls.append(1)
        return {"x": np.zeros(2)}

    loader = nl.PrefetchLoader(make, depth=1)
    got = list(loader)
    assert len(got) == 3
    loader.close()
