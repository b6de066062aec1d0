"""Native C++ preprocessing vs reference implementations: resize cross-checked
against cv2 INTER_LINEAR (same sample-based bilinear), crop/flip/normalize vs
numpy."""

import numpy as np
import pytest

from attention_models_tpu.native import load_fast_image, preprocess_batch

pytestmark = pytest.mark.skipif(
    load_fast_image() is None, reason="native lib unavailable (no g++)"
)


def _ref_pipeline(img, resize_to, crop, top, left, flip):
    import cv2

    h, w = img.shape[:2]
    if w <= h:
        rw, rh = resize_to, max(1, round(h * resize_to / w))
    else:
        rh, rw = resize_to, max(1, round(w * resize_to / h))
    r = cv2.resize(img, (rw, rh), interpolation=cv2.INTER_LINEAR)
    top = min(max(top, 0), max(rh - crop, 0))
    left = min(max(left, 0), max(rw - crop, 0))
    r = r[top : top + crop, left : left + crop]
    if flip:
        r = r[:, ::-1]
    return np.transpose(r.astype(np.float32) / 255.0, (2, 0, 1))


def test_native_matches_cv2_reference():
    rs = np.random.RandomState(0)
    imgs = [
        (rs.rand(96, 128, 3) * 255).astype(np.uint8),
        (rs.rand(200, 100, 3) * 255).astype(np.uint8),
        (rs.rand(64, 64, 3) * 255).astype(np.uint8),
    ]
    tops = np.array([0, 5, 1], np.int32)
    lefts = np.array([3, 0, 2], np.int32)
    flips = np.array([0, 1, 0], np.uint8)
    out = preprocess_batch(imgs, resize_to=64, crop_size=48,
                           crop_tops=tops, crop_lefts=lefts, flips=flips)
    assert out is not None and out.shape == (3, 3, 48, 48)
    for i, img in enumerate(imgs):
        ref = _ref_pipeline(img, 64, 48, int(tops[i]), int(lefts[i]),
                            bool(flips[i]))
        # u8 rounding in the native resize: allow 1/255 per-pixel difference
        assert np.abs(out[i] - ref).max() <= (1.0 / 255 + 1e-6), i


def test_native_batch_threading_deterministic():
    rs = np.random.RandomState(1)
    imgs = [(rs.rand(80, 80, 3) * 255).astype(np.uint8) for _ in range(16)]
    tops = np.zeros(16, np.int32)
    lefts = np.zeros(16, np.int32)
    flips = np.zeros(16, np.uint8)
    a = preprocess_batch(imgs, 64, 64, tops, lefts, flips, num_threads=1)
    b = preprocess_batch(imgs, 64, 64, tops, lefts, flips, num_threads=4)
    np.testing.assert_array_equal(a, b)
