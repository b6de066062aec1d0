"""Native C++ preprocessing vs reference implementations: resize cross-checked
against cv2 INTER_LINEAR (same sample-based bilinear), crop/flip/normalize vs
numpy."""

import os
import numpy as np
import pytest

from attention_models_tpu.native import load_fast_image, preprocess_batch

pytestmark = pytest.mark.skipif(
    load_fast_image() is None, reason="native lib unavailable (no g++)"
)


def _ref_pipeline(img, resize_to, crop, top, left, flip):
    import cv2

    rh = rw = resize_to  # exact-square resize (reference T.Resize(pair))
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


def _jpeg_bytes(img: np.ndarray, quality=95) -> bytes:
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def test_native_jpeg_decode_matches_pil():
    from attention_models_tpu.native import decode_preprocess_batch, has_jpeg

    if not has_jpeg():
        pytest.skip("native lib built without libjpeg")
    rs = np.random.RandomState(2)
    imgs = [
        (rs.rand(96, 128, 3) * 255).astype(np.uint8),
        (rs.rand(150, 90, 3) * 255).astype(np.uint8),
    ]
    datas = [_jpeg_bytes(im) for im in imgs]
    n = len(datas)
    res = decode_preprocess_batch(
        datas, resize_to=64, crop_size=48,
        top_fracs=np.full(n, -1.0, np.float32),   # center crop
        left_fracs=np.full(n, -1.0, np.float32),
        flips=np.zeros(n, np.uint8),
    )
    assert res is not None
    out, ok = res
    assert ok.all() and out.shape == (n, 3, 48, 48)
    # reference: PIL-decode the same JPEG, then the native array pipeline
    # with the center-crop offsets computed Python-side
    import io

    from PIL import Image

    for i, data in enumerate(datas):
        dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.uint8)
        rh = rw = 64  # exact-square resize
        top = np.int32([max((rh - 48) // 2, 0)])
        left = np.int32([max((rw - 48) // 2, 0)])
        ref = preprocess_batch([dec], 64, 48, top, left,
                               np.zeros(1, np.uint8))[0]
        # libjpeg vs PIL decode may differ by a couple of IDCT rounding ulps
        assert np.abs(out[i] - ref).max() <= (3.0 / 255 + 1e-6), i


def test_native_jpeg_corrupt_marks_not_ok():
    from attention_models_tpu.native import decode_preprocess_batch, has_jpeg

    if not has_jpeg():
        pytest.skip("native lib built without libjpeg")
    good = _jpeg_bytes((np.random.RandomState(3).rand(64, 64, 3) * 255)
                       .astype(np.uint8))
    res = decode_preprocess_batch(
        [b"not a jpeg", good], 64, 48,
        np.full(2, -1.0, np.float32), np.full(2, -1.0, np.float32),
        np.zeros(2, np.uint8),
    )
    assert res is not None
    out, ok = res
    assert ok[0] == 0 and ok[1] == 1
    assert np.all(out[0] == 0)


def test_batch_transform_accepts_bytes(tmp_path):
    """NativeBatchTransform handles mixed bytes/array batches, with corrupt
    bytes falling back to PIL."""
    from attention_models_tpu.data.transforms import NativeBatchTransform
    from attention_models_tpu.native import has_jpeg
    from attention_models_tpu.utils.config import Config

    if not has_jpeg():
        pytest.skip("native lib built without libjpeg")
    cfg = Config(
        {
            "dataset": {
                "preprocessing": {"resolution": 48, "scale": 0.75,
                                  "random_crop": False, "random_flip": False},
            }
        }
    )
    bt = NativeBatchTransform(cfg, is_train=False)
    rs = np.random.RandomState(4)
    arr = (rs.rand(96, 128, 3) * 255).astype(np.uint8)
    data = _jpeg_bytes(arr)
    # compare against the PIL-decoded JPEG through the array path (JPEG is
    # lossy, so the raw array is not the reference — its decode is)
    import io

    from PIL import Image

    dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.uint8)
    out = bt([data, dec])
    assert out.shape == (2, 3, 48, 48)
    assert np.abs(out[0] - out[1]).max() <= (3.0 / 255 + 1e-6)
    out2 = bt([data, dec, arr])
    assert out2.shape == (3, 3, 48, 48)
    # bytes the native libjpeg decoder rejects (a PNG) must take the
    # per-item PIL fallback and come out pixel-identical to the array path
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    out3 = bt([buf.getvalue(), arr])
    assert out3.shape == (2, 3, 48, 48)
    np.testing.assert_allclose(out3[0], out3[1], atol=1e-6)
    # bytes NOTHING can decode raise cleanly (PIL's error), not segfault
    with pytest.raises(Exception):
        bt([b"not an image at all"])


def test_stale_binary_detected_by_mtime():
    """A .so older than fast_image.cpp must be treated as stale (the
    loader rebuilds from source rather than trusting a leftover binary;
    the library is never checked into git)."""
    import attention_models_tpu.native as native

    if not os.path.exists(native._LIB_PATH):
        pytest.skip("native library not built (no compiler?)")
    src = os.path.join(native._NATIVE_DIR, "fast_image.cpp")
    lib_m = os.path.getmtime(native._LIB_PATH)
    assert not native._is_stale()
    os.utime(native._LIB_PATH, (lib_m, os.path.getmtime(src) - 10))
    try:
        assert native._is_stale()
    finally:
        os.utime(native._LIB_PATH, (lib_m, lib_m))
    assert not native._is_stale()
