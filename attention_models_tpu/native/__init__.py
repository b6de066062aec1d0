"""ctypes bindings for the native (C++) input-pipeline library.

``load_fast_image()`` returns the loaded library, compiling it on first use
(g++ is part of the toolchain; see native/Makefile). Returns None when no
compiler is available — callers fall back to the pure-Python path.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger(__name__)

_ABI_VERSION = 3
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
# ABI-versioned filename: dlopen caches by path within a process, so an
# in-place rebuild of a stale library would keep returning the old handle.
_LIB_PATH = os.path.abspath(
    os.path.join(_NATIVE_DIR, f"libfast_image_v{_ABI_VERSION}.so")
)
_LIB = None
_TRIED = False


def _compile() -> bool:
    src = os.path.join(_NATIVE_DIR, "fast_image.cpp")
    if not os.path.exists(src):
        return False
    flags = ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread"]
    # prefer the libjpeg-fused build (raw JPEG bytes -> preprocessed batch);
    # fall back to the decode-less build when libjpeg is absent
    for cmd in (
        flags + ["-DHAVE_LIBJPEG", "-o", _LIB_PATH, src, "-ljpeg"],
        flags + ["-o", _LIB_PATH, src],
    ):
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
            return True
        except Exception as e:
            last_err = e
    log.warning("native fast_image build failed: %s", last_err)
    return False


def _load_lib():
    lib = ctypes.CDLL(_LIB_PATH)
    if lib.native_abi_version() != _ABI_VERSION:
        raise RuntimeError(
            f"stale native library (abi {lib.native_abi_version()} != "
            f"{_ABI_VERSION})"
        )
    lib.preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),  # srcs
        ctypes.POINTER(ctypes.c_int),     # hs
        ctypes.POINTER(ctypes.c_int),     # ws
        ctypes.c_int,                     # n
        ctypes.c_int,                     # resize_to
        ctypes.c_int,                     # crop_size
        ctypes.POINTER(ctypes.c_int),     # crop_tops
        ctypes.POINTER(ctypes.c_int),     # crop_lefts
        ctypes.POINTER(ctypes.c_uint8),   # flips
        ctypes.POINTER(ctypes.c_float),   # out
        ctypes.c_int,                     # num_threads
    ]
    lib.decode_preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.c_void_p),  # jpegs
        ctypes.POINTER(ctypes.c_uint64),  # lens
        ctypes.c_int,                     # n
        ctypes.c_int,                     # resize_to
        ctypes.c_int,                     # crop_size
        ctypes.POINTER(ctypes.c_float),   # top_fracs
        ctypes.POINTER(ctypes.c_float),   # left_fracs
        ctypes.POINTER(ctypes.c_uint8),   # flips
        ctypes.POINTER(ctypes.c_float),   # out
        ctypes.POINTER(ctypes.c_uint8),   # ok
        ctypes.c_int,                     # num_threads
    ]
    return lib


def _is_stale() -> bool:
    """The .so is older than its source — never trust a stale binary (the
    library is built from source on demand and is NOT checked into git)."""
    src = os.path.join(_NATIVE_DIR, "fast_image.cpp")
    try:
        return os.path.getmtime(_LIB_PATH) < os.path.getmtime(src)
    except OSError:
        return False


def load_fast_image():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        if os.path.exists(_LIB_PATH) and not _is_stale():
            try:
                _LIB = _load_lib()
                return _LIB
            except Exception:  # stale ABI: rebuild below
                pass
        if _compile():
            _LIB = _load_lib()
    except Exception as e:
        log.warning("native fast_image load failed: %s", e)
        _LIB = None
    return _LIB


def has_jpeg() -> bool:
    """True when the native library was built with libjpeg decoding."""
    lib = load_fast_image()
    return bool(lib is not None and lib.native_has_jpeg())


def preprocess_batch(
    images: list[np.ndarray],  # HWC uint8 RGB
    resize_to: int,
    crop_size: int,
    crop_tops: np.ndarray,
    crop_lefts: np.ndarray,
    flips: np.ndarray,
    num_threads: int = 0,
) -> np.ndarray | None:
    """Batched resize+crop+flip+normalize -> (n, 3, crop, crop) float32.
    Returns None when the native library is unavailable."""
    lib = load_fast_image()
    if lib is None:
        return None
    n = len(images)
    images = [np.ascontiguousarray(im, np.uint8) for im in images]
    srcs = (ctypes.c_void_p * n)(
        *[im.ctypes.data_as(ctypes.c_void_p).value for im in images]
    )
    hs = np.asarray([im.shape[0] for im in images], np.int32)
    ws = np.asarray([im.shape[1] for im in images], np.int32)
    tops = np.ascontiguousarray(crop_tops, np.int32)
    lefts = np.ascontiguousarray(crop_lefts, np.int32)
    fl = np.ascontiguousarray(flips, np.uint8)
    out = np.empty((n, 3, crop_size, crop_size), np.float32)
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, n)
    lib.preprocess_batch(
        ctypes.cast(srcs, ctypes.POINTER(ctypes.c_void_p)),
        hs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ws.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n, resize_to, crop_size,
        tops.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        lefts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        fl.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    return out


def decode_preprocess_batch(
    jpegs: list[bytes],
    resize_to: int,
    crop_size: int,
    top_fracs: np.ndarray,   # float32 in [0,1]; negative = center crop
    left_fracs: np.ndarray,
    flips: np.ndarray,
    num_threads: int = 0,
):
    """Raw JPEG bytes -> (n, 3, crop, crop) float32 plus a uint8 ok-mask
    (ok[i]=0: corrupt input, its slice is zeroed — caller re-decodes those
    via PIL). Returns None when the library lacks libjpeg support."""
    if not has_jpeg():
        return None
    lib = load_fast_image()
    n = len(jpegs)
    bufs = [np.frombuffer(b, np.uint8) for b in jpegs]
    srcs = (ctypes.c_void_p * n)(
        *[b.ctypes.data_as(ctypes.c_void_p).value for b in bufs]
    )
    lens = np.asarray([len(b) for b in jpegs], np.uint64)
    tf = np.ascontiguousarray(top_fracs, np.float32)
    lf = np.ascontiguousarray(left_fracs, np.float32)
    fl = np.ascontiguousarray(flips, np.uint8)
    out = np.empty((n, 3, crop_size, crop_size), np.float32)
    ok = np.empty(n, np.uint8)
    if num_threads <= 0:
        num_threads = min(os.cpu_count() or 1, n)
    lib.decode_preprocess_batch(
        ctypes.cast(srcs, ctypes.POINTER(ctypes.c_void_p)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        n, resize_to, crop_size,
        tf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        lf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        fl.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        num_threads,
    )
    return out, ok
