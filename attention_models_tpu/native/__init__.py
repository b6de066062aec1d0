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

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libfast_image.so"))
_LIB = None
_TRIED = False


def _compile() -> bool:
    src = os.path.join(_NATIVE_DIR, "fast_image.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
             "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=300,
        )
        return True
    except Exception as e:  # no compiler / failure: pure-Python fallback
        log.warning("native fast_image build failed: %s", e)
        return False


def load_fast_image():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_LIB_PATH) and not _compile():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
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
        assert lib.native_abi_version() == 1
        _LIB = lib
    except Exception as e:
        log.warning("native fast_image load failed: %s", e)
        _LIB = None
    return _LIB


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
