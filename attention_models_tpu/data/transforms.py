"""Host-side image preprocessing with the reference's exact semantics
(/root/reference/datasets/transforms.py:12-35):

resize to the EXACT (n, n) square with n = int(resolution/scale)
(bilinear; eval forces scale=1.0) — the reference passes a tuple to
T.Resize, so non-square images are aspect-DISTORTED, not shorter-side
resized → train: [RandomCrop] [RandomHorizontalFlip] [CenterCrop] per cfg
flags / eval: CenterCrop → float32 CHW in [0,1] → optional mean/std
normalize. The shipped configs set mean:null, so images stay in [0,1].
"""

from __future__ import annotations

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def _resize_square(img, target: int):
    # reference: T.Resize(pair(n)) — exact square, aspect-distorting
    return img.resize((target, target), Image.BILINEAR)


def _center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top = max((h - size) // 2, 0)
    left = max((w - size) // 2, 0)
    return arr[top : top + size, left : left + size]


def _random_crop(arr: np.ndarray, size: int, rng: np.random.Generator):
    h, w = arr.shape[:2]
    top = int(rng.integers(0, max(h - size, 0) + 1))
    left = int(rng.integers(0, max(w - size, 0) + 1))
    return arr[top : top + size, left : left + size]


class Transform:
    def __init__(self, cfg, is_train: bool = True, seed: int = 0):
        pp = cfg.dataset.preprocessing
        self.size = int(pp.resolution)
        scale = float(pp.scale) if is_train else 1.0
        self.resize_to = int(self.size / scale)
        self.is_train = is_train
        self.random_crop = bool(pp.get("random_crop")) and is_train
        self.random_flip = bool(pp.get("random_flip")) and is_train
        self.center_crop_train = bool(pp.get("center_crop")) and is_train
        self.mean = pp.get("mean")
        self.std = pp.get("std")
        self.rng = np.random.default_rng(seed)

    def __call__(self, img, rng: np.random.Generator | None = None
                 ) -> np.ndarray:
        """PIL image -> float32 (3, size, size) in [0,1] (or normalized).

        ``rng``: per-item Generator from the dataset (seeded by
        (seed, epoch, idx) — thread-safe under num_workers and replayable on
        resume). Falls back to the shared stream when omitted."""
        rng = self.rng if rng is None else rng
        img = img.convert("RGB")
        img = _resize_square(img, self.resize_to)
        arr = np.asarray(img, np.uint8)
        if self.is_train:
            if self.random_crop:
                arr = _random_crop(arr, self.size, rng)
            if self.random_flip and rng.random() < 0.5:
                arr = arr[:, ::-1]
            if self.center_crop_train:
                arr = _center_crop(arr, self.size)
        else:
            arr = _center_crop(arr, self.size)
        out = arr.astype(np.float32) / 255.0
        out = np.transpose(out, (2, 0, 1))  # CHW like the reference
        if self.mean:
            mean = np.asarray(self.mean, np.float32).reshape(-1, 1, 1)
            std = np.asarray(self.std, np.float32).reshape(-1, 1, 1)
            out = (out - mean) / std
        return np.ascontiguousarray(out)


def get_transform(cfg, is_train: bool = True, seed: int = 0) -> Transform:
    return Transform(cfg, is_train, seed)


class NativeBatchTransform:
    """Batched native (C++) preprocessing: datasets hand over raw decoded
    uint8 HWC images and the whole batch is resized/cropped/flipped/normalized
    in one multithreaded native call (attention_models_tpu/native). Same
    geometry semantics as ``Transform``; resize kernel is sample-based
    bilinear (cv2-style) rather than PIL's antialiased filter — opt in via
    ``dataset.params.native_pipeline: true``."""

    def __init__(self, cfg, is_train: bool = True, seed: int = 0,
                 num_threads: int = 0):
        from attention_models_tpu.native import load_fast_image

        if load_fast_image() is None:
            raise RuntimeError("native fast_image library unavailable")
        pp = cfg.dataset.preprocessing
        self.size = int(pp.resolution)
        scale = float(pp.scale) if is_train else 1.0
        self.resize_to = int(self.size / scale)
        self.is_train = is_train
        self.random_crop = bool(pp.get("random_crop")) and is_train
        self.random_flip = bool(pp.get("random_flip")) and is_train
        self.mean = pp.get("mean")
        self.std = pp.get("std")
        self.rng = np.random.default_rng(seed)
        self.num_threads = num_threads

    def __call__(self, images: list) -> np.ndarray:
        out = self._process(images)
        if self.mean:  # same mean/std semantics as Transform
            mean = np.asarray(self.mean, np.float32).reshape(1, -1, 1, 1)
            std = np.asarray(self.std, np.float32).reshape(1, -1, 1, 1)
            out = (out - mean) / std
        return out

    def _process(self, images: list) -> np.ndarray:
        """Items may be decoded uint8 HWC arrays OR raw JPEG file bytes —
        bytes go through the fused native decode+preprocess (no PIL on the
        hot path); corrupt entries fall back to PIL per item. Output is
        un-normalized [0,1] CHW; __call__ applies mean/std once on top."""
        from attention_models_tpu.native import preprocess_batch

        n = len(images)
        is_bytes = [isinstance(im, (bytes, bytearray, memoryview))
                    for im in images]
        if any(is_bytes):
            out = np.empty((n, 3, self.size, self.size), np.float32)
            byte_idx = [i for i in range(n) if is_bytes[i]]
            arr_idx = [i for i in range(n) if not is_bytes[i]]
            if byte_idx:
                dec = self._decode_batch([bytes(images[i]) for i in byte_idx])
                out[byte_idx] = dec
            if arr_idx:
                out[arr_idx] = self._process([images[i] for i in arr_idx])
            return out

        tops = np.zeros(n, np.int32)
        lefts = np.zeros(n, np.int32)
        flips = np.zeros(n, np.uint8)
        for i, im in enumerate(images):
            rh = rw = self.resize_to  # exact-square resize (see module doc)
            if self.random_crop:
                tops[i] = self.rng.integers(0, max(rh - self.size, 0) + 1)
                lefts[i] = self.rng.integers(0, max(rw - self.size, 0) + 1)
            else:  # center crop
                tops[i] = max((rh - self.size) // 2, 0)
                lefts[i] = max((rw - self.size) // 2, 0)
            if self.random_flip:
                flips[i] = self.rng.random() < 0.5
        return preprocess_batch(images, self.resize_to, self.size, tops,
                                lefts, flips, self.num_threads)

    def _decode_batch(self, jpegs: list) -> np.ndarray:
        from attention_models_tpu.native import decode_preprocess_batch

        n = len(jpegs)
        if self.random_crop:
            tf = self.rng.random(n, np.float32)
            lf = self.rng.random(n, np.float32)
        else:
            tf = np.full(n, -1.0, np.float32)  # negative = center crop
            lf = np.full(n, -1.0, np.float32)
        flips = (
            (self.rng.random(n) < 0.5).astype(np.uint8)
            if self.random_flip else np.zeros(n, np.uint8)
        )
        res = decode_preprocess_batch(jpegs, self.resize_to, self.size,
                                      tf, lf, flips, self.num_threads)
        if res is None:  # built without libjpeg: decode via PIL instead
            return self._process([_pil_decode(b) for b in jpegs])
        out, ok = res
        bad = [i for i in range(n) if not ok[i]]
        if bad:  # corrupt JPEGs: per-item PIL fallback
            out[bad] = self._process([_pil_decode(jpegs[i]) for i in bad])
        return out


def _pil_decode(data: bytes) -> np.ndarray:
    import io

    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.uint8)
