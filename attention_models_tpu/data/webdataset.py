"""Tar-shard dataset (webdataset-style).

The reference has a vestigial webdataset scratch file
(/root/reference/datasets/webdataset.py, not wired in). This is a working
native equivalent: images (and optional .txt captions sharing the basename)
streamed from .tar shards, eagerly indexed so it composes with the map-style
DataLoader. Member TarInfos are cached at index time and each shard keeps
one lazily-opened handle (tarfile seeks straight to the cached offset), so
__getitem__ is O(1) I/O — re-opening and name-scanning the tar per item
would cost a full header scan per image. ``raw=True`` returns the raw
JPEG/PNG file bytes so the native fused decode path
(data/transforms.py::NativeBatchTransform) can consume them without PIL.
"""

from __future__ import annotations

import io
import os
import tarfile
import threading

import numpy as np

IMG_EXTS = (".jpg", ".jpeg", ".png", ".webp", ".bmp")
# formats the native libjpeg path can decode from raw bytes
_JPEG_EXTS = (".jpg", ".jpeg")


class TarImageDataset:
    def __init__(self, shards: list[str] | str, transform, raw: bool = False):
        if isinstance(shards, str):
            shards = [shards]
        self.transform = transform
        self.raw = raw
        # index: (shard path, image TarInfo, caption TarInfo | None)
        self.index: list[tuple[str, tarfile.TarInfo, tarfile.TarInfo | None]]
        self.index = []
        for shard in shards:
            with tarfile.open(shard) as tf:
                members = {m.name: m for m in tf.getmembers() if m.isfile()}
                for name in sorted(members):
                    base, ext = os.path.splitext(name)
                    if ext.lower() in IMG_EXTS:
                        cap = members.get(f"{base}.txt")
                        self.index.append((shard, members[name], cap))
        self._handles: dict[str, tarfile.TarFile] = {}
        self._lock = threading.Lock()

    def _tar(self, shard: str) -> tarfile.TarFile:
        tf = self._handles.get(shard)
        if tf is None:
            tf = tarfile.open(shard)
            self._handles[shard] = tf
        return tf

    def _read(self, shard: str, member: tarfile.TarInfo) -> bytes:
        # one persistent handle per shard; the handle seeks to the cached
        # member offset (no name lookup / header rescan). tarfile handles
        # are not thread-safe -> serialize reads.
        with self._lock:
            return self._tar(shard).extractfile(member).read()

    def __len__(self):
        return len(self.index)

    def __getitem__(self, idx):
        shard, member, cap = self.index[idx]
        data = self._read(shard, member)
        caption = (
            self._read(shard, cap).decode("utf-8").strip() if cap else ""
        )
        if self.raw:
            ext = os.path.splitext(member.name)[1].lower()
            if ext in _JPEG_EXTS:
                return data, caption  # raw bytes -> native fused decode
            return _decode_u8(data), caption
        from PIL import Image

        img = Image.open(io.BytesIO(data))
        img.load()
        return self.transform(img), caption

    def close(self):
        with self._lock:
            for tf in self._handles.values():
                tf.close()
            self._handles.clear()

    def __getstate__(self):  # handles are not picklable; reopen lazily
        state = dict(self.__dict__)
        state["_handles"] = {}
        state["_lock"] = None
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._lock = threading.Lock()


def _decode_u8(data: bytes) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.uint8)
