"""Tar-shard dataset (webdataset-style).

The reference has a vestigial webdataset scratch file
(/root/reference/datasets/webdataset.py, not wired in). This is a working
native equivalent: images (and optional .txt captions sharing the basename)
streamed from .tar shards, eagerly indexed so it composes with the map-style
DataLoader.
"""

from __future__ import annotations

import io
import os
import tarfile

import numpy as np

IMG_EXTS = (".jpg", ".jpeg", ".png", ".webp", ".bmp")


class TarImageDataset:
    def __init__(self, shards: list[str] | str, transform, raw: bool = False):
        if isinstance(shards, str):
            shards = [shards]
        self.transform = transform
        self.raw = raw
        # index: (shard path, member name, caption member name | None)
        self.index: list[tuple[str, str, str | None]] = []
        for shard in shards:
            with tarfile.open(shard) as tf:
                names = set(tf.getnames())
                for name in sorted(names):
                    base, ext = os.path.splitext(name)
                    if ext.lower() in IMG_EXTS:
                        cap = f"{base}.txt" if f"{base}.txt" in names else None
                        self.index.append((shard, name, cap))

    def __len__(self):
        return len(self.index)

    def __getitem__(self, idx):
        from PIL import Image

        shard, name, cap = self.index[idx]
        with tarfile.open(shard) as tf:
            img = Image.open(io.BytesIO(tf.extractfile(name).read()))
            img.load()
            caption = (
                tf.extractfile(cap).read().decode("utf-8").strip()
                if cap else ""
            )
        if self.raw:
            return np.asarray(img.convert("RGB"), np.uint8), caption
        return self.transform(img), caption
