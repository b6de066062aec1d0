"""Datasets: COCO captions (native JSON reader — no pycocotools dependency),
ImageFolder, and a synthetic dataset for tests/benchmarks.

API parity with /root/reference/datasets/coco.py:13-43 (each item is
(image CHW float32, caption str); one random caption per image) and
torchvision ImageFolder (item = (image, class_idx))."""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np

from attention_models_tpu.data.transforms import Transform


def _raw_item(path: str) -> bytes | None:
    """In native-pipeline (raw) mode, JPEG files skip host decoding entirely:
    the raw bytes ride to NativeBatchTransform, which decodes + preprocesses
    in one fused multithreaded C++ call (libjpeg). Returns None for non-JPEGs
    or when the native library lacks JPEG support."""
    if not path.lower().endswith((".jpg", ".jpeg")):
        return None
    from attention_models_tpu.native import has_jpeg

    if not has_jpeg():
        return None
    with open(path, "rb") as f:
        return f.read()


class CocoCaptions:
    """Reads {root}/{dataType}/ images + {root}/annotations/captions_*.json.
    Truncated by experiment.max_train_examples like the reference (its
    overfit-N-examples mechanism, coco.py:27-28)."""

    def __init__(self, cfg, data_type="train2017", is_train=True, seed=0,
                 raw=False):
        from PIL import Image  # noqa: F401 (fail early if missing)

        self.raw = raw  # return decoded uint8 HWC (native batch pipeline)

        params = cfg.dataset.params
        root = params.train_path if is_train else params.val_path
        self.img_dir = os.path.join(root, data_type)
        ann_file = os.path.join(root, "annotations",
                                f"captions_{data_type}.json")
        with open(ann_file) as f:
            ann = json.load(f)
        self.file_by_imgid = {im["id"]: im["file_name"] for im in ann["images"]}
        self.captions: dict[int, list[str]] = {}
        for a in ann["annotations"]:
            self.captions.setdefault(a["image_id"], []).append(a["caption"])
        self.imgids = [i for i in self.file_by_imgid if i in self.captions]
        max_n = int(cfg.experiment.max_train_examples)
        if max_n < len(self.imgids):
            self.imgids = self.imgids[:max_n]
        self.transform = Transform(cfg, is_train, seed)
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def _item_rng(self, idx) -> np.random.Generator:
        """Per-(seed, epoch, idx) Generator: thread-safe under num_workers
        (no shared bit-generator state), deterministic per epoch (resume
        replays the same caption draws and crops), and identical between
        __getitem__ and caption() for the same access."""
        return np.random.default_rng((self.seed, self._epoch, int(idx)))

    def __len__(self):
        return len(self.imgids)

    def caption(self, idx) -> str:
        """One caption for sample ``idx`` (random among its annotations,
        same draw as __getitem__) WITHOUT decoding the image — token-cached
        trainers iterate captions only (training.cache_vq_tokens)."""
        rng = self._item_rng(idx)
        return str(rng.choice(self.captions[self.imgids[idx]]))

    def __getitem__(self, idx):
        from PIL import Image

        rng = self._item_rng(idx)
        imgid = self.imgids[idx]
        path = os.path.join(self.img_dir, self.file_by_imgid[imgid])
        caption = str(rng.choice(self.captions[imgid]))
        if self.raw:
            data = _raw_item(path)  # bytes when native JPEG decode available
            if data is not None:
                return data, caption
            return np.asarray(Image.open(path).convert("RGB"),
                              np.uint8), caption
        return self.transform(Image.open(path), rng), caption


class ImageFolder:
    """torchvision.datasets.ImageFolder equivalent: root/class_x/img.ext."""

    EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")

    def __init__(self, root: str, transform: Transform, raw: bool = False,
                 seed: int = 0):
        self.raw = raw
        classes = sorted(
            d for d in os.listdir(root)
            if os.path.isdir(os.path.join(root, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: list[tuple[str, int]] = []
        for c in classes:
            cdir = os.path.join(root, c)
            for fn in sorted(os.listdir(cdir)):
                if fn.lower().endswith(self.EXTS):
                    self.samples.append((os.path.join(cdir, fn),
                                         self.class_to_idx[c]))
        self.transform = transform
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        from PIL import Image

        path, label = self.samples[idx]
        if self.raw:
            data = _raw_item(path)
            if data is not None:
                return data, label
            return np.asarray(Image.open(path).convert("RGB"), np.uint8), label
        # per-(seed, epoch, idx) rng: thread-safe under num_workers and
        # replayable on resume (see CocoCaptions._item_rng)
        rng = np.random.default_rng((self.seed, self._epoch, int(idx)))
        return self.transform(Image.open(path), rng), label


class SyntheticImages:
    """Deterministic random images (+captions or labels) for tests/bench."""

    _CAPTIONS = ["a photo of a cat", "a red stop sign", "two dogs playing",
                 "a mountain at sunset"]

    def __init__(self, n: int, resolution: int, with_captions=True,
                 num_classes: int = 10, seed: int = 0):
        self.n = n
        self.resolution = resolution
        self.with_captions = with_captions
        self.num_classes = num_classes
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        rs = np.random.RandomState(self.seed + idx)
        img = rs.rand(3, self.resolution, self.resolution).astype(np.float32)
        if self.with_captions:
            return img, self._CAPTIONS[idx % len(self._CAPTIONS)]
        return img, idx % self.num_classes

    def caption(self, idx) -> str:
        return self._CAPTIONS[idx % len(self._CAPTIONS)]


class SyntheticSeq2Seq:
    """Deterministic sequence-reversal pairs for the seq2seq ``Transformer``.

    The reference documents Transformer training only as a README snippet
    over random token pairs (/root/reference/README.md:55-89, with CE
    ignore_index=0); this gives the model a *learnable* task with the same
    token conventions so `main.py --config=cfg/transformer.yaml` trains it
    end-to-end: PAD=0, START=1, END=2, payload tokens uniform in
    [3, vocab_size). Items are ``(src, tgt)`` int32 arrays of static shape
    ``(seq_len,)`` / ``(seq_len + 1,)`` where ``tgt = reversed(src) + [END]``
    (the trainer builds the teacher-forcing input ``[START] + tgt[:-1]``).
    """

    PAD, START, END = 0, 1, 2

    def __init__(self, n: int, seq_len: int, vocab_size: int, seed: int = 0):
        if vocab_size <= 3:
            raise ValueError("vocab_size must exceed the 3 special tokens")
        self.n = int(n)
        self.seq_len = int(seq_len)
        self.vocab_size = int(vocab_size)
        self.seed = seed

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        rs = np.random.RandomState(self.seed + idx)
        src = rs.randint(3, self.vocab_size, self.seq_len).astype(np.int32)
        tgt = np.concatenate([src[::-1], [self.END]]).astype(np.int32)
        return src, tgt


class Subset:
    def __init__(self, ds, indices: Sequence[int]):
        self.ds, self.indices = ds, list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx):
        return self.ds[self.indices[idx]]

    def caption(self, idx) -> str:
        return self.ds.caption(self.indices[idx])

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.ds, "set_epoch"):
            self.ds.set_epoch(epoch)


def random_split(ds, train_frac: float, seed: int = 0):
    """torch.utils.data.random_split equivalent (random permutation split)."""
    n = len(ds)
    n_train = int(train_frac * n)
    perm = np.random.default_rng(seed).permutation(n)
    return Subset(ds, perm[:n_train]), Subset(ds, perm[n_train:])
