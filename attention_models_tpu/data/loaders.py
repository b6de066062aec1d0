"""Batching data loader with background prefetch.

Replaces the reference's torch DataLoader (datasets/build_loader.py:29-36)
with a framework-native loader: shuffling, fixed-size batches (drop_last so
jitted step shapes stay static — XLA recompiles on shape change), and a
producer thread that overlaps host-side decode/augment with device compute.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np


def _collate(items, batch_transform=None):
    if batch_transform is not None:
        imgs = batch_transform([it[0] for it in items])
    else:
        imgs = np.stack([it[0] for it in items])
    seconds = [it[1] for it in items]
    if isinstance(seconds[0], (int, np.integer)):
        return imgs, np.asarray(seconds, np.int32)
    if isinstance(seconds[0], np.ndarray):  # seq2seq target sequences
        return imgs, np.stack(seconds)
    return imgs, seconds  # captions stay a list[str]


class DataLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True,
                 prefetch: int = 2, batch_transform=None,
                 with_indices: bool = False, num_workers: int = 0):
        self.dataset = dataset
        self.batch_transform = batch_transform
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = prefetch
        # when True, each yielded batch is (sample_indices int32, *batch) —
        # lets trainers key per-sample caches (training.cache_vq_tokens)
        self.with_indices = with_indices
        # dataset.params.num_workers: parallel per-item fetch/decode inside
        # the producer (PIL releases the GIL while decoding, so threads give
        # real JPEG-decode parallelism; torch spawns worker *processes* for
        # the same knob). 0 = fetch serially in the producer thread.
        self.num_workers = int(num_workers)
        # multi-host: positions within each full global batch this process
        # loads (BaseTrainer sets it from the mesh's row ownership). The
        # shuffle permutation stays GLOBAL, so hosts agree on batch makeup.
        self.row_filter: np.ndarray | None = None
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return max(n, 1 if len(self.dataset) else 0)

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle permutation of the NEXT iteration to ``epoch``
        (same contract as torch DistributedSampler.set_epoch). Trainers call
        this each epoch so a resumed run replays the exact permutations the
        uninterrupted run would have used — without it, a fresh process
        restarts the internal counter and mid-epoch resume skips batches
        from the wrong shuffle order."""
        self._epoch = int(epoch)

    def iter_indices(self) -> Iterator[np.ndarray]:
        """Index-only iteration with the SAME epoch/shuffle contract as
        ``__iter__`` (consumes one epoch off the set_epoch counter). For
        consumers that don't need the items at all — token-cached MaskGIT
        training reads its grids from the cache, so the image pipeline
        (decode, transform, collate) never runs."""
        epoch = self._epoch
        self._epoch += 1
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)  # keys caption()/augment draws
        for batch_idx in self._batch_indices(epoch):
            yield batch_idx.astype(np.int32)

    def _batch_indices(self, epoch: int):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(idx)
        end = (
            len(idx) - len(idx) % self.batch_size
            if self.drop_last and len(idx) >= self.batch_size
            else len(idx)
        )
        for s in range(0, end, self.batch_size):
            b = idx[s : s + self.batch_size]
            if self.row_filter is not None and len(b) == self.batch_size:
                b = b[self.row_filter]
            yield b

    def __iter__(self) -> Iterator:
        epoch = self._epoch
        self._epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()
        abandoned = threading.Event()
        error: list[BaseException] = []

        def put(item) -> bool:  # False once the consumer is gone
            while not abandoned.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        pool = (
            ThreadPoolExecutor(self.num_workers, thread_name_prefix="loader")
            if self.num_workers > 0 else None
        )

        def fetch(batch_idx):
            if pool is not None:  # order-preserving parallel item fetch
                return list(pool.map(
                    self.dataset.__getitem__, [int(i) for i in batch_idx]
                ))
            return [self.dataset[int(i)] for i in batch_idx]

        def produce():
            try:
                # datasets with per-item randomness key it on (seed, epoch,
                # idx) — thread-safe under num_workers, replayable on resume
                if hasattr(self.dataset, "set_epoch"):
                    self.dataset.set_epoch(epoch)
                for batch_idx in self._batch_indices(epoch):
                    batch = _collate(fetch(batch_idx), self.batch_transform)
                    if self.with_indices:
                        batch = (batch_idx.astype(np.int32), *batch)
                    if not put(batch):
                        return
            except BaseException as e:  # re-raised in the consumer
                error.append(e)
            finally:
                if pool is not None:
                    pool.shutdown(wait=False)
                put(stop)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    if error:
                        raise error[0]
                    break
                yield item
        finally:
            # consumer broke out early (eval loops cap at N batches): let
            # the producer exit instead of blocking on the full queue
            # forever, leaking a thread + `prefetch` batches per iteration
            abandoned.set()


def build_loader(cfg):
    """(train_dl, val_dl) per the reference's dataset schema
    (build_loader.py:7-38), plus a ``synthetic`` dataset for tests/bench."""
    from attention_models_tpu.data.datasets import (
        CocoCaptions,
        ImageFolder,
        SyntheticImages,
        SyntheticSeq2Seq,
        random_split,
    )
    from attention_models_tpu.data.transforms import (
        NativeBatchTransform,
        get_transform,
    )

    params = cfg.dataset.params
    name = cfg.dataset.name
    native = bool(params.get("native_pipeline", False))
    if native and name == "synthetic":
        # synthetic items are float32 CHW in [0,1]; the native path needs
        # uint8 HWC arrays or raw JPEG bytes — coercion would silently
        # zero every batch
        import logging

        logging.getLogger(__name__).warning(
            "native_pipeline ignored for the synthetic dataset"
        )
        native = False
    train_bt = NativeBatchTransform(cfg, is_train=True) if native else None
    val_bt = NativeBatchTransform(cfg, is_train=False) if native else None

    if name == "coco":
        train_ds = CocoCaptions(cfg, "train2017", is_train=True, raw=native)
        if params.get("train_test_split"):
            train_ds, val_ds = random_split(
                train_ds, float(params.train_test_split),
                seed=int(cfg.training.get("seed", 0) or 0),
            )
        else:
            val_ds = CocoCaptions(cfg, "val2017", is_train=False, raw=native)
    elif name == "imagenet":
        ds = ImageFolder(params.train_path, get_transform(cfg, True),
                         raw=native,
                         seed=int(cfg.training.get("seed", 0) or 0))
        if not params.get("train_test_split"):
            raise ValueError("train_test_split required for imagenet")
        train_ds, val_ds = random_split(
            ds, float(params.train_test_split),
            seed=int(cfg.training.get("seed", 0) or 0),
        )
    elif name == "synthetic":
        pp = cfg.dataset.preprocessing
        n = min(int(cfg.experiment.max_train_examples), 64)
        with_captions = params.get("with_captions", True)
        train_ds = SyntheticImages(n, int(pp.resolution), with_captions)
        val_ds = SyntheticImages(max(n // 4, 2), int(pp.resolution),
                                 with_captions, seed=10_000)
    elif name == "seq2seq":
        # sequence-reversal pairs for the seq2seq Transformer (the one
        # model the reference trains only via a README snippet)
        n = min(int(cfg.experiment.max_train_examples),
                int(params.get("num_examples", 10_000)))
        seq_len = int(params.seq_len)
        vocab = int(params.get("vocab_size", cfg.model.get("vocab_size", 1000)))
        train_ds = SyntheticSeq2Seq(n, seq_len, vocab)
        val_ds = SyntheticSeq2Seq(max(n // 8, 2), seq_len, vocab,
                                  seed=10_000_000)
    else:
        raise ValueError(f"unknown dataset {name!r}")

    workers = int(params.get("num_workers", 0) or 0)
    train_dl = DataLoader(train_ds, int(params.batch_size),
                          shuffle=bool(params.get("shuffle", True)),
                          batch_transform=train_bt, num_workers=workers)
    val_dl = DataLoader(val_ds, int(params.batch_size), shuffle=False,
                        drop_last=False, batch_transform=val_bt,
                        num_workers=workers)
    return train_dl, val_dl


def device_prefetch(iterable, place_fn, depth: int = 2):
    """Overlap host->device transfer with device compute: a background
    thread applies ``place_fn`` (e.g. the trainer's shard_batch) to each
    batch one step ahead, so the DMA for step N+1 runs while step N computes.
    The reference's torch DataLoader has pin_memory in its config but never
    passes it through (SURVEY.md §2.6 build_loader); this is the working
    TPU equivalent."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = object()
    abandoned = threading.Event()
    error: list[BaseException] = []

    def put(item) -> bool:
        while not abandoned.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def produce():
        it = iter(iterable)
        try:
            for item in it:
                if not put(place_fn(item)):
                    break
        except BaseException as e:  # re-raised in the consumer
            error.append(e)
        finally:
            close = getattr(it, "close", None)
            if close is not None:
                close()  # propagate abandonment into the inner DataLoader
            put(stop)

    threading.Thread(target=produce, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is stop:
                if error:
                    raise error[0]
                return
            yield item
    finally:
        abandoned.set()
