"""DataLoader contracts: deterministic per-epoch shuffle (set_epoch), and
no producer-thread leak when a consumer abandons iteration early (eval
loops cap at N batches every eval_every steps — each abandonment used to
park a thread on q.put forever holding `prefetch` batches)."""

import threading
import time

import numpy as np

from attention_models_tpu.data.loaders import DataLoader, device_prefetch


class _Items:
    def __init__(self, n=16):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((2, 2), i, np.float32), int(i)


def _first_batch_ids(dl):
    it = iter(dl)
    imgs, _ = next(it)
    for _ in it:  # drain
        pass
    return imgs[:, 0, 0].astype(int).tolist()


def test_set_epoch_pins_shuffle_permutation():
    a = DataLoader(_Items(), batch_size=4, shuffle=True, seed=7)
    b = DataLoader(_Items(), batch_size=4, shuffle=True, seed=7)
    # same epoch index -> same permutation, across fresh instances (the
    # mid-epoch-resume contract); different epochs -> different ones
    a.set_epoch(3)
    b.set_epoch(3)
    e3 = _first_batch_ids(a)
    assert _first_batch_ids(b) == e3
    b.set_epoch(4)
    assert _first_batch_ids(b) != e3
    # without set_epoch the counter advances per-iteration as before
    c = DataLoader(_Items(), batch_size=4, shuffle=True, seed=7)
    assert _first_batch_ids(c) != _first_batch_ids(c)


def _wait_threads(n0, timeout=5.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if threading.active_count() <= n0:
            return True
        time.sleep(0.05)
    return False


def test_abandoned_iteration_releases_producer_thread():
    dl = DataLoader(_Items(64), batch_size=2, shuffle=False, prefetch=2)
    n0 = threading.active_count()
    for _ in range(5):
        it = iter(dl)
        next(it)  # take one batch, walk away (eval-style early break)
        it.close()
    assert _wait_threads(n0), (
        f"{threading.active_count() - n0} producer threads leaked"
    )


def test_abandoned_device_prefetch_releases_threads():
    dl = DataLoader(_Items(64), batch_size=2, shuffle=False, prefetch=2)
    n0 = threading.active_count()
    for _ in range(5):
        it = device_prefetch(iter(dl), lambda b: b)
        next(it)
        it.close()
    assert _wait_threads(n0), (
        f"{threading.active_count() - n0} threads leaked"
    )


def test_num_workers_preserves_order_and_content():
    """num_workers > 0 fetches items through a thread pool but must yield
    byte-identical batches in the same order as the serial path (the knob is
    in every shipped config; torch's DataLoader has the same contract)."""
    serial = DataLoader(_Items(13), 4, shuffle=True, seed=3, drop_last=False)
    pooled = DataLoader(_Items(13), 4, shuffle=True, seed=3, drop_last=False,
                        num_workers=3)
    serial.set_epoch(1)
    pooled.set_epoch(1)
    got_s = list(serial)
    got_p = list(pooled)
    assert len(got_s) == len(got_p) == 4
    for (img_s, lab_s), (img_p, lab_p) in zip(got_s, got_p):
        np.testing.assert_array_equal(img_s, img_p)
        np.testing.assert_array_equal(lab_s, lab_p)


def test_with_indices_prepends_sample_indices():
    dl = DataLoader(_Items(8), 4, shuffle=True, seed=0, with_indices=True)
    for idx, imgs, labels in dl:
        assert idx.dtype == np.int32
        # the indices identify exactly the samples in the batch
        np.testing.assert_array_equal(imgs[:, 0, 0].astype(np.int32), idx)
        np.testing.assert_array_equal(np.asarray(labels, np.int32), idx)
