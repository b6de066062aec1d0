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
