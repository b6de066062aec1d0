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


def _make_coco_fixture(root, n=6):
    """Tiny on-disk COCO-captions layout for loader determinism tests."""
    import json as _json
    import os

    from PIL import Image

    img_dir = os.path.join(root, "train2017")
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    images, anns = [], []
    for i in range(n):
        name = f"{i:06d}.jpg"
        arr = (np.random.RandomState(i).rand(40, 48, 3) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, name))
        images.append({"id": i, "file_name": name})
        for c in range(3):  # several captions -> caption choice draws rng
            anns.append({"image_id": i, "caption": f"caption {i}-{c}"})
    with open(os.path.join(ann_dir, "captions_train2017.json"), "w") as f:
        _json.dump({"images": images, "annotations": anns}, f)


def test_num_workers_deterministic_with_rng_consuming_dataset(tmp_path):
    """CocoCaptions draws rng per item (caption choice, random crop/flip).
    With num_workers > 0 those draws must not depend on thread scheduling:
    the same (seed, epoch) yields byte-identical batches as the serial
    loader, run after run (per-(seed, epoch, idx) Generators, not a shared
    stream)."""
    from attention_models_tpu.data.datasets import CocoCaptions
    from attention_models_tpu.utils.config import load_config
    import os

    _make_coco_fixture(tmp_path / "coco")
    cfg = load_config(os.path.join(os.path.dirname(__file__), "..",
                                   "cfg_exp", "muse_overfit.yaml"))
    cfg.set_path("dataset.params.train_path", str(tmp_path / "coco"))
    cfg.set_path("dataset.preprocessing.resolution", 32)
    cfg.set_path("dataset.preprocessing.random_crop", True)
    cfg.set_path("dataset.preprocessing.random_flip", True)
    cfg.set_path("dataset.preprocessing.scale", 0.8)
    cfg.set_path("experiment.max_train_examples", 6)

    ds = CocoCaptions(cfg, "train2017", is_train=True)

    def epoch_batches(workers):
        dl = DataLoader(ds, 2, shuffle=True, seed=5, num_workers=workers)
        dl.set_epoch(3)
        return list(dl)

    serial = epoch_batches(0)
    for _ in range(3):  # repeated pooled runs: no scheduling dependence
        pooled = epoch_batches(3)
        assert len(serial) == len(pooled)
        for (img_s, cap_s), (img_p, cap_p) in zip(serial, pooled):
            np.testing.assert_array_equal(img_s, img_p)
            assert list(cap_s) == list(cap_p)

    # caption() (decode-free accessor) must return __getitem__'s draw
    ds.set_epoch(7)
    caps = [ds.caption(i) for i in range(6)]
    items = [ds[i][1] for i in range(6)]
    assert caps == items
