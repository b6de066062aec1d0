"""Multi-host data-loading seam (single-process checks).

On a multi-host pod, ``dataset.params.batch_size`` is the GLOBAL batch:
each host loads only the rows whose data-parallel shards live on its
devices (``DataLoader.row_filter``), and ``shard_batch`` assembles the
global array from per-device shards (``make_array_from_single_device_
arrays``) because ``device_put`` cannot target non-addressable devices.
These tests pin the single-process degenerate case (host owns every row,
the assembled array equals the device_put path) and the loader filter
contract; real multi-process execution follows the same code path.
"""

import os

import jax
import numpy as np

from attention_models_tpu.data import build_loader
from attention_models_tpu.data.loaders import DataLoader
from attention_models_tpu.models.factory import build_model
from attention_models_tpu.training import build_trainer
from attention_models_tpu.utils.config import load_config

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "cfg_exp")


def _trainer(tmp_path, **overrides):
    cfg = load_config(os.path.join(CFG_DIR, "vit_overfit.yaml"))
    for k, v in overrides.items():
        cfg.set_path(k, v)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        model, patches = build_model(cfg)
        loaders = build_loader(cfg)
        return build_trainer(cfg, model, loaders,
                             pretrained_patches=patches)
    finally:
        os.chdir(cwd)


def test_host_batch_rows_cover_global_batch(tmp_path):
    trainer = _trainer(tmp_path)
    rows = trainer._host_batch_rows()
    # single process: this host owns every row, in order
    np.testing.assert_array_equal(rows, np.arange(trainer.batch_size))


def test_multihost_shard_matches_device_put(tmp_path):
    trainer = _trainer(tmp_path)
    trainer.host_rows = trainer._host_batch_rows()
    arr = np.random.RandomState(0).rand(
        trainer.batch_size, 3, 8, 8
    ).astype(np.float32)

    via_make = trainer._multihost_shard(arr)
    via_put = trainer.shard_batch(arr)
    assert via_make.sharding == via_put.sharding
    np.testing.assert_array_equal(np.asarray(via_make), np.asarray(via_put))

    # host-local input (len == len(host_rows)) assembles identically
    via_local = trainer._multihost_shard(arr[trainer.host_rows])
    np.testing.assert_array_equal(np.asarray(via_local), np.asarray(via_put))


class _Items:
    def __init__(self, n=16):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return np.full((2, 2), i, np.float32), int(i)


def test_row_filter_selects_batch_positions():
    full = DataLoader(_Items(10), 4, shuffle=True, seed=9, drop_last=False)
    filt = DataLoader(_Items(10), 4, shuffle=True, seed=9, drop_last=False)
    filt.row_filter = np.array([1, 3])
    full.set_epoch(2)
    filt.set_epoch(2)
    got_full = list(full)
    got_filt = list(filt)
    assert len(got_full) == len(got_filt) == 3
    # full batches: the filter picks those positions; ragged tail unfiltered
    for (img_f, _), (img_s, _) in zip(got_filt[:2], got_full[:2]):
        np.testing.assert_array_equal(img_f, img_s[[1, 3]])
    np.testing.assert_array_equal(got_filt[2][0], got_full[2][0])
