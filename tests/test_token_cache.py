"""training.cache_vq_tokens: frozen-tokenizer training from cached token
grids. The VQ tokenizer inside MaskGIT/Muse/Parti is frozen, so with
deterministic transforms each sample's token grid never changes — the
trainers pre-tokenize once and skip the VQ encoder forward every step.
(The reference re-runs its frozen tokenizer every training step:
/root/reference/models/muse.py:162, maskgit.py:166.)

Checks: (a) the model-level split loss_from_indices(encode_to_indices(img))
is bit-equal to the fused forward; (b) a cached MaskGIT training run
reproduces the uncached run's loss trajectory; (c) the knob refuses random
augmentations, whose draw a cache would freeze.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attention_models_tpu.data import build_loader
from attention_models_tpu.models.factory import build_model
from attention_models_tpu.models.maskgit import MaskGitTransformer
from attention_models_tpu.models.muse import MUSE
from attention_models_tpu.models.text_encoder import tokenize
from attention_models_tpu.training import build_trainer
from attention_models_tpu.utils.config import load_config

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "cfg_exp")

VQ_CFG = dict(
    vit_params=dict(dim=32, img_size=32, patch_size=8, n_heads=2, d_head=16,
                    depth=1, mlp_dim=64, dropout=0.0),
    codebook_params=dict(codebook_size=32, codebook_dim=8),
)


def _run(cfg_name, tmp_path, **overrides):
    cfg = load_config(os.path.join(CFG_DIR, cfg_name))
    for k, v in overrides.items():
        cfg.set_path(k, v)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        model, patches = build_model(cfg)
        loaders = build_loader(cfg)
        trainer = build_trainer(cfg, model, loaders,
                                pretrained_patches=patches)
        trainer.train()
        return trainer, cfg
    finally:
        os.chdir(cwd)


def _losses(tmp_path, project):
    path = tmp_path / "outputs" / project / "metrics.jsonl"
    with open(path) as f:
        return [json.loads(l)["loss"] for l in f
                if l.strip() and "loss" in json.loads(l)]


def test_maskgit_loss_from_indices_matches_forward():
    model = MaskGitTransformer(dim=32, vq_config=VQ_CFG, vocab_size=32,
                               n_heads=2, d_head=16, dec_depth=1, dropout=0.1)
    img = jnp.asarray(np.random.RandomState(0).rand(2, 3, 32, 32), jnp.float32)
    variables = model.init(
        jax.random.key(0), img, jax.random.key(1),
        method=MaskGitTransformer.init_all,
    )
    rng, drop = jax.random.key(2), jax.random.key(3)

    fused = model.apply(variables, img, rng, deterministic=False,
                        rngs={"dropout": drop})
    ids = model.apply(variables, img,
                      method=MaskGitTransformer.encode_to_indices)
    split = model.apply(variables, ids, rng, deterministic=False,
                        rngs={"dropout": drop},
                        method=MaskGitTransformer.loss_from_indices)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(split))


def test_muse_loss_from_indices_matches_forward():
    model = MUSE(dim=32, vq_config=VQ_CFG, max_length=8, n_heads=2, d_head=16,
                 depth=1, clip_width=32, clip_layers=1, clip_heads=2,
                 dropout=0.1)
    img = jnp.asarray(np.random.RandomState(0).rand(2, 3, 32, 32), jnp.float32)
    text = jnp.asarray(tokenize(["a cat", "a dog"], 8))
    variables = model.init(jax.random.key(0), text, img, jax.random.key(1),
                           method=MUSE.init_all)
    rng, drop = jax.random.key(2), jax.random.key(3)

    fused = model.apply(variables, text, img, rng, deterministic=False,
                        rngs={"dropout": drop})
    ids = model.apply(variables, img, method=MUSE.encode_to_indices)
    split = model.apply(variables, text, ids, rng, deterministic=False,
                        rngs={"dropout": drop},
                        method=MUSE.loss_from_indices)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(split))


@pytest.mark.slow
def test_maskgit_token_cache_matches_uncached_run(tmp_path):
    plain_dir = tmp_path / "plain"
    cached_dir = tmp_path / "cached"
    plain_dir.mkdir()
    cached_dir.mkdir()

    trainer, _ = _run("maskgit_overfit.yaml", plain_dir)
    cached, _ = _run("maskgit_overfit.yaml", cached_dir,
                     **{"training.cache_vq_tokens": True})

    assert cached.cache_tokens and cached._tok_cache is not None
    assert cached._tok_cache.shape[0] == len(cached.train_dl.dataset)

    a = _losses(plain_dir, "maskgit_overfit")
    b = _losses(cached_dir, "maskgit_overfit")
    assert len(a) == len(b) and len(a) > 0
    # same rng stream + exact cached tokens -> same trajectory (tolerance
    # covers XLA fusing the encode differently inside vs outside the step)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_muse_token_cache_runs(tmp_path):
    trainer, _ = _run("muse_overfit.yaml", tmp_path,
                      **{"training.cache_vq_tokens": True})
    assert trainer.cache_tokens
    losses = _losses(tmp_path, "muse_overfit")
    assert losses and all(np.isfinite(losses))


def _build(cfg_name, tmp_path, **overrides):
    cfg = load_config(os.path.join(CFG_DIR, cfg_name))
    for k, v in overrides.items():
        cfg.set_path(k, v)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        model, patches = build_model(cfg)
        loaders = build_loader(cfg)
        return build_trainer(cfg, model, loaders, pretrained_patches=patches)
    finally:
        os.chdir(cwd)


@pytest.mark.slow
def test_token_cache_persisted_and_reused(tmp_path, caplog):
    import logging

    first = _build("maskgit_overfit.yaml", tmp_path,
                   **{"training.cache_vq_tokens": True})
    cache_file = (tmp_path / "outputs" / "maskgit_overfit" / "checkpoints"
                  / "vq_token_cache.npz")
    assert cache_file.exists()

    with caplog.at_level(logging.INFO):
        second = _build("maskgit_overfit.yaml", tmp_path,
                        **{"training.cache_vq_tokens": True})
    assert any("loaded" in r.message for r in caplog.records)
    np.testing.assert_array_equal(first._tok_cache, second._tok_cache)

    # a cache from different vq weights must be detected as stale
    z = np.load(cache_file)
    np.savez(cache_file, cache=z["cache"], digest=np.array("0" * 64))
    with caplog.at_level(logging.WARNING):
        third = _build("maskgit_overfit.yaml", tmp_path,
                       **{"training.cache_vq_tokens": True})
    assert any("stale" in r.message for r in caplog.records)
    np.testing.assert_array_equal(first._tok_cache, third._tok_cache)


@pytest.mark.parametrize("cfg_name,project", [
    ("maskgit_overfit.yaml", "maskgit_overfit"),
    ("muse_overfit.yaml", "muse_overfit"),
])
@pytest.mark.slow
def test_cached_training_skips_image_pipeline(tmp_path, monkeypatch,
                                              cfg_name, project):
    """After pretokenization, cached epochs must never call the dataset's
    __getitem__ — MaskGIT iterates indices only; Muse reads captions through
    the decode-free caption() accessor."""
    trainer = _build(cfg_name, tmp_path,
                     **{"training.cache_vq_tokens": True,
                        "experiment.eval_every": 10_000,
                        "experiment.sample_every": 10_000})
    ds = trainer.train_dl.dataset
    calls = {"n": 0}
    orig = type(ds).__getitem__

    def counting(self, idx):
        calls["n"] += 1
        return orig(self, idx)

    monkeypatch.setattr(type(ds), "__getitem__", counting)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        trainer.train()
    finally:
        os.chdir(cwd)
    assert trainer.global_step > 0
    assert calls["n"] == 0, f"image pipeline ran {calls['n']} times"


@pytest.mark.slow
def test_token_cache_composes_with_tensor_parallel(tmp_path):
    """The token step must respect the (data, model) mesh like the image
    step: params/opt sharded over model, cached token batches over data."""
    trainer, _ = _run("maskgit_overfit.yaml", tmp_path,
                      **{"training.cache_vq_tokens": True,
                         "training.tensor_parallel": 2})
    assert trainer.mesh.shape["model"] == 2
    losses = _losses(tmp_path, "maskgit_overfit")
    assert losses and all(np.isfinite(losses))


def test_token_cache_refuses_random_augmentations(tmp_path):
    with pytest.raises(ValueError, match="deterministic"):
        _run("maskgit_overfit.yaml", tmp_path,
             **{"training.cache_vq_tokens": True,
                "dataset.preprocessing.random_flip": True})
