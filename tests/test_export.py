"""Serving-export roundtrip: export a model surface to a self-contained
StableHLO artifact, reload it, and check the reloaded graph reproduces the
live model bit-for-bit. The reference's only deployment artifact is a
pickled state_dict requiring the full model zoo at load time
(/root/reference/trainers/utils/base_trainer.py:92-107)."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attention_models_tpu.models.vitvqgan import ViTVQGAN
from attention_models_tpu.utils.export import export_fn, load_fn

# CLI subprocess tests must not depend on the pytest process CWD
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_vitvqgan():
    return ViTVQGAN(
        vit_params=dict(dim=64, img_size=32, patch_size=8, n_heads=2,
                        d_head=32, depth=2, mlp_dim=128, dropout=0.0),
        codebook_params=dict(codebook_size=64, codebook_dim=8),
    )


@pytest.mark.slow
def test_export_recon_roundtrip(tmp_path):
    model = tiny_vitvqgan()
    imgs = jnp.array(np.random.RandomState(0).rand(2, 3, 32, 32), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), imgs)

    fn = lambda x: model.apply(variables, x)[0]
    path = str(tmp_path / "recon.amtpu")
    export_fn(fn, (imgs,), path, meta={"surface": "recon"})

    loaded = load_fn(path)
    assert loaded.header["meta"]["surface"] == "recon"
    assert "cpu" in loaded.platforms
    got = np.asarray(loaded.call(imgs))
    want = np.asarray(jax.jit(fn)(imgs))
    np.testing.assert_array_equal(got, want)


def test_export_encode_indices_roundtrip(tmp_path):
    model = tiny_vitvqgan()
    imgs = jnp.array(np.random.RandomState(1).rand(2, 3, 32, 32), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), imgs)

    fn = lambda x: model.apply(variables, x, method=ViTVQGAN.encode_imgs)
    path = str(tmp_path / "encode.amtpu")
    export_fn(fn, (imgs,), path)
    idx = np.asarray(load_fn(path).call(imgs))
    np.testing.assert_array_equal(idx, np.asarray(jax.jit(fn)(imgs)))
    assert idx.dtype == np.int32


def test_export_rejects_foreign_file(tmp_path):
    p = tmp_path / "bogus.amtpu"
    p.write_bytes(b"not an export at all")
    try:
        load_fn(str(p))
    except ValueError as e:
        assert "not an attention-models-tpu export" in str(e)
    else:
        raise AssertionError("expected ValueError")


def test_export_cli_runs(tmp_path):
    """The CLI exports a tiny overfit-config model end-to-end."""
    out = str(tmp_path / "m.amtpu")
    r = subprocess.run(
        [sys.executable, "inference/export.py",
         "--config=cfg_exp/vitvqgan_overfit.yaml", "--surface=encode",
         "--batch=1", f"--output={out}"],
        capture_output=True, text=True, timeout=600,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root"},
        cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = load_fn(out)
    assert m.header["meta"]["model"] == "vitvqgan"
    res = m.header["meta"]["resolution"]
    got = m.call(jnp.zeros((1, 3, res, res), jnp.float32))
    assert got.shape[0] == 1


def test_trained_checkpoint_loads_into_inference_template(tmp_path):
    """The CLIs restore {step, params|g_params} out of the trainer's FULL
    saved state (opt, host_rng, ...). Regression: StandardRestore rejects a
    template that doesn't cover the on-disk tree, so without partial
    restore no trained checkpoint could ever be loaded by any inference
    CLI."""
    from attention_models_tpu.utils.checkpoint import CheckpointManager

    import optax

    model = tiny_vitvqgan()
    imgs = jnp.array(np.random.RandomState(0).rand(2, 3, 32, 32), jnp.float32)
    variables = jax.jit(model.init)(jax.random.key(0), imgs)
    tx = optax.adam(1e-3)
    full_state = {
        "step": 7,
        "g_params": variables["params"],
        "opt": tx.init(variables["params"]),
        "host_rng": np.arange(4, dtype=np.uint32),
    }
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(7, full_state, wait=True)

    # the inference-CLI template: weights only
    fresh = jax.jit(model.init)(jax.random.key(1), imgs)
    state = CheckpointManager(str(tmp_path / "ckpt")).restore(
        {"step": 0, "g_params": fresh["params"]}, partial=True
    )
    assert state is not None and int(np.asarray(state["step"])) == 7
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        state["g_params"], variables["params"],
    )

    # unknown template keys fail loudly, not silently
    import pytest

    with pytest.raises(KeyError):
        CheckpointManager(str(tmp_path / "ckpt")).restore(
            {"nope": 0}, partial=True
        )


@pytest.mark.slow
def test_export_cli_generate_surface_loads_checkpoint(tmp_path):
    """--surface generate must bake TRAINED weights (regression: the
    generator branch ignored --ckpt and exported random init silently).
    The CLI's own init is deterministic (jax.random.key(0)), so exporting
    with and without --ckpt must produce DIFFERENT generate outputs —
    identical outputs mean the checkpoint was dropped."""
    import functools

    from attention_models_tpu.models.factory import build_model
    from attention_models_tpu.utils.checkpoint import CheckpointManager
    from attention_models_tpu.utils.config import load_config

    cfg = load_config(os.path.join(REPO, "cfg_exp/maskgit_overfit.yaml"))
    model, _ = build_model(cfg)
    res = int(cfg.dataset.preprocessing.resolution)
    imgs = jnp.zeros((1, 3, res, res), jnp.float32)
    variables = jax.jit(functools.partial(
        model.init, method=type(model).init_all))(
            jax.random.key(3), imgs, jax.random.key(4))
    # distinguishable "trained" weights: scaled away from any fresh init
    marked = jax.tree.map(lambda x: 3.0 * x, variables["params"])
    ckpt_dir = str(tmp_path / "ckpt")
    CheckpointManager(ckpt_dir).save(
        1, {"step": 1, "params": marked, "host_rng": np.arange(4, dtype=np.uint32)},
        wait=True,
    )

    def export(out, *extra):
        r = subprocess.run(
            [sys.executable, "inference/export.py",
             "--config=cfg_exp/maskgit_overfit.yaml", "--surface=generate",
             "--batch=1", "--timesteps=2", f"--output={out}", *extra],
            capture_output=True, text=True, timeout=600,
            env={"JAX_PLATFORMS": "cpu",
                 "PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root"},
            cwd=REPO,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return r

    out_ckpt = str(tmp_path / "g.amtpu")
    r = export(out_ckpt, f"--ckpt={ckpt_dir}")
    assert "exporting random init" not in r.stderr, "checkpoint was not loaded"
    m = load_fn(out_ckpt)
    img = m.call(jax.random.key(9))
    assert img.shape[0] == 1 and np.isfinite(np.asarray(img)).all()

    out_fresh = str(tmp_path / "fresh.amtpu")
    r = export(out_fresh)
    assert "exporting random init" in r.stderr  # the cooperative warning
    img_fresh = load_fn(out_fresh).call(jax.random.key(9))
    assert not np.array_equal(np.asarray(img), np.asarray(img_fresh)), (
        "generate output is identical with and without --ckpt: the trained "
        "weights were not baked into the export"
    )
