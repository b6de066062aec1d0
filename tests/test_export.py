"""Serving-export roundtrip: export a model surface to a self-contained
StableHLO artifact, reload it, and check the reloaded graph reproduces the
live model bit-for-bit. The reference's only deployment artifact is a
pickled state_dict requiring the full model zoo at load time
(/root/reference/trainers/utils/base_trainer.py:92-107)."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from attention_models_tpu.models.vitvqgan import ViTVQGAN
from attention_models_tpu.utils.export import export_fn, load_fn


def tiny_vitvqgan():
    return ViTVQGAN(
        vit_params=dict(dim=64, img_size=32, patch_size=8, n_heads=2,
                        d_head=32, depth=2, mlp_dim=128, dropout=0.0),
        codebook_params=dict(codebook_size=64, codebook_dim=8),
    )


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
    )
    assert r.returncode == 0, r.stderr[-2000:]
    m = load_fn(out)
    assert m.header["meta"]["model"] == "vitvqgan"
    res = m.header["meta"]["resolution"]
    got = m.call(jnp.zeros((1, 3, res, res), jnp.float32))
    assert got.shape[0] == 1
