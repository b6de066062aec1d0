"""Model-level W8A8 quantized inference (``quant="int8"`` — ops/quant.py).

Invariants pinned here:
  - the quant and non-quant constructions share one param pytree
    (same paths, shapes, dtypes) — trained checkpoints load into the
    quantized model unchanged;
  - quantized decoder logits stay directionally faithful to the fp32
    logits on the same weights;
  - the full generate() scan jits and runs under quant;
  - trainers refuse quant configs (inference-only path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attention_models_tpu.models.maskgit import BiDirectionalTransformer
from attention_models_tpu.models.muse import MUSE, BidirectionalDecoder

VQ_CFG = dict(
    vit_params=dict(dim=32, img_size=32, patch_size=8, n_heads=2, d_head=16,
                    depth=1, mlp_dim=64, dropout=0.0),
    codebook_params=dict(codebook_size=32, codebook_dim=8),
)


def _tree_spec(params):
    return [
        (jax.tree_util.keystr(k), v.shape, str(v.dtype))
        for k, v in jax.tree_util.tree_leaves_with_path(params)
    ]


def test_quant_param_tree_identical():
    """quant="int8" must not change the checkpoint format."""
    kw = dict(dim=32, codebook_size=32, n_heads=2, d_head=16, depth=2,
              mult=4, dropout=0.0, num_patches=16)
    ids = jnp.zeros((2, 16), jnp.int32)
    ctx = jnp.zeros((2, 4, 32), jnp.float32)
    p_ref = BidirectionalDecoder(**kw).init(jax.random.key(0), ids, ctx)
    p_q = BidirectionalDecoder(**kw, quant="int8").init(
        jax.random.key(0), ids, ctx)
    assert _tree_spec(p_ref) == _tree_spec(p_q)


def test_quant_decoder_logits_faithful():
    """Same weights, quantized vs fp32 forward: cosine > 0.99 overall and
    the argmax agrees on most positions (tiny random model, so ties are
    common — trained logits separate much harder)."""
    kw = dict(dim=32, codebook_size=32, n_heads=2, d_head=16, depth=2,
              mult=4, dropout=0.0, num_patches=16)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 32, (2, 16)))
    ctx = jnp.asarray(np.random.RandomState(1).standard_normal((2, 4, 32)),
                      jnp.float32)
    params = BidirectionalDecoder(**kw).init(jax.random.key(0), ids, ctx)
    ref = BidirectionalDecoder(**kw).apply(params, ids, ctx)
    got = BidirectionalDecoder(**kw, quant="int8").apply(params, ids, ctx)
    r = np.asarray(ref).ravel()
    g = np.asarray(got).ravel()
    cos = (r * g).sum() / (np.linalg.norm(r) * np.linalg.norm(g))
    assert cos > 0.99, cos
    agree = (np.asarray(ref).argmax(-1) == np.asarray(got).argmax(-1)).mean()
    assert agree > 0.8, agree


def test_maskgit_transformer_quant_tree_and_forward():
    kw = dict(dim=32, vocab_size=32, num_patches=16, n_heads=2, d_head=16,
              dec_depth=2, mult=4, dropout=0.0)
    ids = jnp.zeros((2, 16), jnp.int32)
    p_ref = BiDirectionalTransformer(**kw).init(jax.random.key(0), ids)
    p_q = BiDirectionalTransformer(**kw, quant="int8").init(
        jax.random.key(0), ids)
    assert _tree_spec(p_ref) == _tree_spec(p_q)
    out = BiDirectionalTransformer(**kw, quant="int8").apply(p_ref, ids)
    assert out.shape == (2, 16, 32)
    assert np.isfinite(np.asarray(out, np.float32)).all()


@pytest.mark.slow
def test_muse_generate_jits_under_quant():
    """The full CFG decode scan compiles and runs with quant="int8"
    (CPU path: XLA quant_dot + unfused W8A8 FFN)."""
    import functools

    muse = MUSE(dim=32, vq_config=VQ_CFG, max_length=4, n_heads=2, d_head=16,
                depth=1, mult=4, clip_width=32, clip_layers=1, clip_heads=2,
                quant="int8")
    ids = jnp.zeros((1, 4), jnp.int32)
    imgs = jnp.zeros((1, 3, 32, 32), jnp.float32)
    ref = MUSE(dim=32, vq_config=VQ_CFG, max_length=4, n_heads=2, d_head=16,
               depth=1, mult=4, clip_width=32, clip_layers=1, clip_heads=2)
    params = ref.init(jax.random.key(0), ids, imgs, jax.random.key(1),
                      method=MUSE.init_all)
    gen = jax.jit(functools.partial(muse.apply, timesteps=3,
                                    method=MUSE.generate))
    out = gen(params, ids, jax.random.key(2))
    assert out.shape == (1, 3, 32, 32)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_quant_composes_with_scan_layers():
    """quant="int8" through the nn.scan-stacked layer path (the
    training.scan_layers layout) — same weights, faithful logits."""
    kw = dict(dim=32, codebook_size=32, n_heads=2, d_head=16, depth=2,
              mult=4, dropout=0.0, num_patches=16, scan_layers=True)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 32, (2, 16)))
    ctx = jnp.asarray(np.random.RandomState(1).standard_normal((2, 4, 32)),
                      jnp.float32)
    params = BidirectionalDecoder(**kw).init(jax.random.key(0), ids, ctx)
    ref = BidirectionalDecoder(**kw).apply(params, ids, ctx)
    got = BidirectionalDecoder(**kw, quant="int8").apply(params, ids, ctx)
    r = np.asarray(ref).ravel()
    g = np.asarray(got).ravel()
    cos = (r * g).sum() / (np.linalg.norm(r) * np.linalg.norm(g))
    assert cos > 0.99, cos


def test_vitvqgan_quant_tree_and_roundtrip():
    """Quantized tokenizer: same param tree; encode→decode round trip runs
    and the recon stays close to the fp32 recon on the same weights (the
    codebook argmin itself always stays fp32 — the golden bit-match path)."""
    from attention_models_tpu.models.vitvqgan import ViTVQGAN

    kw = dict(
        vit_params=dict(dim=32, img_size=32, patch_size=8, n_heads=2,
                        d_head=16, depth=2, mlp_dim=64, dropout=0.0),
        codebook_params=dict(codebook_size=32, codebook_dim=8),
    )
    imgs = jnp.asarray(
        np.random.RandomState(0).rand(2, 3, 32, 32), jnp.float32)
    ref = ViTVQGAN(**kw)
    q = ViTVQGAN(**kw, quant="int8")
    params = ref.init(jax.random.key(0), imgs)
    p_q = q.init(jax.random.key(0), imgs)
    assert _tree_spec(params) == _tree_spec(p_q)

    rec_ref, _ = ref.apply(params, imgs)
    rec_q, _ = q.apply(params, imgs)
    r = np.asarray(rec_ref).ravel()
    g = np.asarray(rec_q).ravel()
    cos = (r * g).sum() / (np.linalg.norm(r) * np.linalg.norm(g))
    assert cos > 0.99, cos

    idx = q.apply(params, imgs, method=ViTVQGAN.encode_imgs)
    out = q.apply(params, idx, method=ViTVQGAN.decode_indices)
    assert out.shape == imgs.shape
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_parti_quant_tree_and_cached_decode():
    """Parti int8: identical param tree (incl. the quantized to_logits
    head) and the cached KV-decode fori_loop — the only consumer that runs
    quant_dot in decode mode — generates finite images."""
    from attention_models_tpu.models.parti import Parti, parti_generate

    kw = dict(dim=32, vq_config=VQ_CFG, max_length=4, n_heads=2, d_head=16,
              depth=1, clip_width=32, clip_layers=1, clip_heads=2)
    ids = jnp.zeros((1, 4), jnp.int32)
    imgs = jnp.zeros((1, 3, 32, 32), jnp.float32)
    ref = Parti(**kw)
    q = Parti(**kw, quant="int8")
    params = ref.init(jax.random.key(0), ids, imgs, method=Parti.init_all)
    p_q = q.init(jax.random.key(0), ids, imgs, method=Parti.init_all)
    assert _tree_spec(params) == _tree_spec(p_q)

    out = parti_generate(q, params, ids, jax.random.key(2))
    assert out.shape == (1, 3, 32, 32)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_parti_run_cache_is_lru(monkeypatch):
    """A cache hit refreshes recency, so the hottest decode program
    survives eviction pressure (FIFO would evict it first)."""
    from collections import OrderedDict

    from attention_models_tpu.models import parti as parti_mod

    m = parti_mod.Parti(dim=32, vq_config=VQ_CFG, max_length=4, n_heads=2,
                        d_head=16, depth=1, clip_width=32, clip_layers=1,
                        clip_heads=2)
    monkeypatch.setattr(parti_mod, "_RUN_CACHE", OrderedDict())
    monkeypatch.setattr(parti_mod, "_RUN_CACHE_MAX", 2)
    hot = parti_mod._parti_run(m, 0.9, True)
    parti_mod._parti_run(m, 0.8, True)
    assert parti_mod._parti_run(m, 0.9, True) is hot  # hit → most recent
    parti_mod._parti_run(m, 0.7, True)  # evicts 0.8, not the hot entry
    assert parti_mod._parti_run(m, 0.9, True) is hot
    assert (id(m), 0.8, True) not in parti_mod._RUN_CACHE


def test_trainer_refuses_quant_config():
    from attention_models_tpu.training.build_trainer import build_trainer
    from attention_models_tpu.utils.config import Config

    cfg = Config({"model": {"name": "maskgit", "quant": "int8"}})
    with pytest.raises(ValueError, match="inference-only"):
        build_trainer(cfg, None, (None, None))
