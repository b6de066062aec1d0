"""Functional tests for the token-space generators (MaskGIT, Muse, Parti):
shapes, jit-compatibility of the scan decode loops, gradient flow, frozen-vq
semantics, and KV-cache correctness vs non-cached decoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attention_models_tpu.models.maskgit import MaskGitTransformer
from attention_models_tpu.models.muse import MUSE
from attention_models_tpu.models.parti import Parti, parti_generate
from attention_models_tpu.models.text_encoder import tokenize

TINY_VQ = dict(
    vit_params=dict(dim=32, img_size=16, patch_size=8, n_heads=2, d_head=16,
                    depth=1, mlp_dim=64, dropout=0.0),
    codebook_params=dict(codebook_size=32, codebook_dim=8),
)
TINY_CLIP = dict(clip_width=32, clip_layers=1, clip_heads=2)


@pytest.fixture(scope="module")
def maskgit():
    m = MaskGitTransformer(dim=32, vq_config=TINY_VQ, vocab_size=32,
                           n_heads=2, d_head=16, dec_depth=1, dropout=0.0)
    imgs = jnp.zeros((2, 3, 16, 16))
    params = m.init(jax.random.key(0), imgs, jax.random.key(1),
                    method=MaskGitTransformer.init_all)
    return m, params


def test_maskgit_training_loss_and_grads(maskgit):
    m, params = maskgit
    imgs = jnp.array(np.random.RandomState(0).rand(2, 3, 16, 16), jnp.float32)

    def loss_fn(p):
        return m.apply(p, imgs, jax.random.key(1), deterministic=True)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    # frozen-vq contract: stop_gradient keeps vq grads at zero
    vq_norm = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree.leaves(grads["params"]["vq"])
    )
    bt_norm = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree.leaves(grads["params"]["bidirectional_transformer"])
    )
    assert vq_norm == 0.0
    assert bt_norm > 0.0


def test_maskgit_generate_jits(maskgit):
    m, params = maskgit

    @jax.jit
    def gen(p, rng):
        return m.apply(p, rng, batch=2, num_masked=4, timesteps=4,
                       method=MaskGitTransformer.generate)

    out = gen(params, jax.random.key(2))
    assert out.shape == (2, 3, 16, 16)
    assert np.all(np.isfinite(np.asarray(out)))


def test_maskgit_generate_approx_topk_path(maskgit):
    """The opt-in fast sampling path (approx_topk=True: fused epilogue /
    counting-bisection threshold instead of the reference-exact lax.top_k)
    must produce valid finite images of the same shape — it is what bench
    and the inference CLIs run, but no test covered it."""
    m, params = maskgit
    out = m.apply(params, jax.random.key(5), batch=2, num_masked=4,
                  timesteps=3, approx_topk=True,
                  method=MaskGitTransformer.generate)
    assert out.shape == (2, 3, 16, 16)
    assert np.all(np.isfinite(np.asarray(out)))


def test_maskgit_inpainting_path(maskgit):
    m, params = maskgit
    imgs = jnp.array(np.random.RandomState(1).rand(2, 3, 16, 16), jnp.float32)
    out = m.apply(params, jax.random.key(3), imgs=imgs, num_masked=2,
                  timesteps=2, method=MaskGitTransformer.generate)
    assert out.shape == (2, 3, 16, 16)


@pytest.fixture(scope="module")
def muse():
    m = MUSE(dim=32, vq_config=TINY_VQ, max_length=8, n_heads=2, d_head=16,
             depth=1, mult=2, dropout=0.0, **TINY_CLIP)
    ids = jnp.array(tokenize(["a cat", "a dog"], max_length=8))
    imgs = jnp.zeros((2, 3, 16, 16))
    params = m.init(jax.random.key(0), ids, imgs, jax.random.key(1),
                    method=MUSE.init_all)
    return m, params, ids


def test_muse_training_loss_freezes_vq_and_text(muse):
    m, params, ids = muse
    imgs = jnp.array(np.random.RandomState(0).rand(2, 3, 16, 16), jnp.float32)

    def loss_fn(p):
        return m.apply(p, ids, imgs, jax.random.key(1), deterministic=True)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    for frozen in ("vq", "text_encoder"):
        norm = sum(
            float(jnp.sum(jnp.abs(g)))
            for g in jax.tree.leaves(grads["params"][frozen])
        )
        assert norm == 0.0, frozen
    dec_norm = sum(
        float(jnp.sum(jnp.abs(g)))
        for g in jax.tree.leaves(grads["params"]["decoder"])
    )
    assert dec_norm > 0.0


def test_muse_generate_with_cfg_jits(muse):
    m, params, ids = muse

    @jax.jit
    def gen(p, ids, rng):
        return m.apply(p, ids, rng, timesteps=3, method=MUSE.generate)

    out = gen(params, ids, jax.random.key(2))
    assert out.shape == (2, 3, 16, 16)
    assert np.all(np.isfinite(np.asarray(out)))


def test_muse_generate_approx_topk_path(muse):
    """Fast-sampling flag on the CFG decode (what bench/inference run)."""
    m, params, ids = muse
    out = m.apply(params, ids, jax.random.key(4), timesteps=3,
                  approx_topk=True, method=MUSE.generate)
    assert out.shape == (2, 3, 16, 16)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_parti_train_and_cached_generate():
    vq_cfg = dict(kind="vitvqgan", **TINY_VQ)
    m = Parti(dim=32, vq_config=vq_cfg, max_length=8, n_heads=2, d_head=16,
              depth=1, **TINY_CLIP)
    ids = jnp.array(tokenize(["x"], max_length=8))
    imgs = jnp.array(np.random.RandomState(0).rand(1, 3, 16, 16), jnp.float32)
    params = m.init(jax.random.key(0), ids, imgs, method=Parti.init_all)

    loss = m.apply(params, ids, imgs)
    assert np.isfinite(float(loss))

    out = parti_generate(m, params, ids, jax.random.key(1))
    assert out.shape == (1, 3, 16, 16)
    assert np.all(np.isfinite(np.asarray(out)))

    # repeated serving calls reuse ONE jitted program (re-tracing per call
    # used to dominate wall clock: 18.4 "ms/step" vs 0.8 compiled on v5e)
    from attention_models_tpu.models.parti import _parti_run

    assert _parti_run(m, 0.9, True) is _parti_run(m, 0.9, True)
    out2 = parti_generate(m, params, ids, jax.random.key(1))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_parti_kv_cache_matches_full_forward():
    """Cached single-token decode must reproduce the full causal forward."""
    vq_cfg = dict(kind="vitvqgan", **TINY_VQ)
    m = Parti(dim=32, vq_config=vq_cfg, max_length=8, n_heads=2, d_head=16,
              depth=2, **TINY_CLIP)
    ids = jnp.array(tokenize(["x"], max_length=8))
    imgs = jnp.zeros((1, 3, 16, 16))
    params = m.init(jax.random.key(0), ids, imgs, method=Parti.init_all)

    ctx = m.apply(params, ids, method=Parti.prepare_context)
    rs = np.random.RandomState(2)
    n = 4  # decode 4 fixed tokens
    toks = jnp.array(rs.randint(0, 32, (1, n)))

    # full forward: start + embedded toks, causal
    def full(p):
        dec_in = m.apply(p, toks, method=Parti._embed_prefix)
        x = m.apply(p, dec_in, method=lambda mm, v: mm.init_norm(v))
        x = m.apply(
            p, x, ctx, method=lambda mm, v, c: mm.transformer_decoder(
                v, c, causal=True
            ),
        )
        x = m.apply(p, x, method=lambda mm, v: mm.final_norm(v))
        return m.apply(p, x, method=lambda mm, v: mm.to_logits(v))

    logits_full = full(params)  # (1, n+1, C)

    # cached stepwise
    tok = m.apply(params, 1, method=Parti.start_embed)
    _, vars0 = m.apply(params, tok, ctx, method=Parti.decode_step,
                       mutable=["cache"])
    cache = jax.tree.map(jnp.zeros_like, vars0["cache"])
    # cache has exactly num_patches slots (= n here): compare the n steps a
    # real generation performs (start + first n-1 sampled tokens)
    outs = []
    for i in range(n):
        logits, upd = m.apply({**params, "cache": cache}, tok, ctx,
                              method=Parti.decode_step, mutable=["cache"])
        cache = upd["cache"]
        outs.append(np.asarray(logits[:, 0]))
        if i < n - 1:
            tok = m.apply(params, toks[:, i : i + 1], i,
                          method=Parti.embed_token)
    logits_cached = np.stack(outs, axis=1)
    np.testing.assert_allclose(
        logits_cached, np.asarray(logits_full)[:, :n], atol=2e-4, rtol=1e-2
    )


def test_parti_cfg_scale_one_equals_unguided():
    """guidance_scale=1 through the two-stream CFG machinery mixes logits to
    exactly the conditional stream, so with the same rng it must reproduce
    the unguided decode — a bit-level check of the stream bookkeeping. The
    reference's Parti never implemented its CFG TODO (parti.py:47)."""
    vq_cfg = dict(kind="vitvqgan", **TINY_VQ)
    m = Parti(dim=32, vq_config=vq_cfg, max_length=8, n_heads=2, d_head=16,
              depth=1, **TINY_CLIP)
    ids = jnp.array(tokenize(["x", "y"], max_length=8))
    imgs = jnp.array(np.random.RandomState(0).rand(2, 3, 16, 16), jnp.float32)
    params = m.init(jax.random.key(0), ids, imgs, method=Parti.init_all)

    plain = parti_generate(m, params, ids, jax.random.key(7))
    cfg1 = parti_generate(m, params, ids, jax.random.key(7),
                          guidance_scale=1.0)
    np.testing.assert_allclose(np.asarray(cfg1), np.asarray(plain),
                               rtol=1e-5, atol=1e-5)

    # a real guidance scale runs and changes the samples
    cfg3 = parti_generate(m, params, ids, jax.random.key(7),
                          guidance_scale=3.0)
    assert cfg3.shape == plain.shape
    assert np.all(np.isfinite(np.asarray(cfg3)))


def test_parti_temperature_zero_is_deterministic_argmax():
    """temperature=0 must decode greedily: rng-independent output, and
    different from the tau=1 sampled decode's dependence on rng. This is
    the eval mode the overfit configs use (training.eval_temperature) —
    free-running AR decode of a memorized model derails under sampling."""
    vq_cfg = dict(kind="vitvqgan", **TINY_VQ)
    m = Parti(dim=32, vq_config=vq_cfg, max_length=8, n_heads=2, d_head=16,
              depth=1, **TINY_CLIP)
    ids = jnp.array(tokenize(["x", "y"], max_length=8))
    imgs = jnp.array(np.random.RandomState(0).rand(2, 3, 16, 16), jnp.float32)
    params = m.init(jax.random.key(0), ids, imgs, method=Parti.init_all)

    g0a = parti_generate(m, params, ids, jax.random.key(1), temperature=0.0)
    g0b = parti_generate(m, params, ids, jax.random.key(2), temperature=0.0)
    np.testing.assert_array_equal(np.asarray(g0a), np.asarray(g0b))

    s1 = parti_generate(m, params, ids, jax.random.key(1))
    s2 = parti_generate(m, params, ids, jax.random.key(2))
    assert not np.array_equal(np.asarray(s1), np.asarray(s2))


def test_parti_axon_workaround_matches_plain_greedy():
    """axon_workaround=True (host-stepped decode — the mitigation for the
    tunneled-axon batch-position decode corruption,
    tools/axon_decode_repro.py) must be semantically invisible on a
    healthy backend: greedy decode bit-equals the plain jitted-loop
    path."""
    vq_cfg = dict(kind="vitvqgan", **TINY_VQ)
    m = Parti(dim=32, vq_config=vq_cfg, max_length=8, n_heads=2, d_head=16,
              depth=1, **TINY_CLIP)
    ids = jnp.array(tokenize(["x", "y", "z"], max_length=8))
    imgs = jnp.array(np.random.RandomState(0).rand(3, 3, 16, 16), jnp.float32)
    params = m.init(jax.random.key(0), ids, imgs, method=Parti.init_all)

    plain = parti_generate(m, params, ids, jax.random.key(1),
                           temperature=0.0)
    mitigated = parti_generate(m, params, ids, jax.random.key(1),
                               temperature=0.0, axon_workaround=True)
    assert mitigated.shape == plain.shape
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(mitigated))


def test_parti_cond_keep_prob_drops_context_in_training():
    """cond_keep_prob < 1 zeroes some samples' text context during training
    (the CFG null stream's training signal, MUSE semantics); deterministic
    eval keeps it. Dropped context must change the loss."""
    vq_cfg = dict(kind="vitvqgan", **TINY_VQ)
    kw = dict(dim=32, vq_config=vq_cfg, max_length=8, n_heads=2, d_head=16,
              depth=1, **TINY_CLIP)
    m_ref = Parti(**kw)
    m_drop = Parti(cond_keep_prob=0.0, **kw)  # always drop: deterministic
    ids = jnp.array(tokenize(["x"], max_length=8))
    imgs = jnp.array(np.random.RandomState(0).rand(1, 3, 16, 16), jnp.float32)
    params = m_ref.init(jax.random.key(0), ids, imgs, method=Parti.init_all)

    # eval (deterministic=True) ignores the knob entirely
    l_ref = m_ref.apply(params, ids, imgs)
    l_eval = m_drop.apply(params, ids, imgs)
    np.testing.assert_allclose(float(l_eval), float(l_ref), rtol=1e-6)

    # training mode with keep-prob 0 = null context -> different loss
    l_drop = m_drop.apply(params, ids, imgs, deterministic=False,
                          rngs={"dropout": jax.random.key(1)})
    assert abs(float(l_drop) - float(l_ref)) > 1e-6
