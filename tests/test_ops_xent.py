"""Fused head+cross-entropy kernel vs the unfused formulation (values +
gradients), including ignore_index masking semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from attention_models_tpu.ops.sampling import cross_entropy_ignore_index
from attention_models_tpu.ops.xent import fused_head_xent


def _setup(n=64, d=128, v=256, seed=0):
    rs = np.random.RandomState(seed)
    h = jnp.array(rs.randn(2, n // 2, d), jnp.float32)
    w = jnp.array(rs.randn(d, v) / np.sqrt(d), jnp.float32)
    targets = rs.randint(0, v, size=(2, n // 2))
    targets[0, :5] = -1  # ignored positions
    return h, w, jnp.array(targets, jnp.int32)


def _reference(h, w, targets):
    logits = jnp.dot(h, w.astype(h.dtype))
    return cross_entropy_ignore_index(logits, targets)


def test_fused_head_xent_matches_reference():
    h, w, targets = _setup()
    ref = _reference(h, w, targets)
    got = fused_head_xent(h, w, targets, block_rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)


def test_fused_head_xent_gradients_match_reference():
    h, w, targets = _setup(seed=1)

    def loss_fused(h, w):
        return fused_head_xent(h, w, targets, block_rows=16, interpret=True)

    def loss_ref(h, w):
        return _reference(h, w, targets)

    gf = jax.grad(loss_fused, argnums=(0, 1))(h, w)
    gr = jax.grad(loss_ref, argnums=(0, 1))(h, w)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-6, rtol=2e-5)


def test_fused_head_xent_bias_matches_reference():
    """Parti's biased to_logits head: values + gradients incl. dbias."""
    h, w, _ = _setup(seed=3)
    rs = np.random.RandomState(4)
    b = jnp.array(rs.randn(w.shape[-1]) * 0.1, jnp.float32)
    targets = jnp.array(rs.randint(0, w.shape[-1], size=(2, 32)), jnp.int32)

    def loss_fused(h, w, b):
        return fused_head_xent(h, w, targets, bias=b, block_rows=16,
                               interpret=True)

    def loss_ref(h, w, b):
        logits = jnp.dot(h, w.astype(h.dtype)) + b.astype(h.dtype)
        return cross_entropy_ignore_index(logits, targets)

    np.testing.assert_allclose(
        np.asarray(loss_fused(h, w, b)), np.asarray(loss_ref(h, w, b)),
        atol=2e-6, rtol=2e-6)
    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(h, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(h, w, b)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-6, rtol=2e-5)


def test_fused_head_xent_all_ignored_is_finite():
    h, w, _ = _setup(seed=2)
    targets = jnp.full((2, 32), -1, jnp.int32)
    got = fused_head_xent(h, w, targets, block_rows=16, interpret=True)
    assert np.isfinite(np.asarray(got))
    g = jax.grad(
        lambda h: fused_head_xent(h, w, targets, block_rows=16,
                                  interpret=True)
    )(h)
    assert np.all(np.asarray(g) == 0.0)


def test_fused_head_xent_broadcasts_targets_over_batch():
    """targets (1, t) against h (B, t, d) must broadcast over the batch like
    the unfused CE's numpy broadcasting does — hit by MUSE.init_all, which
    inits with text batch > image batch."""
    h, w, _ = _setup()
    rs = np.random.RandomState(3)
    targets = jnp.array(rs.randint(0, w.shape[1], size=(1, h.shape[1])),
                        jnp.int32)
    ref = _reference(h, w, targets)  # jnp CE broadcasts (1,t) over (B,t,V)
    got = fused_head_xent(h, w, targets, block_rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
