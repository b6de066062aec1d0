"""Ring (context-parallel) flash attention vs the unsharded XLA reference.

Sequence sharded over a mesh axis; k/v shards stream around the ring via
ppermute. Forward, causal forward, and the exact ring backward must all match
full attention on the virtual 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from attention_models_tpu.ops.attention import (
    make_causal_mask,
    multihead_attention,
)
from attention_models_tpu.ops.ring_attention import ring_flash_attention
from attention_models_tpu.parallel import create_mesh


def _rand(*shape, seed=0):
    return jnp.array(np.random.RandomState(seed).randn(*shape), jnp.float32)


def test_ring_forward_matches_xla():
    mesh = create_mesh(data=2, model=4)
    q, k, v = (_rand(2, 4, 256, 32, seed=s) for s in (0, 1, 2))
    scale = 32 ** -0.5
    ref = multihead_attention(q, k, v, scale=scale)
    got = ring_flash_attention(
        q, k, v, mesh, seq_axis="model", batch_axis="data",
        scale=scale, block_q=64, block_k=64, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_ring_causal_matches_xla():
    mesh = create_mesh(data=1, model=8)
    q, k, v = (_rand(2, 2, 256, 32, seed=s) for s in (3, 4, 5))
    scale = 32 ** -0.5
    cm = make_causal_mask(256, 256)
    ref = multihead_attention(q, k, v, scale=scale, causal_mask=cm)
    got = ring_flash_attention(
        q, k, v, mesh, seq_axis="model",
        scale=scale, causal=True, block_q=32, block_k=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_ring_gradients_match_xla():
    mesh = create_mesh(data=2, model=4)
    q, k, v = (_rand(2, 2, 128, 32, seed=s) for s in (6, 7, 8))
    scale = 32 ** -0.5
    w = _rand(2, 2, 128, 32, seed=9)  # non-uniform cotangent

    def loss_ring(q, k, v):
        o = ring_flash_attention(
            q, k, v, mesh, seq_axis="model", batch_axis="data",
            scale=scale, block_q=32, block_k=32, interpret=True,
        )
        return jnp.sum(o * w)

    def loss_ref(q, k, v):
        return jnp.sum(multihead_attention(q, k, v, scale=scale) * w)

    gs = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_ring_causal_gradients_match_xla():
    mesh = create_mesh(data=1, model=8)
    q, k, v = (_rand(1, 2, 128, 32, seed=s) for s in (10, 11, 12))
    scale = 32 ** -0.5
    cm = make_causal_mask(128, 128)
    w = _rand(1, 2, 128, 32, seed=13)

    def loss_ring(q, k, v):
        o = ring_flash_attention(
            q, k, v, mesh, seq_axis="model",
            scale=scale, causal=True, block_q=16, block_k=16, interpret=True,
        )
        return jnp.sum(o * w)

    def loss_ref(q, k, v):
        o = multihead_attention(q, k, v, scale=scale, causal_mask=cm)
        return jnp.sum(o * w)

    gs = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)
