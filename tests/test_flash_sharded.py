"""Tensor-parallel flash attention: the shard_map-wrapped Pallas kernel with
heads sharded over the model axis must equal the unsharded XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np

from attention_models_tpu.ops.attention import make_causal_mask, multihead_attention
from attention_models_tpu.ops.flash_attention import flash_attention_sharded
from attention_models_tpu.parallel import batch_sharding, create_mesh


def _rand(*shape, seed=0):
    return jnp.array(np.random.RandomState(seed).randn(*shape), jnp.float32)


def test_sharded_flash_matches_xla():
    mesh = create_mesh(data=2, model=4)
    q, k, v = (_rand(4, 8, 256, 32, seed=s) for s in (0, 1, 2))
    scale = 32 ** -0.5
    ref = multihead_attention(q, k, v, scale=scale)

    @jax.jit
    def f(q, k, v):
        return flash_attention_sharded(q, k, v, mesh, scale=scale,
                                       interpret=True)

    got = f(jax.device_put(q, batch_sharding(mesh)), k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_sharded_flash_causal():
    mesh = create_mesh(data=2, model=4)
    q, k, v = (_rand(2, 4, 128, 32, seed=s) for s in (3, 4, 5))
    scale = 32 ** -0.5
    cm = make_causal_mask(128, 128)
    ref = multihead_attention(q, k, v, scale=scale, causal_mask=cm)
    got = flash_attention_sharded(q, k, v, mesh, scale=scale, causal=True,
                                  block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_sharded_flash_gradients():
    mesh = create_mesh(data=2, model=4)
    q, k, v = (_rand(2, 4, 128, 32, seed=s) for s in (6, 7, 8))
    scale = 32 ** -0.5

    def loss_sharded(q, k, v):
        return jnp.sum(
            flash_attention_sharded(q, k, v, mesh, scale=scale,
                                    interpret=True) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(multihead_attention(q, k, v, scale=scale) ** 2)

    gs = jax.grad(loss_sharded, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)
