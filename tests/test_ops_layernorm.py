"""Fused Pallas LayerNorm vs torch F.layer_norm and the jnp reference,
including gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from attention_models_tpu.ops.layernorm import fused_layernorm, layernorm


def test_fused_ln_matches_torch_interpret():
    from jax.experimental.pallas import tpu as pltpu

    rs = np.random.RandomState(0)
    x = rs.randn(16, 128).astype(np.float32)
    gamma = rs.randn(128).astype(np.float32)
    beta = rs.randn(128).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = fused_layernorm(jnp.array(x), jnp.array(gamma), jnp.array(beta),
                              interpret=True)
    ref = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (128,), torch.from_numpy(gamma),
        torch.from_numpy(beta),
    ).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-5)


def test_fused_ln_gamma_only_interpret():
    rs = np.random.RandomState(1)
    x = rs.randn(8, 256).astype(np.float32)
    gamma = rs.randn(256).astype(np.float32)
    got = fused_layernorm(jnp.array(x), jnp.array(gamma), None,
                          interpret=True)
    ref = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (256,), torch.from_numpy(gamma),
        torch.zeros(256),
    ).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-5)


def test_layernorm_gradients_match_reference():
    rs = np.random.RandomState(2)
    x = jnp.array(rs.randn(8, 128).astype(np.float32))
    gamma = jnp.array(rs.randn(128).astype(np.float32))
    beta = jnp.array(rs.randn(128).astype(np.float32))

    def loss_fused(x, g, b):
        return jnp.sum(layernorm(x, g, b, interpret=True) ** 2)

    def loss_ref(x, g, b):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, -1, keepdims=True)
        var = jnp.var(xf, -1, keepdims=True)
        return jnp.sum(((xf - mean) / jnp.sqrt(var + 1e-5) * g + b) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, gamma, beta)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, gamma, beta)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_layernorm_fallback_odd_shapes():
    # d=192 not lane-aligned: must take the jnp path and still be correct
    rs = np.random.RandomState(3)
    x = rs.randn(4, 10, 192).astype(np.float32)
    gamma = np.ones(192, np.float32)
    beta = np.zeros(192, np.float32)
    got = layernorm(jnp.array(x), jnp.array(gamma), jnp.array(beta))
    ref = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (192,)).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5, rtol=1e-5)
