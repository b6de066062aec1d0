"""Pipeline parallelism (GPipe over the ``stage`` mesh axis) must compute
exactly what the sequential layer scan computes — forward and gradients —
with layers sharded into contiguous stages and microbatches streaming
through the ppermute ring."""

import jax
import jax.numpy as jnp
import numpy as np

from attention_models_tpu.parallel.pipeline import pipeline_apply


def _setup(L=8, d=16, b=8, seed=0):
    rs = np.random.RandomState(seed)
    params = {
        "w": jnp.array(rs.randn(L, d, d) * (1.0 / np.sqrt(d)), jnp.float32),
        "b": jnp.array(rs.randn(L, d) * 0.1, jnp.float32),
    }
    x = jnp.array(rs.randn(b, d), jnp.float32)
    return params, x


def _layer(p, h):
    return jnp.tanh(h @ p["w"] + p["b"])


def _sequential(params, x):
    def body(h, p_i):
        return _layer(p_i, h), None

    out, _ = jax.lax.scan(body, x, params)
    return out


def test_pipeline_forward_matches_sequential():
    mesh = jax.make_mesh((4,), ("stage",), axis_types=(jax.sharding.AxisType.Auto,))
    params, x = _setup()
    ref = _sequential(params, x)
    for m in (8, 4, 2):
        got = pipeline_apply(params, x, _layer, mesh, n_microbatches=m)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5, err_msg=f"m={m}")


def test_pipeline_gradients_match_sequential():
    mesh = jax.make_mesh((2,), ("stage",), devices=jax.devices()[:2],
                         axis_types=(jax.sharding.AxisType.Auto,))
    params, x = _setup(L=4, d=8, b=4, seed=1)
    cot = jnp.array(np.random.RandomState(2).randn(4, 8), jnp.float32)

    def loss_pipe(params, x):
        return jnp.sum(pipeline_apply(params, x, _layer, mesh,
                                      n_microbatches=2) * cot)

    def loss_seq(params, x):
        return jnp.sum(_sequential(params, x) * cot)

    gp = jax.grad(loss_pipe, argnums=(0, 1))(params, x)
    gs = jax.grad(loss_seq, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_pipeline_validations():
    import pytest

    mesh = jax.make_mesh((4,), ("stage",), axis_types=(jax.sharding.AxisType.Auto,))
    params, x = _setup(L=6)  # 6 layers not divisible by 4 stages
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(params, x, _layer, mesh)
    params, x = _setup(L=8, b=6)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_apply(params, x, _layer, mesh, n_microbatches=4)
