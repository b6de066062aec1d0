"""Fused GEGLU-FFN kernel vs the unfused formulation (values + gradients),
and the FeedForward module's param-path compatibility after the refactor."""

import jax
import jax.numpy as jnp
import numpy as np

from attention_models_tpu.ops.ffn import _ffn_reference, fused_ffn


def _setup(n=64, d=128, inner=256, seed=0, dtype=jnp.float32):
    rs = np.random.RandomState(seed)
    x = jnp.array(rs.randn(2, n // 2, d), dtype)
    w1 = jnp.array(rs.randn(d, 2 * inner) / np.sqrt(d), jnp.float32)
    gamma = jnp.array(1.0 + 0.1 * rs.randn(inner), jnp.float32)
    w2 = jnp.array(rs.randn(inner, d) / np.sqrt(inner), jnp.float32)
    return x, w1, gamma, w2


def test_fused_ffn_matches_reference():
    x, w1, gamma, w2 = _setup()
    ref = _ffn_reference(x, w1, gamma, w2, 1e-5)
    got = fused_ffn(x, w1, gamma, w2, block_rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_ffn_gradients_match_reference():
    x, w1, gamma, w2 = _setup(seed=1)
    cot = jnp.array(np.random.RandomState(2).randn(*x.shape), jnp.float32)

    def loss_fused(x, w1, gamma, w2):
        return jnp.sum(
            fused_ffn(x, w1, gamma, w2, block_rows=16, interpret=True) * cot
        )

    def loss_ref(x, w1, gamma, w2):
        return jnp.sum(_ffn_reference(x, w1, gamma, w2, 1e-5) * cot)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w1, gamma, w2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w1, gamma, w2)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_feedforward_param_paths_unchanged():
    """The _DenseKernel/_GammaParam refactor must keep the exact pytree
    paths nn.Dense/GammaLayerNorm produced (checkpoints, TP rules and torch
    converters key on them) and the same output."""
    from attention_models_tpu.models.layers import FeedForward

    ff = FeedForward(dim=64, mult=4)
    x = jnp.array(np.random.RandomState(3).randn(2, 8, 64), jnp.float32)
    params = ff.init(jax.random.key(0), x)["params"]
    assert set(params.keys()) == {"ff_in", "norm", "ff_out"}
    inner = int(64 * 4 * 2 / 3)
    assert params["ff_in"]["kernel"].shape == (64, 2 * inner)
    assert params["norm"]["gamma"].shape == (inner,)
    assert params["ff_out"]["kernel"].shape == (inner, 64)
    out = ff.apply({"params": params}, x)
    # unfused path == manual reference formulation with the same params
    ref = _ffn_reference(x, params["ff_in"]["kernel"],
                         params["norm"]["gamma"],
                         params["ff_out"]["kernel"], 1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_fused_mlp_matches_reference():
    from attention_models_tpu.ops.ffn import _mlp_reference, fused_mlp

    rs = np.random.RandomState(5)
    x = jnp.array(rs.randn(2, 16, 128), jnp.float32)
    w1 = jnp.array(rs.randn(128, 344) / np.sqrt(128), jnp.float32)
    b1 = jnp.array(rs.randn(344) * 0.1, jnp.float32)
    w2 = jnp.array(rs.randn(344, 128) / np.sqrt(344), jnp.float32)
    b2 = jnp.array(rs.randn(128) * 0.1, jnp.float32)
    ref = _mlp_reference(x, w1, b1, w2, b2)
    got = fused_mlp(x, w1, b1, w2, b2, block_rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    cot = jnp.array(rs.randn(*x.shape), jnp.float32)

    def loss(x, w1, b1, w2, b2):
        return jnp.sum(
            fused_mlp(x, w1, b1, w2, b2, block_rows=16, interpret=True) * cot
        )

    def loss_ref(x, w1, b1, w2, b2):
        return jnp.sum(_mlp_reference(x, w1, b1, w2, b2) * cot)

    gf = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_mlp_param_paths_unchanged():
    from attention_models_tpu.models.layers import Mlp

    mlp = Mlp(dim=64, hidden_dim=172)
    x = jnp.array(np.random.RandomState(6).randn(2, 8, 64), jnp.float32)
    params = mlp.init(jax.random.key(0), x)["params"]
    assert set(params.keys()) == {"mlp_in", "mlp_out"}
    assert set(params["mlp_in"].keys()) == {"kernel", "bias"}
    assert params["mlp_in"]["kernel"].shape == (64, 172)
    assert params["mlp_out"]["kernel"].shape == (172, 64)


def test_fused_ln_mlp_matches_reference():
    from attention_models_tpu.ops.ffn import _ln_mlp_reference, fused_ln_mlp

    rs = np.random.RandomState(8)
    x = jnp.array(rs.randn(2, 16, 128), jnp.float32)
    lng = jnp.array(1.0 + 0.1 * rs.randn(128), jnp.float32)
    lnb = jnp.array(0.1 * rs.randn(128), jnp.float32)
    w1 = jnp.array(rs.randn(128, 344) / np.sqrt(128), jnp.float32)
    b1 = jnp.array(rs.randn(344) * 0.1, jnp.float32)
    w2 = jnp.array(rs.randn(344, 128) / np.sqrt(344), jnp.float32)
    b2 = jnp.array(rs.randn(128) * 0.1, jnp.float32)
    ref = _ln_mlp_reference(x, lng, lnb, w1, b1, w2, b2, 1e-5)
    got = fused_ln_mlp(x, lng, lnb, w1, b1, w2, b2, block_rows=16,
                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    cot = jnp.array(rs.randn(*x.shape), jnp.float32)
    args = (x, lng, lnb, w1, b1, w2, b2)

    def loss(*a):
        return jnp.sum(fused_ln_mlp(*a, block_rows=16, interpret=True) * cot)

    def loss_ref(*a):
        return jnp.sum(_ln_mlp_reference(*a, 1e-5) * cot)

    gf = jax.grad(loss, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=2e-5)


def test_vitvqgan_block_param_paths_stable():
    """ln_mlp_block keeps the ViTVQGANBlock pytree identical to the
    LayerNorm+Mlp composition (norm2/{gamma,beta}, mlp/mlp_in, mlp/mlp_out)."""
    from attention_models_tpu.models.vitvqgan import ViTVQGANBlock

    blk = ViTVQGANBlock(dim=64, n_heads=2, d_head=32, mlp_dim=128)
    x = jnp.array(np.random.RandomState(9).randn(2, 16, 64), jnp.float32)
    params = blk.init(jax.random.key(0), x)["params"]
    assert set(params.keys()) == {"norm1", "norm2", "self_attn", "mlp"}
    assert set(params["norm2"].keys()) == {"gamma", "beta"}
    assert set(params["mlp"].keys()) == {"mlp_in", "mlp_out"}
    assert set(params["mlp"]["mlp_in"].keys()) == {"kernel", "bias"}
