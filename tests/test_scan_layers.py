"""nn.scan-stacked transformer layers: output parity with the loop form
(when loop params are restacked into the scanned layout) and TP sharding of
the stacked weights. Compile-time motivation: one traced layer instead of
`depth` copies (ROADMAP #8)."""

import jax
import jax.numpy as jnp
import numpy as np

from attention_models_tpu.models.transformer import Decoder, Encoder
import pytest


def _stack_loop_params(loop_params, depth, key="layers"):
    """layers_0..layers_{n-1} subtrees -> one subtree of stacked leaves."""
    subs = [loop_params[f"layers_{i}"] for i in range(depth)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *subs)
    rest = {k: v for k, v in loop_params.items()
            if not k.startswith("layers_")}
    return {**rest, key: stacked}


def test_scanned_decoder_matches_loop():
    depth, dim = 3, 32
    loop = Decoder(dim, n_heads=2, d_head=16, depth=depth, scan=False)
    scan = Decoder(dim, n_heads=2, d_head=16, depth=depth, scan=True)
    x = jnp.array(np.random.RandomState(0).randn(2, 10, dim), jnp.float32)
    ctx = jnp.array(np.random.RandomState(1).randn(2, 7, dim), jnp.float32)

    lp = loop.init(jax.random.key(0), x, ctx)["params"]
    sp = {"params": _stack_loop_params(lp, depth)}
    out_loop = loop.apply({"params": lp}, x, ctx, causal=True)
    out_scan = scan.apply(sp, x, ctx, causal=True)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop),
                               rtol=2e-5, atol=2e-5)


def test_scanned_encoder_matches_loop():
    depth, dim = 4, 32
    loop = Encoder(dim, n_heads=2, d_head=16, depth=depth, scan=False)
    scan = Encoder(dim, n_heads=2, d_head=16, depth=depth, scan=True)
    x = jnp.array(np.random.RandomState(2).randn(2, 10, dim), jnp.float32)

    lp = loop.init(jax.random.key(0), x)["params"]
    sp = {"params": _stack_loop_params(lp, depth)}
    np.testing.assert_allclose(
        np.asarray(scan.apply(sp, x)),
        np.asarray(loop.apply({"params": lp}, x)),
        rtol=2e-5, atol=2e-5,
    )


def test_scanned_params_shard_over_model_axis():
    """Stacked (depth, d_in, d_out) kernels must keep their TP split on the
    matmul dims with the depth axis unsharded (right-aligned specs)."""
    from jax.sharding import PartitionSpec as P

    from attention_models_tpu.parallel import create_mesh, param_shardings

    mesh = create_mesh(data=4, model=2)
    scan = Decoder(32, n_heads=2, d_head=16, depth=3, scan=True)
    x = jnp.zeros((2, 10, 32))
    ctx = jnp.zeros((2, 7, 32))
    params = scan.init(jax.random.key(0), x, ctx)["params"]
    sh = param_shardings(params, mesh)
    wq = sh["layers"]["self_attn"]["wq"]["kernel"]
    assert wq.spec == P(None, None, "model"), wq.spec
    wo = sh["layers"]["self_attn"]["wo"]["kernel"]
    assert wo.spec == P(None, "model", None), wo.spec


def test_scanned_decoder_gradients_flow():
    scan = Decoder(32, n_heads=2, d_head=16, depth=3, scan=True)
    x = jnp.array(np.random.RandomState(3).randn(2, 10, 32), jnp.float32)
    ctx = jnp.array(np.random.RandomState(4).randn(2, 7, 32), jnp.float32)
    params = scan.init(jax.random.key(0), x, ctx)["params"]

    def loss(p):
        return jnp.sum(scan.apply({"params": p}, x, ctx) ** 2)

    grads = jax.grad(loss)(params)
    norms = [float(jnp.linalg.norm(g)) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(norms)) and max(norms) > 0


@pytest.mark.slow
def test_remat_matches_plain_all_forms():
    """training.remat must be a pure memory knob: the nn.remat-wrapped
    layers (static bool args pinned via static_argnums — tracing them is a
    TracerBoolConversionError) produce identical outputs and finite grads
    in both the loop and nn.scan forms. Regression: remat was broken at
    trace time for every Decoder call until round 2."""
    x = jnp.array(np.random.RandomState(0).randn(2, 6, 32), jnp.float32)
    ctx = jnp.array(np.random.RandomState(1).randn(2, 5, 32), jnp.float32)
    for scan_flag in (False, True):
        dec = Decoder(32, n_heads=2, d_head=16, depth=2, scan=scan_flag,
                      remat=True)
        params = dec.init(jax.random.key(0), x, ctx)
        plain = Decoder(32, n_heads=2, d_head=16, depth=2, scan=scan_flag)
        out_r = dec.apply(params, x, ctx, causal=True)
        out_p = plain.apply(params, x, ctx, causal=True)
        np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_p),
                                   atol=1e-6, rtol=1e-6)
        g = jax.grad(
            lambda xx: jnp.sum(dec.apply(params, xx, ctx, causal=True) ** 2)
        )(x)
        assert np.isfinite(np.asarray(g)).all()
