"""Pipeline parallelism (GPipe over the ``stage`` mesh axis) must compute
exactly what the sequential layer scan computes — forward and gradients —
with layers sharded into contiguous stages and microbatches streaming
through the ppermute ring. Model-level: a scan-stacked Decoder routed
through the pipeline (ambient mesh with a sharded stage axis) must match
its own sequential-scan output, so ``training.pipeline_parallel`` is a
pure placement knob."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attention_models_tpu.parallel.mesh import create_mesh
from attention_models_tpu.parallel.pipeline import pipeline_apply
from attention_models_tpu.parallel.sharding import param_shardings


def _setup(L=8, d=16, b=8, seed=0):
    rs = np.random.RandomState(seed)
    params = {
        "w": jnp.array(rs.randn(L, d, d) * (1.0 / np.sqrt(d)), jnp.float32),
        "b": jnp.array(rs.randn(L, d) * 0.1, jnp.float32),
    }
    x = jnp.array(rs.randn(b, d), jnp.float32)
    return params, x


def _layer(p, h, per=(), bc=(), mb_idx=0):
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


@pytest.mark.slow
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


def test_pipeline_per_mb_broadcast_and_data_axis():
    """The generalized schedule: hidden streamed through the ring, context
    and a bool mask as stage-local per-microbatch constants, an unbatched
    broadcast constant, and the batch sharded over a ``data`` axis
    alongside ``stage``."""
    mesh = create_mesh(data=2, stage=2, devices=jax.devices()[:4])
    rs = np.random.RandomState(3)
    L, d, b, tc = 4, 8, 8, 5
    params = {
        "w": jnp.array(rs.randn(L, d, d) / np.sqrt(d), jnp.float32),
        "u": jnp.array(rs.randn(L, d, d) / np.sqrt(d), jnp.float32),
    }
    x = jnp.array(rs.randn(b, d), jnp.float32)
    ctx = jnp.array(rs.randn(b, tc, d), jnp.float32)
    keep = jnp.array(rs.rand(b, tc) > 0.3)  # bool leaf streams too
    shift = jnp.array(rs.randn(d) * 0.1, jnp.float32)  # broadcast constant

    def layer(p, h, per, bc, mb_idx=0):
        ctx, keep = per
        pooled = jnp.sum(
            jnp.where(keep[..., None], ctx, 0.0), axis=1
        ) / jnp.maximum(jnp.sum(keep, axis=1, keepdims=True), 1)
        return jnp.tanh(h @ p["w"] + pooled @ p["u"] + bc[0])

    def seq(params, x):
        def body(carry, p_i):
            return layer(p_i, carry, (ctx, keep), (shift,)), None

        out, _ = jax.lax.scan(body, x, params)
        return out

    ref = seq(params, x)
    got = pipeline_apply(
        params, x, layer, mesh,
        batch_axis="data", per_mb=(ctx, keep), broadcast=(shift,),
        n_microbatches=2,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

    # gradients flow into per-microbatch constants too (psum transpose)
    gp = jax.grad(lambda c: jnp.sum(pipeline_apply(
        params, x, layer, mesh, batch_axis="data", per_mb=(c, keep),
        broadcast=(shift,), n_microbatches=2)))(ctx)
    gs = jax.grad(lambda c: jnp.sum(jax.lax.scan(
        lambda carry, p_i: (layer(p_i, carry, (c, keep), (shift,)), None),
        x, params)[0]))(ctx)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gs),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("remat", [False, True])
@pytest.mark.slow
def test_decoder_pipeline_matches_sequential_scan(remat):
    """End-to-end model routing: the same scan-created params produce the
    same output (and input-gradients) whether the stacked layers run as a
    sequential nn.scan (no ambient stage axis) or as a GPipe ring (ambient
    mesh with stage=2, the trainer's `training.pipeline_parallel` path).
    remat=True covers training.remat composed with pp (the pipeline applies
    the nn.remat-wrapped layer)."""
    from attention_models_tpu.models.transformer import Decoder

    b, t, tc, d = 4, 6, 5, 32
    # pp_microbatches exercises the model-level knob (training.
    # pipeline_microbatches); per-shard batch is 4/2=2, so m=2 is valid
    model = Decoder(dim=d, n_heads=2, d_head=16, depth=4, scan=True,
                    pp_microbatches=2, remat=remat)
    rs = np.random.RandomState(0)
    x = jnp.array(rs.randn(b, t, d) * 0.1, jnp.float32)
    ctx = jnp.array(rs.randn(b, tc, d) * 0.1, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, ctx)

    ref = model.apply(params, x, ctx, causal=True)
    gref = jax.grad(
        lambda x: jnp.sum(model.apply(params, x, ctx, causal=True) ** 2)
    )(x)

    mesh = create_mesh(data=2, stage=2, devices=jax.devices()[:4])
    with jax.sharding.set_mesh(mesh):
        got = model.apply(params, x, ctx, causal=True)
        ggot = jax.grad(
            lambda x: jnp.sum(model.apply(params, x, ctx, causal=True) ** 2)
        )(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # gradient of a squared-sum loss: reduction-order noise scales with the
    # cotangent magnitude, so compare at 1e-3 relative
    np.testing.assert_allclose(np.asarray(ggot), np.asarray(gref),
                               atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_pipeline_dropout_masks_differ_across_microbatches():
    """Stochastic training under pp: identical examples placed in DIFFERENT
    microbatches must draw different dropout masks (the per-layer key is
    folded with the microbatch index — one key per layer would repeat the
    same mask every tick)."""
    from attention_models_tpu.models.transformer import Encoder

    d = 32
    model = Encoder(dim=d, n_heads=2, d_head=16, depth=2, scan=True,
                    dropout=0.5, pp_microbatches=2)
    rs = np.random.RandomState(0)
    row = rs.randn(1, 6, d).astype(np.float32) * 0.1
    x = jnp.asarray(np.tile(row, (4, 1, 1)))  # 4 identical examples
    params = model.init(jax.random.PRNGKey(0), x)

    mesh = create_mesh(data=1, stage=2, devices=jax.devices()[:2])
    with jax.sharding.set_mesh(mesh):
        # control: no dropout -> identical rows regardless of microbatch
        det = model.apply(params, x)
        np.testing.assert_allclose(np.asarray(det[0]), np.asarray(det[2]),
                                   atol=1e-6, rtol=1e-6)
        out = model.apply(params, x, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(1)})
    # rows 0 and 2 sit in microbatch 0 and 1 respectively (m=2, size 2)
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[2]),
                           atol=1e-4), "microbatches shared a dropout mask"


def test_stage_sharding_rules_split_stacked_layers():
    """param_shardings on a stage-sharded mesh places scan-stacked layer
    params (leading depth axis) P('stage', ...) so each device holds only
    its own stage's weights; non-stacked params stay replicated."""
    from attention_models_tpu.models.transformer import Encoder

    mesh = create_mesh(data=2, stage=2, devices=jax.devices()[:4])
    model = Encoder(dim=32, n_heads=2, d_head=16, depth=4, scan=True)
    x = jnp.zeros((2, 6, 32), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    sh = param_shardings(params, mesh)
    specs = {}
    jax.tree_util.tree_map_with_path(
        lambda p, s: specs.update({"/".join(str(k.key) for k in p): s.spec}),
        sh,
    )
    wq = next(v for k, v in specs.items() if k.endswith("wq/kernel"))
    assert wq[0] == "stage", specs
    gamma = next(v for k, v in specs.items() if "norm1/gamma" in k)
    assert gamma[0] == "stage", specs


def test_default_microbatch_heuristic():
    """Default m = smallest divisor of the per-shard batch >= min(batch,
    4*stages): ~20% GPipe bubble while microbatches stay MXU-sized."""
    from attention_models_tpu.parallel.pipeline import _default_microbatches

    assert _default_microbatches(256, 4) == 16
    assert _default_microbatches(64, 2) == 8
    assert _default_microbatches(6, 2) == 6   # smallest divisor >= 6 is 6
    assert _default_microbatches(8, 2) == 8
    assert _default_microbatches(1, 4) == 1
    assert _default_microbatches(96, 4) == 16  # 16 divides 96


def test_pipeline_validations():
    mesh = jax.make_mesh((4,), ("stage",), axis_types=(jax.sharding.AxisType.Auto,))
    params, x = _setup(L=6)  # 6 layers not divisible by 4 stages
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(params, x, _layer, mesh)
    params, x = _setup(L=8, b=6)
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_apply(params, x, _layer, mesh, n_microbatches=4)
