import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from attention_models_tpu.parallel import (
    DEFAULT_PARAM_RULES,
    batch_sharding,
    create_mesh,
    param_shardings,
    shard_pytree,
)


def test_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh = create_mesh(model=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


def test_param_rules_assign_tp_specs():
    mesh = create_mesh(data=4, model=2)
    params = {
        "encoder": {
            "layers_0": {
                "self_attn": {
                    "wq": {"kernel": jnp.zeros((512, 512))},
                    "wo": {"kernel": jnp.zeros((512, 512))},
                },
                "ff": {
                    "ff_in": {"kernel": jnp.zeros((512, 1364 * 2))},
                    "norm": {"gamma": jnp.zeros((512,))},
                },
            }
        }
    }
    sh = param_shardings(params, mesh)
    sa = sh["encoder"]["layers_0"]["self_attn"]
    assert sa["wq"]["kernel"].spec == P(None, "model")
    assert sa["wo"]["kernel"].spec == P("model", None)
    ff = sh["encoder"]["layers_0"]["ff"]
    assert ff["ff_in"]["kernel"].spec == P(None, "model")
    assert ff["norm"]["gamma"].spec == P()


def test_indivisible_falls_back_to_replicated():
    mesh = create_mesh(data=4, model=2)
    params = {"wq": {"kernel": jnp.zeros((512, 511))}}  # 511 % 2 != 0
    sh = param_shardings(params, mesh)
    assert sh["wq"]["kernel"].spec == P()


def test_sharded_matmul_runs_on_mesh():
    mesh = create_mesh(data=4, model=2)
    params = {"wq": {"kernel": np.random.RandomState(0).randn(64, 128).astype(np.float32)}}
    sh = param_shardings(params, mesh)
    params = shard_pytree(params, sh)
    x = np.random.RandomState(1).randn(8, 16, 64).astype(np.float32)
    x = jax.device_put(x, batch_sharding(mesh, ndim=3))

    @jax.jit
    def f(p, x):
        return jnp.einsum("btd,dh->bth", x, p["wq"]["kernel"])

    y = f(params, x)
    expected = np.einsum("btd,dh->bth", x, params["wq"]["kernel"])
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5, atol=1e-5)


def test_runtime_init_before_backend_touch():
    """Regression: runtime_init() must not initialize the XLA backend before
    calling jax.distributed.initialize() — the old guard evaluated
    jax.process_count(), which does, so every multi-host launch (the ONLY
    case the branch runs) died with "must be called before any JAX calls".
    A 1-process coordinator exercises the same code path."""
    import subprocess
    import sys

    code = """
import jax
jax.config.update("jax_platforms", "cpu")
from attention_models_tpu.parallel import runtime_init
runtime_init()  # must come before any backend init and must not raise
assert jax.process_count() == 1
print("runtime_init OK", len(jax.devices()))
"""
    env = dict(
        os.environ,
        JAX_COORDINATOR_ADDRESS="localhost:58517",
        JAX_NUM_PROCESSES="1",
        JAX_PROCESS_ID="0",
        JAX_PLATFORMS="cpu",
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=240, env=env,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "runtime_init OK" in r.stdout


class _SliceProxy:
    """CPU device masquerading as a device on a multi-slice pod: delegates
    everything to the wrapped device but reports a fake ``slice_index`` —
    exactly the attribute mesh_utils granulates hybrid meshes by."""

    def __init__(self, device, slice_index):
        object.__setattr__(self, "_device", device)
        object.__setattr__(self, "slice_index", slice_index)

    def __getattr__(self, name):
        return getattr(object.__getattribute__(self, "_device"), name)

    def __repr__(self):
        d = object.__getattribute__(self, "_device")
        return f"SliceProxy({d!r}, slice={self.slice_index})"


def test_multislice_hybrid_mesh_keeps_model_axis_on_ici():
    """On a DCN-connected multi-slice pod, create_mesh must (a) not crash
    (jax.make_mesh refuses multi-slice topologies) and (b) lay out the mesh
    so only the data axis crosses slices: every (stage, seq, model) fiber —
    here the model axis — stays inside one slice, keeping TP collectives on
    ICI. Simulated with 2 fake slices x 4 CPU devices."""
    from attention_models_tpu.parallel.mesh import hybrid_mesh_devices

    real = jax.devices()[:8]
    proxies = [_SliceProxy(d, slice_index=i // 4) for i, d in enumerate(real)]

    arr = hybrid_mesh_devices(
        [("data", 4), ("model", 2)], proxies, n_slices=2
    )
    assert arr.shape == (4, 2)
    # model fibers never cross a slice boundary
    for row in arr:
        assert len({d.slice_index for d in row}) == 1
    # the data axis spans both slices, DCN-major
    assert [arr[i, 0].slice_index for i in range(4)] == [0, 0, 1, 1]

    # the create_mesh wrapper takes the hybrid path on proxy devices
    mesh = create_mesh(data=4, model=2, devices=proxies)
    assert mesh.shape == {"data": 4, "model": 2}

    # the same layout built on the real devices executes a sharded sum
    unwrap = np.vectorize(
        lambda p: object.__getattribute__(p, "_device"), otypes=[object]
    )
    real_mesh = jax.sharding.Mesh(unwrap(arr), ("data", "model"))
    x = jax.device_put(
        np.arange(32, dtype=np.float32).reshape(8, 4),
        jax.sharding.NamedSharding(real_mesh, P("data", "model")),
    )
    assert float(jnp.sum(x)) == float(np.arange(32).sum())


def test_multislice_indivisible_data_raises():
    import pytest

    real = jax.devices()[:8]
    proxies = [_SliceProxy(d, slice_index=i // 4) for i, d in enumerate(real)]
    # dp=1, tp=8 would force the model axis across both slices -> must
    # refuse (TP all-gathers belong on ICI), not silently span DCN
    with pytest.raises(ValueError, match="DCN"):
        create_mesh(data=1, model=8, devices=proxies)
