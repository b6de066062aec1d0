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
