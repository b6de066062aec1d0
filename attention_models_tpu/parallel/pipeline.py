"""Pipeline parallelism (GPipe schedule) over a ``stage`` mesh axis.

Completes the parallelism portfolio (dp / tp / sp / ep / **pp**): a deep
stack of identical layers — exactly the nn.scan-stacked form the Encoder /
Decoder use for compile-time (`training.scan_layers`) — is split into
contiguous stages, one stage per device along the ``stage`` axis. Micro-
batches stream through the ring: each tick every device applies its local
layers to its current microbatch and ppermutes the activation to the next
stage, so after the `S-1`-tick fill the pipeline runs all stages
concurrently. The reference has nothing comparable (its only distributed
story is Accelerate DDP — /root/reference/trainers/utils/base_trainer.py:29-39).

The whole schedule is differentiable JAX (scan + ppermute inside shard_map):
gradients flow back through the ring automatically, so a pipelined train
step needs no custom VJP. Bubble fraction is the GPipe (S-1)/(T+S-1);
pick n_microbatches >> stages to amortize.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

STAGE_AXIS = "stage"


def _pipeline_local(
    stage_params: Any,  # pytree; leaves (L_local, ...) — this stage's layers
    x: jnp.ndarray,  # (batch, ...) REPLICATED global input
    *,
    layer_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    axis_name: str,
    n_stages: int,
    n_microbatches: int,
):
    """Per-shard GPipe schedule (runs inside shard_map)."""
    stage_id = jax.lax.axis_index(axis_name)
    m = n_microbatches
    mb = x.shape[0] // m
    x_mb = x.reshape(m, mb, *x.shape[1:])

    def apply_stage(carry_x):
        def one_layer(h, params_i):
            return layer_fn(params_i, h), None

        out, _ = jax.lax.scan(one_layer, carry_x, stage_params)
        return out

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    n_ticks = m + n_stages - 1

    def tick(carry, t):
        buf, outputs = carry
        # stage 0 ingests microbatch t (clamped; idle ticks compute garbage
        # that is never selected into the output)
        feed = jax.lax.dynamic_index_in_dim(
            x_mb, jnp.clip(t, 0, m - 1), axis=0, keepdims=False
        )
        inp = jnp.where(stage_id == 0, feed, buf)
        out = apply_stage(inp)
        # the LAST stage finished microbatch (t - (S-1)) this tick
        done_idx = t - (n_stages - 1)
        is_done = jnp.logical_and(done_idx >= 0, stage_id == n_stages - 1)
        outputs = jax.lax.dynamic_update_slice(
            outputs,
            jnp.where(is_done, out, jax.lax.dynamic_index_in_dim(
                outputs, jnp.clip(done_idx, 0, m - 1), axis=0,
                keepdims=False))[None],
            (jnp.clip(done_idx, 0, m - 1),) + (0,) * out.ndim,
        )
        # ship activations to the next stage
        buf = jax.lax.ppermute(out, axis_name, perm=perm)
        return (buf, outputs), None

    init = (
        jnp.zeros_like(x_mb[0]),
        jnp.zeros_like(x_mb),
    )
    (buf, outputs), _ = jax.lax.scan(
        tick, init, jnp.arange(n_ticks, dtype=jnp.int32)
    )
    # outputs live on the last stage; zero elsewhere and psum -> replicated
    outputs = jnp.where(stage_id == n_stages - 1, outputs, 0.0)
    outputs = jax.lax.psum(outputs, axis_name)
    return outputs.reshape(x.shape)


def pipeline_apply(
    stacked_params: Any,  # pytree; leaves (L, ...) — scan-stacked layers
    x: jnp.ndarray,  # (batch, ...)
    layer_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    mesh: Mesh,
    *,
    axis_name: str = STAGE_AXIS,
    n_microbatches: int | None = None,
) -> jnp.ndarray:
    """Run ``x`` through L scan-stacked layers pipelined over the mesh's
    ``axis_name`` axis: layer dim sharded into contiguous stages, batch dim
    split into microbatches streaming through the ring. Differentiable.

    Requires L % n_stages == 0 and batch % n_microbatches == 0.
    ``n_microbatches`` defaults to the batch size (finest granularity).
    """
    n_stages = mesh.shape[axis_name]
    m = int(n_microbatches) if n_microbatches else x.shape[0]
    if x.shape[0] % m:
        raise ValueError(f"batch {x.shape[0]} not divisible by {m} microbatches")
    leaves = jax.tree.leaves(stacked_params)
    if not leaves or leaves[0].shape[0] % n_stages:
        raise ValueError(
            f"layer count {leaves[0].shape[0] if leaves else 0} not divisible "
            f"by {n_stages} stages"
        )

    param_specs = jax.tree.map(
        lambda leaf: P(axis_name, *([None] * (leaf.ndim - 1))), stacked_params
    )
    fn = jax.shard_map(
        functools.partial(
            _pipeline_local, layer_fn=layer_fn, axis_name=axis_name,
            n_stages=n_stages, n_microbatches=m,
        ),
        mesh=mesh,
        in_specs=(param_specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(stacked_params, x)
