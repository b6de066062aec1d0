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

Trainer integration: ``training.pipeline_parallel: S`` puts a ``stage``
axis of size S on the trainer mesh; scan-stacked Encoder/Decoder route
their layer stack through :func:`pipeline_apply` whenever the ambient mesh
has that axis sharded (models/transformer.py), and the stacked layer
params (and their optimizer moments) are placed ``P('stage', ...)`` on the
depth axis by parallel/sharding.py — each device holds only its own
stage's weights.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from attention_models_tpu.parallel.mesh import STAGE_AXIS


def _default_microbatches(local_batch: int, n_stages: int) -> int:
    """Smallest divisor of ``local_batch`` >= min(local_batch, 4*S).
    (``local_batch >= 1`` is validated by pipeline_apply; the loop always
    terminates since local_batch divides itself.)"""
    target = min(local_batch, 4 * n_stages)
    for m in range(target, local_batch + 1):
        if local_batch % m == 0:
            return m
    raise AssertionError("unreachable: local_batch divides itself")


def _tree_where(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def ambient_pp_mesh():
    """The mesh of the enclosing ``jax.sharding.set_mesh`` scope, iff its
    ``stage`` axis is sharded (pipeline parallelism). Scan-stacked
    Encoder/Decoder call this at apply time to decide whether to route
    their layer stack through :func:`pipeline_apply` — the same ambient-
    mesh dispatch the attention layers use for TP/SP
    (models/attention.py)."""
    from attention_models_tpu.parallel.mesh import ambient_mesh_if_sharded

    return ambient_mesh_if_sharded(STAGE_AXIS)


def _pipeline_local(
    stage_params: Any,  # pytree; leaves (L_local, ...) — this stage's layers
    x: Any,  # pytree of (batch, ...) arrays — streamed together
    per_mb: Any,  # pytree of (batch, ...) constants indexed per microbatch
    broadcast: Any,  # pytree of unbatched arrays handed to every layer call
    *,
    layer_fn: Callable[..., Any],
    axis_name: str,
    n_stages: int,
    n_microbatches: int,
):
    """Per-shard GPipe schedule (runs inside shard_map)."""
    stage_id = jax.lax.axis_index(axis_name)
    m = n_microbatches

    def _to_mb(tree):
        return jax.tree.map(
            lambda a: a.reshape(m, a.shape[0] // m, *a.shape[1:]), tree
        )

    x_mb = _to_mb(x)
    per_mb_mb = _to_mb(per_mb)

    def apply_stage(carry_x, consts, mb_idx):
        def one_layer(h, params_i):
            return layer_fn(params_i, h, consts, broadcast, mb_idx), None

        out, _ = jax.lax.scan(one_layer, carry_x, stage_params)
        return out

    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    n_ticks = m + n_stages - 1

    def tick(carry, t):
        buf, outputs = carry
        # stage 0 ingests microbatch t (clamped; idle ticks compute garbage
        # that is never selected into the output)
        t_in = jnp.clip(t, 0, m - 1)
        feed = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(
                a, t_in, axis=0, keepdims=False
            ),
            x_mb,
        )
        inp = _tree_where(stage_id == 0, feed, buf)
        # stage s works on microbatch (t - s): pull its per-microbatch
        # constants (cross-attn context, masks) from the stage-replicated
        # input instead of shipping them around the ring with the carry
        c_idx = jnp.clip(t - stage_id, 0, m - 1)
        consts = jax.tree.map(
            lambda a: jax.lax.dynamic_index_in_dim(
                a, c_idx, axis=0, keepdims=False
            ),
            per_mb_mb,
        )
        # c_idx is also handed to layer_fn so callers can derive
        # per-microbatch randomness (e.g. fold it into dropout keys)
        out = apply_stage(inp, consts, c_idx)
        # the LAST stage finished microbatch (t - (S-1)) this tick
        done_idx = t - (n_stages - 1)
        is_done = jnp.logical_and(done_idx >= 0, stage_id == n_stages - 1)
        idx = jnp.clip(done_idx, 0, m - 1)

        def store(buf_mb, o):
            keep = jax.lax.dynamic_index_in_dim(
                buf_mb, idx, axis=0, keepdims=False
            )
            return jax.lax.dynamic_update_slice(
                buf_mb, jnp.where(is_done, o, keep)[None],
                (idx,) + (0,) * o.ndim,
            )

        outputs = jax.tree.map(store, outputs, out)
        # ship activations to the next stage
        buf = jax.tree.map(
            lambda a: jax.lax.ppermute(a, axis_name, perm=perm), out
        )
        return (buf, outputs), None

    init = (
        jax.tree.map(lambda a: jnp.zeros_like(a[0]), x_mb),
        jax.tree.map(jnp.zeros_like, x_mb),
    )
    (buf, outputs), _ = jax.lax.scan(
        tick, init, jnp.arange(n_ticks, dtype=jnp.int32)
    )
    # outputs live on the last stage; zero elsewhere and psum -> replicated.
    # Reductions run in each leaf's own dtype (ints stay exact); bool goes
    # through int32 since psum has no boolean reduction.
    def _gather(a, ref):
        a = jnp.where(stage_id == n_stages - 1, a, jnp.zeros_like(a))
        if a.dtype == jnp.bool_:
            a = jax.lax.psum(a.astype(jnp.int32), axis_name)
        else:
            a = jax.lax.psum(a, axis_name)
        return a.reshape(ref.shape).astype(ref.dtype)

    return jax.tree.map(_gather, outputs, x)


def pipeline_apply(
    stacked_params: Any,  # pytree; leaves (L, ...) — scan-stacked layers
    x: Any,  # pytree of (batch, ...) arrays streamed through the ring
    layer_fn: Callable[..., Any],
    mesh: Mesh,
    *,
    axis_name: str = STAGE_AXIS,
    n_microbatches: int | None = None,
    batch_axis: str | None = None,
    per_mb: Any = (),
    broadcast: Any = (),
) -> Any:
    """Run ``x`` through L scan-stacked layers pipelined over the mesh's
    ``axis_name`` axis: layer dim sharded into contiguous stages, batch dim
    split into microbatches streaming through the ring. Differentiable.

    ``x`` may be a pytree — every leaf is microbatched and streamed in
    lockstep; ``layer_fn(params_i, x_tree, per_mb_tree, broadcast,
    mb_idx) -> x_tree`` must preserve its structure (``mb_idx`` is the
    traced index of the microbatch being processed — fold it into any
    dropout keys so microbatches draw distinct masks). Batched values the layers read
    but don't rewrite (cross-attn context, padding masks) go in ``per_mb``:
    they stay stage-replicated and each stage indexes its current
    microbatch's slice locally — no ring traffic, no output psum for them.
    ``broadcast`` carries unbatched per-call constants (causal masks).
    On a multi-axis mesh, name the batch-sharded axis via ``batch_axis``
    (the schedule then runs per data shard); other mesh axes must not
    shard anything inside (PP composes with DP, not with TP/SP for now).

    Requires L % n_stages == 0 and the per-shard batch % n_microbatches
    == 0. ``n_microbatches`` defaults to ~4x the stage count (the GPipe
    sweet spot: bubble (S-1)/(m+S-1) ≈ 20% while microbatches stay large
    enough to fill the MXU), rounded up to a divisor of the per-shard
    batch.
    """
    n_stages = mesh.shape[axis_name]
    x_leaves = jax.tree.leaves(x)
    if not x_leaves:
        raise ValueError("pipeline_apply needs at least one streamed array")
    dp = mesh.shape[batch_axis] if batch_axis else 1
    batch = x_leaves[0].shape[0]
    if batch < dp or batch % dp:
        raise ValueError(
            f"batch {batch} not divisible by the {dp}-way '{batch_axis}' "
            f"mesh axis"
        )
    local_batch = batch // dp
    m = int(n_microbatches) if n_microbatches else _default_microbatches(
        local_batch, n_stages
    )
    if local_batch % m:
        raise ValueError(
            f"per-shard batch {local_batch} not divisible by {m} microbatches"
        )
    leaves = jax.tree.leaves(stacked_params)
    if not leaves or leaves[0].shape[0] % n_stages:
        raise ValueError(
            f"layer count {leaves[0].shape[0] if leaves else 0} not divisible "
            f"by {n_stages} stages"
        )

    param_specs = jax.tree.map(
        lambda leaf: P(axis_name, *([None] * (leaf.ndim - 1))), stacked_params
    )
    x_specs = jax.tree.map(lambda leaf: P(batch_axis), x)
    per_mb_specs = jax.tree.map(lambda leaf: P(batch_axis), per_mb)
    bc_specs = jax.tree.map(lambda leaf: P(), broadcast)
    fn = jax.shard_map(
        functools.partial(
            _pipeline_local, layer_fn=layer_fn, axis_name=axis_name,
            n_stages=n_stages, n_microbatches=m,
        ),
        mesh=mesh,
        in_specs=(param_specs, x_specs, per_mb_specs, bc_specs),
        out_specs=x_specs,
        check_vma=False,
    )
    return fn(stacked_params, x, per_mb, broadcast)
