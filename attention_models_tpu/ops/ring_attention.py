"""Ring (context-parallel) flash attention.

Shards the SEQUENCE dimension over a mesh axis so attention over contexts far
beyond one chip's HBM runs at O(t/n) memory per device: each device keeps its
local q shard pinned and streams the k/v shards around the ring with
`jax.lax.ppermute` (ICI neighbor exchange), merging per-chunk flash outputs
with the online-softmax rule. This is the `sequence` mesh-axis design the
blockwise flash kernel (ops/flash_attention.py) was shaped for, and the
TPU-native replacement for long-context support the reference lacks entirely
(its attention materializes the full (t, t) score matrix —
/root/reference/models/softmax_attention.py:62-76).

Forward:  o, lse accumulated across ring steps via logsumexp merging.
Backward: exact ring backward — dq accumulates locally against each visiting
k/v chunk while dk/dv accumulators TRAVEL WITH their chunks; per-chunk partial
gradients recompute P from the GLOBAL lse (flash_bwd_dq / flash_bwd_dkv), so
gradients are exact, not an approximation.

Causal masking: at ring step s a device holds the chunk of source device
(my - s) mod n. s == 0 is the diagonal (standard causal kernel); s > 0 is
either fully visible (source strictly in the past) or fully masked (source in
the future — the "wrapped" devices). Wrapped contributions are computed and
discarded (lse := -inf / grads := 0): the classic ring-causal load imbalance,
acceptable because all devices are lock-stepped by the permute anyway.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from attention_models_tpu.ops.flash_attention import (
    _flash_forward,
    flash_bwd_dkv,
    flash_bwd_dq,
    flash_delta,
)

_NEG_INF = -1e30


def _shift(xs, axis_name: str, n: int):
    """Rotate pytree shards one step around the ring (device i -> i+1)."""
    perm = [(i, (i + 1) % n) for i in range(n)]
    return jax.tree.map(
        lambda x: jax.lax.ppermute(x, axis_name, perm=perm), xs
    )


def _ring_forward(
    q, k, v, *, axis_name: str, n: int, causal: bool, scale: float,
    block_q: int, block_k: int, interpret: bool,
):
    """Local shards (b, h, t_local, d) -> (o local, lse local fp32)."""
    my = jax.lax.axis_index(axis_name)
    kc, vc = k, v
    o = None
    lse = None
    for s in range(n):
        o_i, lse_i = _flash_forward(
            q, kc, vc, scale=scale, causal=(causal and s == 0),
            block_q=block_q, block_k=block_k, interpret=interpret,
        )
        if causal and s > 0:
            # source chunk (my - s) wrapped past 0 => it is in my future
            live = my >= s
            lse_i = jnp.where(live, lse_i, _NEG_INF)
        if o is None:
            o, lse = o_i.astype(jnp.float32), lse_i
        else:
            m = jnp.maximum(lse, lse_i)
            w_old = jnp.exp(lse - m)[..., None]
            w_new = jnp.exp(lse_i - m)[..., None]
            o = o * w_old + o_i.astype(jnp.float32) * w_new
            lse = m + jnp.log(w_old[..., 0] + w_new[..., 0])
            o = o / (w_old + w_new)  # keep o normalized each step
        if s != n - 1:
            kc, vc = _shift((kc, vc), axis_name, n)
    return o.astype(q.dtype), lse


def _ring_backward(
    q, k, v, o, lse, g, *, axis_name: str, n: int, causal: bool,
    scale: float, block_q: int, block_k: int, interpret: bool,
):
    my = jax.lax.axis_index(axis_name)
    delta = flash_delta(o, g)
    dq = jnp.zeros(q.shape, jnp.float32)
    kc, vc = k, v
    dk_acc = jnp.zeros(k.shape, jnp.float32)
    dv_acc = jnp.zeros(v.shape, jnp.float32)
    for s in range(n):
        step_causal = causal and s == 0
        dq_i = flash_bwd_dq(
            kc, vc, q, g, lse, delta, scale=scale, causal=step_causal,
            block_q=block_q, block_k=block_k, interpret=interpret,
        )
        dk_i, dv_i = flash_bwd_dkv(
            q, g, lse, delta, kc, vc, scale=scale, causal=step_causal,
            block_q=block_q, block_k=block_k, interpret=interpret,
        )
        if causal and s > 0:
            # select, don't multiply: the dead partials were computed with
            # causal=False against the GLOBAL lse, so p = exp(s - lse) can
            # overflow to Inf — 0.0 * Inf would turn the discard into NaN
            live = my >= s
            dq_i = jnp.where(live, dq_i, 0.0)
            dk_i = jnp.where(live, dk_i, 0.0)
            dv_i = jnp.where(live, dv_i, 0.0)
        dq = dq + dq_i.astype(jnp.float32)
        dk_acc = dk_acc + dk_i.astype(jnp.float32)
        dv_acc = dv_acc + dv_i.astype(jnp.float32)
        # accumulators travel WITH their chunk; after n shifts they are home.
        # Last hop: kc/vc are never read again — ship only the accumulators
        # (halves the final step's ICI payload, mirroring the forward's
        # s != n-1 guard)
        if s != n - 1:
            kc, vc, dk_acc, dv_acc = _shift(
                (kc, vc, dk_acc, dv_acc), axis_name, n
            )
        else:
            dk_acc, dv_acc = _shift((dk_acc, dv_acc), axis_name, n)
    return dq.astype(q.dtype), dk_acc.astype(k.dtype), dv_acc.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4, 5))
def _ring(axis_name, n, causal, scale, blocks, interpret, q, k, v):
    o, _ = _ring_forward(
        q, k, v, axis_name=axis_name, n=n, causal=causal, scale=scale,
        block_q=blocks[0], block_k=blocks[1], interpret=interpret,
    )
    return o


def _ring_fwd(axis_name, n, causal, scale, blocks, interpret, q, k, v):
    o, lse = _ring_forward(
        q, k, v, axis_name=axis_name, n=n, causal=causal, scale=scale,
        block_q=blocks[0], block_k=blocks[1], interpret=interpret,
    )
    return o, (q, k, v, o, lse)


def _ring_bwd(axis_name, n, causal, scale, blocks, interpret, res, g):
    q, k, v, o, lse = res
    return _ring_backward(
        q, k, v, o, lse, g, axis_name=axis_name, n=n, causal=causal,
        scale=scale, block_q=blocks[0], block_k=blocks[1],
        interpret=interpret,
    )


_ring.defvjp(_ring_fwd, _ring_bwd)


def ring_attention_local(
    q, k, v, *, axis_name: str, axis_size: int, causal: bool = False,
    scale: float | None = None, block_q: int = 1024, block_k: int = 1024,
    interpret: bool = False,
):
    """Per-shard entry point for use INSIDE an existing shard_map/pjit body:
    q, k, v are the local (b, h, t/n, d) shards on a mesh axis of size
    ``axis_size`` named ``axis_name``. Differentiable (exact custom VJP)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    return _ring(
        axis_name, axis_size, causal, scale, (block_q, block_k), interpret,
        q, k, v,
    )


def ring_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh,
    *,
    seq_axis: str,
    batch_axis: str | None = None,
    head_axis: str | None = None,
    causal: bool = False,
    scale: float | None = None,
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Ring attention over GLOBAL (b, h, t, d) tensors: shard_map with the
    sequence dim partitioned over ``seq_axis`` (batch/head dims optionally
    over other mesh axes). t must divide by the ring size; each local shard
    length must be a multiple of 8 (the flash kernel's tiling rule)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    from jax.sharding import PartitionSpec as P

    n = mesh.shape[seq_axis]
    spec = P(batch_axis, head_axis, seq_axis, None)
    fn = jax.shard_map(
        functools.partial(
            ring_attention_local, axis_name=seq_axis, axis_size=n,
            causal=causal, scale=scale, block_q=block_q, block_k=block_k,
            interpret=interpret,
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
