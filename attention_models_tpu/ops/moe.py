"""Vectorized top-k expert dispatch.

The reference routes tokens with Python loops over experts and
``torch.where`` index scatters (/root/reference/models/moe.py:31-36,
switchhead_attention.py:58-88) — serial and host-shaped. Here routing is a
dense one-hot combine (small expert counts) or a capacity-bucketed gather
dispatch (large expert counts), both single fused XLA programs that map onto
the MXU, and shardable over the ``model`` mesh axis for expert parallelism.

Gate semantics match the reference exactly: ``topk`` of the gate logits, with
combine weights ``sigmoid(topk values)`` (or no weights at all — the
SwitchHead ``moe_out`` quirk, SURVEY.md §2.9#8 — via ``weights=None``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def topk_gate(gate_logits: jnp.ndarray, k: int):
    """Returns (weights, selected) like torch.topk + sigmoid:
    values sorted descending, ties to the lower index."""
    vals, idx = jax.lax.top_k(gate_logits, k)
    return jax.nn.sigmoid(vals).astype(gate_logits.dtype), idx


def _combine_weights(
    selected: jnp.ndarray,  # (..., k) int
    weights: jnp.ndarray | None,  # (..., k) or None
    num_experts: int,
) -> jnp.ndarray:
    """Per-token combine vector over experts: (..., E)."""
    one_hot = jax.nn.one_hot(selected, num_experts, dtype=jnp.float32)
    if weights is None:
        # unweighted accumulation; a token selecting the same expert twice
        # accumulates it twice, matching the reference's `+=` scatter.
        return jnp.sum(one_hot, axis=-2)
    return jnp.einsum("...ke,...k->...e", one_hot, weights.astype(jnp.float32))


def moe_linear_dense(
    x: jnp.ndarray,  # (..., d_in)
    w: jnp.ndarray,  # (E, d_in, d_out)
    selected: jnp.ndarray,  # (..., k)
    weights: jnp.ndarray | None = None,  # (..., k)
    b: jnp.ndarray | None = None,  # (E, d_out)
) -> jnp.ndarray:
    """Dense dispatch: every expert runs on every token, masked combine.

    FLOP cost is E× the routed cost — the right trade on MXUs when E is small
    (SwitchHead's 5) because it is one big batched matmul with zero data
    movement."""
    combine = _combine_weights(selected, weights, w.shape[0])  # (..., E)
    # bf16 towers keep bf16 MXU operands (x already carries bf16 rounding —
    # upcasting buys no fidelity at half the MXU rate, the r2 codebook-dot
    # lever); fp32 towers keep the exact fp32 path. Accumulation is fp32
    # either way.
    op_t = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    y = jnp.einsum(
        "...d,edh->...eh", x.astype(op_t), w.astype(op_t),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b.astype(jnp.float32)
    out = jnp.einsum("...eh,...e->...h", y, combine)
    return out.astype(x.dtype)


def moe_linear_scatter(
    x: jnp.ndarray,  # (..., d_in)
    w: jnp.ndarray,  # (E, d_in, d_out)
    selected: jnp.ndarray,  # (..., k)
    weights: jnp.ndarray | None = None,
    b: jnp.ndarray | None = None,
    capacity_factor: float | None = None,
) -> jnp.ndarray:
    """Capacity-bucketed dispatch: tokens are gathered into per-expert
    buckets, each expert runs one (C, d_in)@(d_in, d_out) matmul, results are
    combined back. Routed FLOPs only — the right trade for large E (ViTMoE's
    32). ``capacity_factor=None`` sizes buckets for zero token dropping
    (capacity = N·k, exact but memory-heavy); training configs set ~2.0."""
    e = w.shape[0]
    k = selected.shape[-1]
    lead = x.shape[:-1]
    d_in = x.shape[-1]

    xf = x.reshape(-1, d_in)
    n = xf.shape[0]
    sel = selected.reshape(n, k)
    wts = None if weights is None else weights.reshape(n, k)

    if capacity_factor is None:
        capacity = n * k  # dropless worst case
    else:
        # ceil, matching moe_linear_ep_local — truncation would make the
        # single-chip path drop more tokens than the EP path at the same
        # capacity_factor
        capacity = max(math.ceil(capacity_factor * n * k / e), 1)

    # position of each (token, slot) within its expert bucket
    sel_flat = sel.reshape(-1)  # (n*k,)
    one_hot = jax.nn.one_hot(sel_flat, e, dtype=jnp.int32)  # (n*k, E)
    pos_in_expert = jnp.cumsum(one_hot, axis=0) - 1  # running count
    pos = jnp.take_along_axis(pos_in_expert, sel_flat[:, None], axis=-1)[:, 0]
    keep = pos < capacity

    # scatter tokens into (E, C, d_in); over-capacity (token, slot) pairs
    # have pos >= capacity and are discarded by mode="drop" without
    # touching any in-bounds slot (clamping them would clobber the valid
    # token occupying the last slot).
    buckets = jnp.zeros((e, capacity, d_in), x.dtype)
    tok_ids = jnp.repeat(jnp.arange(n), k)
    # (sel_flat, pos) pairs are unique by construction (pos is a running
    # count within each expert) — telling XLA lets it parallelize the
    # scatter instead of serializing row updates
    buckets = buckets.at[sel_flat, pos].set(xf[tok_ids], mode="drop",
                                            unique_indices=True)

    # bf16 towers: bf16 MXU operands, fp32 accumulation (see
    # moe_linear_dense — the upcast buys no fidelity on bf16-rounded data)
    op_t = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    y = jnp.einsum(
        "ecd,edh->ech", buckets.astype(op_t), w.astype(op_t),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b.astype(jnp.float32)[:, None, :]

    # gather back: each (token, slot) reads y[expert, pos]
    out_slots = y[sel_flat, jnp.where(keep, pos, 0)]  # (n*k, d_out)
    out_slots = jnp.where(keep[:, None], out_slots, 0)
    if wts is not None:
        out_slots = out_slots * wts.reshape(-1)[:, None].astype(jnp.float32)
    out = jnp.sum(out_slots.reshape(n, k, -1), axis=1)
    return out.reshape(*lead, -1).astype(x.dtype)


def resolve_moe_impl(impl: str, num_experts: int) -> str:
    """'auto' cutover shared by moe_linear and SwitchHeadAttention: the
    dense masked-combine materializes an E-wide intermediate, so it only
    wins for small expert counts; validates unknown impl strings."""
    if impl == "auto":
        return "dense" if num_experts <= 8 else "scatter"
    if impl not in ("dense", "scatter"):
        raise ValueError(f"unknown moe impl {impl!r}")
    return impl


def moe_linear(
    x: jnp.ndarray,
    w: jnp.ndarray,
    selected: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    b: jnp.ndarray | None = None,
    impl: str = "auto",
    capacity_factor: float | None = None,
) -> jnp.ndarray:
    impl = resolve_moe_impl(impl, w.shape[0])  # validates: dense | scatter
    if impl == "dense":
        return moe_linear_dense(x, w, selected, weights, b)
    return moe_linear_scatter(
        x, w, selected, weights, b, capacity_factor=capacity_factor
    )


def moe_linear_ep_local(
    x: jnp.ndarray,  # (n_local, d_in) — this device's token shard
    w: jnp.ndarray,  # (E/ep, d_in, d_out) — this device's expert shard
    selected: jnp.ndarray,  # (n_local, k) GLOBAL expert ids
    weights: jnp.ndarray | None = None,  # (n_local, k)
    b: jnp.ndarray | None = None,  # (E/ep, d_out)
    *,
    axis_name: str,
    axis_size: int,
    capacity_factor: float | None = 2.0,
) -> jnp.ndarray:
    """Distributed expert-parallel dispatch (per-shard; use inside shard_map).

    The canonical switch-transformer layout: tokens AND experts are sharded
    over the same mesh axis. Each device buckets its local tokens by global
    expert, one `all_to_all` ships every bucket to the expert's owner, the
    owner runs one (e_loc, ep*C, d_in)@(d_in, d_out) batched matmul, and a
    second `all_to_all` ships results home for the weighted combine. Replaces
    what the reference never had (its MoE is a host loop over experts —
    /root/reference/models/moe.py:31-36); both all_to_alls ride ICI.

    Capacity is per (source device, expert): C = ceil(cf·n_loc·k/E); tokens
    over capacity are dropped exactly like moe_linear_scatter. Differentiable
    (all_to_all is linear; XLA autodiffs the whole dispatch).
    """
    ep = axis_size
    e_total = w.shape[0] * ep
    e_loc = w.shape[0]
    n, k = selected.shape
    d_in = x.shape[-1]

    if capacity_factor is None:
        cap = n * k  # dropless worst case
    else:
        cap = max(int(math.ceil(capacity_factor * n * k / e_total)), 1)

    # position of each (token, slot) within its (global) expert bucket
    sel_flat = selected.reshape(-1)  # (n*k,)
    one_hot = jax.nn.one_hot(sel_flat, e_total, dtype=jnp.int32)
    pos = jnp.take_along_axis(
        jnp.cumsum(one_hot, axis=0) - 1, sel_flat[:, None], axis=-1
    )[:, 0]
    keep = pos < cap

    buckets = jnp.zeros((e_total, cap, d_in), x.dtype)
    tok_ids = jnp.repeat(jnp.arange(n), k)
    # out-of-capacity pairs have pos >= cap -> discarded by mode="drop"
    buckets = buckets.at[sel_flat, pos].set(x[tok_ids], mode="drop")

    # ship buckets to expert owners: (ep, e_loc, C, d) -> [src j] for my experts
    send = buckets.reshape(ep, e_loc, cap, d_in)
    recv = jax.lax.all_to_all(send, axis_name, split_axis=0, concat_axis=0,
                              tiled=False)
    xin = jnp.transpose(recv, (1, 0, 2, 3)).reshape(e_loc, ep * cap, d_in)

    y = jnp.einsum(
        "ecd,edh->ech", xin.astype(jnp.float32), w.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b.astype(jnp.float32)[:, None, :]
    d_out = y.shape[-1]

    # ship results home: inverse of the forward exchange
    back = jnp.transpose(
        y.reshape(e_loc, ep, cap, d_out), (1, 0, 2, 3)
    ).astype(x.dtype)
    home = jax.lax.all_to_all(back, axis_name, split_axis=0, concat_axis=0,
                              tiled=False)
    y_all = home.reshape(e_total, cap, d_out)

    out_slots = y_all[sel_flat, jnp.where(keep, pos, 0)].astype(jnp.float32)
    out_slots = jnp.where(keep[:, None], out_slots, 0)
    if weights is not None:
        out_slots = out_slots * weights.reshape(-1)[:, None].astype(jnp.float32)
    return jnp.sum(out_slots.reshape(n, k, d_out), axis=1).astype(x.dtype)


def moe_linear_ep(
    x: jnp.ndarray,  # (n, d_in) GLOBAL tokens
    w: jnp.ndarray,  # (E, d_in, d_out) GLOBAL expert bank
    selected: jnp.ndarray,  # (n, k)
    weights: jnp.ndarray | None,
    mesh,
    *,
    axis_name: str = "data",
    b: jnp.ndarray | None = None,
    capacity_factor: float | None = 2.0,
) -> jnp.ndarray:
    """Global-tensor wrapper: shard tokens and experts over ``axis_name`` and
    run the all_to_all dispatch. E and n must divide the axis size."""
    import functools

    from jax.sharding import PartitionSpec as P

    ep = mesh.shape[axis_name]
    fn = jax.shard_map(
        functools.partial(
            moe_linear_ep_local, axis_name=axis_name, axis_size=ep,
            capacity_factor=capacity_factor,
        ),
        mesh=mesh,
        in_specs=(
            P(axis_name, None),          # x: tokens sharded
            P(axis_name, None, None),    # w: experts sharded
            P(axis_name, None),          # selected
            None if weights is None else P(axis_name, None),
            None if b is None else P(axis_name, None),
        ),
        out_specs=P(axis_name, None),
        check_vma=False,
    )
    return fn(x, w, selected, weights, b)
