"""Attention primitives: SoftmaxAttention, AgentAttention, SwitchHeadAttention.

API parity with /root/reference/models/{softmax,agent,switchhead}_attention.py
(same constructor knobs, same forward signature semantics), implemented on
top of the ops layer: the XLA einsum path carries the reference's exact mask
semantics and the Pallas flash kernel is dispatched to when masks allow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from attention_models_tpu.ops.attention import multihead_attention
from attention_models_tpu.ops.flash_attention import flash_attention, flash_supported
from attention_models_tpu.ops.moe import (
    _combine_weights,
    moe_linear_scatter,
    resolve_moe_impl,
    topk_gate,
)


from attention_models_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    SEQ_AXIS,
    ambient_mesh_if_sharded,
)


def _ambient_sp_mesh():
    """The ambient mesh iff its ``seq`` axis is sharded (sequence/context
    parallelism): attention then runs the ring kernel with the token dim
    partitioned over the ring, and GSPMD keeps the surrounding pointwise ops
    (LN, FFN) sharded over the same axis."""
    return ambient_mesh_if_sharded(SEQ_AXIS)


def _ambient_tp_mesh():
    """The ambient mesh iff its ``model`` axis is sharded (tensor
    parallelism) — attention then runs the flash kernel per-shard with
    heads over ``model``. This replaces a mutable module global: the mesh
    is read from the trace context, nothing is flipped on or off."""
    return ambient_mesh_if_sharded(MODEL_AXIS)


def _tp_shardable(q, k, mesh):
    """(b, t, h, d) inputs: batch over the data axis, heads over model."""
    dp = mesh.shape.get("data", 1)
    tp = mesh.shape.get("model", 1)
    return (
        q.shape[0] % dp == 0
        and q.shape[2] % tp == 0
        and k.shape[0] % dp == 0
        and k.shape[2] % tp == 0
    )


def _dispatch_attention(
    q, k, v, *, scale, causal, causal_mask, context_mask, use_flash,
    kv_packed=None,
):
    """q, k, v and the result are (b, t, h, d) — the LAYOUT-NATIVE form the
    projections produce, kept all the way into the Pallas kernel (the
    (b, h, t, d) view is a real transpose that XLA materializes as 16MB
    copies per k/v per layer at the pallas_call boundary — 9.6% of the
    recon step before this). Flash kernel when only (optional) causal
    masking is needed and the shapes tile; the reference-semantics XLA path
    otherwise. Under tensor parallelism the kernel runs per-shard via
    shard_map with heads over the model axis."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    if causal and tq > tk:
        # reject on BOTH paths, not just flash: the bottom-right-aligned
        # mask leaves the first tq-tk rows with no visible keys — flash
        # would NaN, the XLA path would silently go uniform over -1e9
        from attention_models_tpu.ops.flash_attention import (
            _check_causal_lengths,
        )

        _check_causal_lengths(tq, tk)
    if use_flash is None:
        sp_mesh = _ambient_sp_mesh()
        if sp_mesh is not None:
            sp = sp_mesh.shape[SEQ_AXIS]
            ring_ok = (
                context_mask is None and causal_mask is None
                and tq % sp == 0 and tk % sp == 0
                and flash_supported((b, h, tq // sp, d), (b, h, tk // sp, d),
                                    itemsize=q.dtype.itemsize)
            )
            if ring_ok:
                from attention_models_tpu.ops.ring_attention import (
                    ring_flash_attention,
                )

                dp = sp_mesh.shape.get(DATA_AXIS, 1)
                tp = sp_mesh.shape.get(MODEL_AXIS, 1)
                qh, kh, vh = (jnp.swapaxes(x_, 1, 2) for x_ in (q, k, v))
                out = ring_flash_attention(
                    qh, kh, vh, sp_mesh,
                    seq_axis=SEQ_AXIS,
                    batch_axis=DATA_AXIS if b % dp == 0 else None,
                    head_axis=MODEL_AXIS if (tp > 1 and h % tp == 0) else None,
                    causal=causal, scale=scale,
                )
                return jnp.swapaxes(out, 1, 2)
            # fall through to the (possibly GSPMD-sharded) XLA path
        flash_ok = (
            context_mask is None
            and causal_mask is None  # explicit mask tensors go XLA
            and flash_supported((b, h, tq, d), (b, h, tk, d),
                                itemsize=q.dtype.itemsize)
        )
        tp_mesh = _ambient_tp_mesh()
        if tp_mesh is not None:
            if flash_ok and _tp_shardable(q, k, tp_mesh):
                from attention_models_tpu.ops.flash_attention import (
                    flash_attention_sharded_bthd,
                )

                return flash_attention_sharded_bthd(
                    q, k, v, tp_mesh, scale=scale, causal=causal
                )
            use_flash = False
        else:
            use_flash = flash_ok
    elif use_flash and (causal_mask is not None or context_mask is not None):
        # explicit opt-in cannot override correctness: the Pallas kernels
        # apply only the built-in causal pattern, not arbitrary mask
        # tensors — honoring the masks on the XLA path beats silently
        # attending to padding/future tokens
        use_flash = False
    if use_flash:
        if kv_packed is not None and kv_packed.shape[0] == q.shape[0]:
            # k/v straight from the fused wkv projection — no strided
            # slice copies at the kernel boundary (see flash_attention_
            # bthd_kv); the packed path needs matching batches (the XLA
            # path may broadcast a size-1 q batch against the context)
            from attention_models_tpu.ops.flash_attention import (
                flash_attention_bthd_kv,
            )

            return flash_attention_bthd_kv(
                q, kv_packed, scale=scale, causal=causal
            )
        from attention_models_tpu.ops.flash_attention import (
            flash_attention_bthd,
        )

        return flash_attention_bthd(q, k, v, scale=scale, causal=causal)
    if causal and causal_mask is None:
        from attention_models_tpu.ops.attention import make_causal_mask

        causal_mask = make_causal_mask(tq, tk)
    qh, kh, vh = (jnp.swapaxes(t_, 1, 2) for t_ in (q, k, v))
    out = multihead_attention(
        qh, kh, vh, scale=scale, causal_mask=causal_mask,
        context_mask=context_mask,
    )
    return jnp.swapaxes(out, 1, 2)


class SoftmaxAttention(nn.Module):
    """Standard MHA (softmax_attention.py:22-82): fused KV projection,
    no-bias Q/KV, biased output projection, dropout on projections.

    ``causal`` is the static jit-friendly form of the reference's runtime
    causal_mask tensor; passing an explicit ``causal_mask`` still works."""

    dim: int
    num_heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_flash: bool | None = None
    max_decode_len: int | None = None  # KV-cache size for decode mode
    quant: str | None = None  # "int8": W8A8 projections (ops/quant.py)

    def _proj(self, x, features: int, *, name: str, use_bias: bool):
        """Linear projection; W8A8 via quant_dot when ``quant`` is set
        (same param pytree paths either way — checkpoints unchanged).
        The attention score/value matmuls themselves stay bf16 flash."""
        if self.quant == "int8":
            from attention_models_tpu.models.layers import _DenseKernel
            from attention_models_tpu.ops.quant import quant_dot

            p = _DenseKernel((x.shape[-1], features), use_bias=use_bias,
                             name=name)()
            if use_bias:
                kernel, bias = p
                return quant_dot(x, kernel, out_dtype=self.dtype) + \
                    bias.astype(self.dtype)
            return quant_dot(x, p, out_dtype=self.dtype)
        return nn.Dense(features, use_bias=use_bias, dtype=self.dtype,
                        name=name)(x)

    @nn.compact
    def __call__(
        self,
        x,
        context=None,
        causal_mask=None,
        context_mask=None,
        causal: bool = False,
        deterministic: bool = True,
        decode: bool = False,
    ):
        h, d = self.num_heads, self.dim_head
        q = self._proj(x, h * d, name="wq", use_bias=False)
        q = nn.Dropout(self.dropout)(q, deterministic=deterministic)

        kv_src = x if context is None else context
        kv = self._proj(kv_src, 2 * h * d, name="wkv", use_bias=False)
        kv = nn.Dropout(self.dropout)(kv, deterministic=deterministic)

        if decode:
            qh = rearrange(q, "b t (h d) -> b h t d", h=h)
            kh, vh = rearrange(kv, "b t (kv h d) -> kv b h t d", kv=2, h=h)
            out = self._decode_attention(qh, kh, vh,
                                         is_cross=context is not None)
            out = rearrange(out, "b h t d -> b t (h d)")
        else:
            # pure reshapes/slices — no transposes anywhere on this path
            b, tq = q.shape[:2]
            q4 = q.reshape(b, tq, h, d)
            # kv keeps ITS OWN batch: cross-attention contexts may broadcast
            # against a differently-batched q (e.g. Muse CFG decode)
            kv5 = kv.reshape(kv.shape[0], kv.shape[1], 2, h, d)
            out = _dispatch_attention(
                q4, kv5[:, :, 0], kv5[:, :, 1],
                scale=d ** -0.5,
                causal=causal,
                causal_mask=causal_mask,
                context_mask=context_mask,
                use_flash=self.use_flash,
                kv_packed=kv5,
            )
            # out keeps ITS OWN batch (einsum broadcasting on the XLA path
            # can widen a size-1 q batch against the context batch)
            out = out.reshape(out.shape[0], out.shape[1], h * d)
        out = self._proj(out, self.dim, name="wo", use_bias=True)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)

    def _decode_attention(self, q, k, v, is_cross: bool):
        """Single-step KV-cached attention (q has t==1). Self-attention
        appends (k, v) into a rolling cache; cross-attention keys/values are
        position-independent so they pass straight through. The reference has
        no KV cache (it re-forwards the whole prefix each AR step,
        parti.py:126-153) — this is the idiomatic-TPU upgrade (SURVEY §7.6)."""
        scale = self.dim_head ** -0.5
        if is_cross:
            return multihead_attention(q, k, v, scale=scale)

        if self.max_decode_len is None:
            raise ValueError("decode mode needs max_decode_len")
        b, h, _, d = q.shape
        ck = self.variable(
            "cache", "cached_key",
            lambda: jnp.zeros((b, h, self.max_decode_len, d), k.dtype),
        )
        cv = self.variable(
            "cache", "cached_value",
            lambda: jnp.zeros((b, h, self.max_decode_len, d), v.dtype),
        )
        ci = self.variable("cache", "cache_index",
                           lambda: jnp.zeros((), jnp.int32))
        idx = ci.value
        ck.value = jax.lax.dynamic_update_slice(ck.value, k, (0, 0, idx, 0))
        cv.value = jax.lax.dynamic_update_slice(cv.value, v, (0, 0, idx, 0))
        ci.value = idx + 1

        scores = jnp.einsum(
            "bhid,bhjd->bhij", q * scale, ck.value,
            preferred_element_type=jnp.float32,
        )  # (b, h, 1, L)
        valid = jnp.arange(self.max_decode_len)[None, None, None, :] <= idx
        scores = jnp.where(valid, scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        return jnp.einsum("bhij,bhjd->bhid", probs, cv.value)


def adaptive_avg_pool_1d(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    """torch AdaptiveAvgPool semantics along one axis:
    cell i averages input[floor(i·L/out) : ceil((i+1)·L/out)]."""
    length = x.shape[axis]
    x = jnp.moveaxis(x, axis, -1)
    pieces = []
    for i in range(out_size):
        start = (i * length) // out_size
        end = -(-((i + 1) * length) // out_size)  # ceil
        pieces.append(jnp.mean(x[..., start:end], axis=-1))
    out = jnp.stack(pieces, axis=-1)
    return jnp.moveaxis(out, -1, axis)


class AgentAttention(nn.Module):
    """Agent Attention (arXiv 2312.08874; agent_attention.py:21-79).

    Agent tokens = adaptive-avg-pool of Q over the (t, h) plane to
    (√a, √a); requires num_heads == int(agent_num**0.5) to type-check, as in
    the reference (SURVEY.md §2.1). Two-stage attention plus a depthwise-conv
    residual over the (heads, time) grid. ``context_mask`` accepted but
    unused, matching the reference."""

    dim: int
    num_heads: int = 8
    dim_head: int = 64
    agent_num: int = 47
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context_mask=None, deterministic: bool = True):
        h, d = self.num_heads, self.dim_head
        scale = d ** -0.5
        qkv = nn.Dense(3 * h * d, use_bias=False, dtype=self.dtype, name="wqkv")(x)
        q, k, v = rearrange(qkv, "b t (qkv h d) -> qkv b h t d", qkv=3, h=h)

        pool_size = int(self.agent_num ** 0.5)
        # reference: pool q.permute(0,3,2,1) == (b, d, t, h) over (t, h),
        # then permute back -> (b, pool, pool, d) read as (b, h', t', d)
        q_p = jnp.transpose(q, (0, 3, 2, 1))  # (b, d, t, h)
        agents = adaptive_avg_pool_1d(q_p, pool_size, axis=2)
        agents = adaptive_avg_pool_1d(agents, pool_size, axis=3)
        agents = jnp.transpose(agents, (0, 3, 2, 1))  # (b, pool, pool, d)

        bias1 = self.param("bias1", nn.initializers.zeros, (1, 1, 1, 1), jnp.float32)
        bias2 = self.param("bias2", nn.initializers.zeros, (1, 1, 1, 1), jnp.float32)

        # stage 1 — agent aggregation: agents attend to K, V
        s1 = jnp.einsum(
            "bhid,bhjd->bhij", agents * scale, k,
            preferred_element_type=jnp.float32,
        ) + bias1
        p1 = jax.nn.softmax(s1, axis=-1).astype(self.dtype)
        v_agent = jnp.einsum("bhij,bhjd->bhid", p1, v)

        # stage 2 — agent broadcast: Q attends to agents
        s2 = jnp.einsum(
            "bhid,bhjd->bhij", q * scale, agents,
            preferred_element_type=jnp.float32,
        ) + bias2
        p2 = jax.nn.softmax(s2, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", p2, v_agent)

        # depthwise 3x3 conv residual over the (heads, time) grid, channels=d
        dwc = self._dwc(v)
        out = out + dwc

        out = rearrange(out, "b h t d -> b t (h d)")
        out = nn.Dense(self.dim, dtype=self.dtype, name="wo")(out)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)

    def _dwc(self, v):
        # v: (b, h, t, d) -> NHWC with spatial (h, t), channels d
        x = jnp.transpose(v, (0, 1, 2, 3))  # (b, h, t, d) already NHWC
        conv = nn.Conv(
            features=self.dim_head,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            feature_group_count=self.dim_head,
            dtype=self.dtype,
            name="dwc",
        )
        return conv(x)


class SwitchHeadAttention(nn.Module):
    """SwitchHead (arXiv 2312.07987; switchhead_attention.py:18-116): dense
    per-head Q/K; V produced by top-k routed experts Linear(dim→d_head);
    output projection routed through experts Linear(d_head→dim) and **summed
    over heads**. Reference quirks preserved (SURVEY.md §2.9#8): the output
    MoE's gate weights are computed but NOT applied (unweighted sum); the
    V MoE's weights are sigmoid(topk logits).
    """

    dim: int
    num_heads: int = 8
    dim_head: int = 64
    num_experts: int = 5
    sel_experts: int = 2
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    moe_impl: str = "auto"  # "auto" | "dense" | "scatter" for the output MoE
    capacity_factor: float | None = None

    @nn.compact
    def __call__(
        self,
        x,
        context=None,
        causal_mask=None,
        context_mask=None,
        causal: bool = False,
        deterministic: bool = True,
    ):
        h, d, e = self.num_heads, self.dim_head, self.num_experts
        q = nn.Dense(h * d, use_bias=False, dtype=self.dtype, name="wq")(x)
        q = nn.Dropout(self.dropout)(q, deterministic=deterministic)
        q = q.reshape(*q.shape[:2], h, d)  # (b, t, h, d) — layout-native

        src = x if context is None else context
        k = nn.Dense(h * d, use_bias=False, dtype=self.dtype, name="wk")(src)
        k = nn.Dropout(self.dropout)(k, deterministic=deterministic)
        k = k.reshape(*k.shape[:2], h, d)

        # --- V MoE: per-head top-k routed value projection -------------------
        ws = nn.Dense(h * e, use_bias=False, dtype=self.dtype, name="ws")(src)
        gate_v = rearrange(ws, "b t (h e) -> b t h e", h=h)
        wts_v, sel_v = topk_gate(gate_v, self.sel_experts)  # (b,t,h,k)
        experts_v = self.param(
            "experts_v",
            nn.initializers.lecun_normal(),
            (e, self.dim, d),
            jnp.float32,
        )
        # expert outputs shared across heads: (b, t, E, d_head)
        vx = jnp.einsum(
            "btd,edh->bteh", src.astype(jnp.float32), experts_v,
            preferred_element_type=jnp.float32,
        )
        combine_v = _combine_weights(sel_v, wts_v, e)  # (b, t, h, E)
        v = jnp.einsum("bteh,btxe->btxh", vx, combine_v)  # x == heads
        v = v.astype(self.dtype)  # already (b, t, h, d)

        out = _dispatch_attention(
            q, k, v,
            scale=d ** -0.5,
            causal=causal,
            causal_mask=causal_mask,
            context_mask=context_mask,
            use_flash=None,
        )  # (b, t, h, d)

        # --- output MoE: per-head routed Linear(d_head -> dim), UNWEIGHTED ---
        wd = nn.Dense(h * e, use_bias=False, dtype=self.dtype, name="wd")(src)
        gate_o = rearrange(wd, "b t (h e) -> b t h e", h=h)
        _, sel_o = topk_gate(gate_o, self.sel_experts)
        experts_out = self.param(
            "experts_out",
            nn.initializers.lecun_normal(),
            (e, d, self.dim),
            jnp.float32,
        )
        # shared 'auto' cutover (+ impl validation): the dense combine's
        # (b,t,h,E,dim) intermediate is a 32x blow-up at ViTMoE's E=32
        impl = resolve_moe_impl(self.moe_impl, e)
        if impl == "scatter":
            y = moe_linear_scatter(
                out, experts_out, sel_o, None,
                capacity_factor=self.capacity_factor,
            ).astype(jnp.float32)  # (b, t, h, dim); head sum in fp32,
            # matching the dense branch's accumulation precision
        else:
            ox = jnp.einsum(
                "bthd,edD->btheD", out.astype(jnp.float32), experts_out,
                preferred_element_type=jnp.float32,
            )
            combine_o = _combine_weights(sel_o, None, e)  # (b, t, h, E)
            y = jnp.einsum("btheD,bthe->bthD", ox, combine_o)
        # sum over heads (reference: output.sum(dim=-2))
        return jnp.sum(y, axis=-2).astype(self.dtype)
