"""Blockwise flash attention for TPU (Pallas / Mosaic).

Online-softmax attention that never materializes the (tq, tk) score matrix in
HBM — the TPU-native replacement for the reference's naive einsum+softmax
(/root/reference/models/softmax_attention.py:62-76). Written blockwise from
day one so a ring/context-parallel mesh axis can be threaded through later
(SURVEY.md §5 "long-context").

Forward and backward are both Pallas kernels (FlashAttention-2 style): the
forward saves only (o, logsumexp) as residuals and the backward recomputes
P = exp(qk^T·scale − lse) blockwise inside the kernels — dq/dk/dv gradients
at O(t) memory, so training (not just inference) is flash-grade.

Supports self- and cross-attention with an optional causal mask. Keep-style
kv masks fall back to the XLA path at the dispatch layer (models/attention).
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634  # 1/ln(2)
LN2 = 0.6931471805599453


def _dot_precision(dtype):
    """In-kernel dot precision: bf16 operands take the MXU fast path; fp32
    operands get exact fp32 passes (the golden bit-match path runs the
    kernels in fp32). Pinned explicitly so the ambient
    jax_default_matmul_precision can't force an unsupported bf16+HIGHEST
    combination into Mosaic."""
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)



def _flash_kernel(
    q_ref,  # (1, block_q, d)
    k_ref,  # (1, tk, d)
    v_ref,  # (1, tk, d)
    o_ref,  # (1, block_q, d)
    lse_ref,  # (1, block_q, 1) — per-row logsumexp of scaled scores
    *,
    scale: float,
    causal: bool,
    block_k: int,
    tq: int,
    tk: int,
):
    block_q = q_ref.shape[1]
    d = q_ref.shape[-1]
    q_idx = pl.program_id(1)

    # Dots run on the INPUT dtype with fp32 accumulation — the MXU's native
    # mode. Casting bf16 operands up to fp32 before the dot would fall off
    # the fast path (fp32 matmuls cost multiple MXU passes).
    #
    # bf16 fast path: the softmax runs in the exp2 domain with scale·log2(e)
    # folded into q BEFORE the dot — that deletes the (bq, bk) score-scaling
    # multiply per block AND the hidden ×log2e inside every exp (TPU exp
    # lowers to exp2). At d_head 64 / t 1024 the forward is bound by these
    # VPU passes over the t² scores, not by MXU FLOPs (README perf notes),
    # so each deleted pass is direct step time. fp32 keeps the exact
    # score-domain formulation (the golden bit-match path).
    fast = q_ref.dtype != jnp.float32
    if fast:
        q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(
            q_ref.dtype
        )  # (bq, d) — 16-64x fewer elements than the (bq, bk) scores
    else:
        q = q_ref[0]  # (bq, d)

    num_k_blocks = pl.cdiv(tk, block_k)
    if causal:
        # rows of this q block attend to cols <= row + (tk - tq)
        max_col = (q_idx + 1) * block_q + (tk - tq)
        num_k_blocks = (jnp.minimum(max_col, tk) + block_k - 1) // block_k

    acc, m, l = _fwd_core(
        q, lambda kb: (k_ref[0, pl.ds(kb * block_k, block_k), :],
                    v_ref[0, pl.ds(kb * block_k, block_k), :]),
        num_k_blocks, fast=fast, causal=causal, scale=scale,
        block_q=block_q, block_k=block_k, q_idx=q_idx, tq=tq, tk=tk, d=d,
        dtype=q_ref.dtype,
    )
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    # the saved logsumexp is ALWAYS natural-log (the backward contract)
    if fast:
        lse_ref[0] = (m + jnp.log2(l)) * LN2  # (bq, 1)
    else:
        lse_ref[0] = m + jnp.log(l)  # (bq, 1)


def _fwd_core(
    q, load_kv, num_k_blocks, *, fast, causal, scale, block_q, block_k,
    q_idx, tq, tk, d, dtype,
):
    """Online-softmax loop over k/v blocks for ONE head's (bq, d) q block.
    Shared by the per-(b·h) kernels and the all-heads-per-program
    layout-native kernels."""
    exp_fn = jnp.exp2 if fast else jnp.exp

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k_blk, v_blk = load_kv(kb)
        s = jax.lax.dot_general(
            q, k_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(dtype),
        )  # (bq, bk) fp32 — log2-domain scores on the fast path
        if not fast:
            s = s * scale
        if causal:
            rows = q_idx * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            cols = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(cols > rows + (tk - tq), NEG_INF, s)

        m_cur = jnp.max(s, axis=-1, keepdims=True)  # (bq, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = exp_fn(s - m_new)  # (bq, bk) fp32, values in [0, 1]
        alpha = exp_fn(m_prev - m_new)  # (bq, 1)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(dtype),
        )
        return acc, m_new, l_new

    init = (
        jnp.zeros((block_q, d), jnp.float32),
        jnp.full((block_q, 1), NEG_INF, jnp.float32),
        jnp.zeros((block_q, 1), jnp.float32),
    )
    # Static trip counts (non-causal: cdiv of two Python ints) UNROLL in
    # Python: a lax.fori_loop is a scheduling barrier in Mosaic, so with
    # the loop in place every head's scores-matmul -> softmax -> PV chain
    # executes serialized, and the VPU softmax of head i can never overlap
    # the MXU matmuls of head i+1. Unrolled, the whole multi-head body is
    # one basic block and the scheduler hides VPU time under the MXU
    # (measured: 1.71 -> ~1.2 ms/layer on the ViTVQGAN recon forward at
    # b=64 t=1024 h=8 d=64, bq=512, single k-block). Causal trip counts
    # are traced (depend on program_id) and keep the loop.
    if isinstance(num_k_blocks, (int, np.integer)) and num_k_blocks <= 8:
        carry = init
        for kb in range(num_k_blocks):
            carry = body(kb, carry)
        return carry
    return jax.lax.fori_loop(0, num_k_blocks, body, init)


def _flash_kernel_mh(
    q_ref,  # (1, block_q, h*d)
    k_ref,  # (1, tk, h*d)
    v_ref,  # (1, tk, h*d)
    o_ref,  # (1, block_q, h*d)
    lse_ref,  # (1, block_q, h)
    *,
    h: int,
    scale: float,
    causal: bool,
    block_k: int,
    tq: int,
    tk: int,
):
    """All-heads-per-program forward on the LAYOUT-NATIVE (b, t, h·d) form —
    exactly the projections' memory layout, so no transpose copies exist
    anywhere. TPU tiling runs over the trailing (seq, h·d) dims; a static
    Python loop peels heads as aligned LANE slices (d-wide) in VMEM."""
    block_q = q_ref.shape[1]
    d = q_ref.shape[2] // h
    q_idx = pl.program_id(1)
    fast = q_ref.dtype != jnp.float32

    num_k_blocks = pl.cdiv(tk, block_k)
    if causal:
        max_col = (q_idx + 1) * block_q + (tk - tq)
        num_k_blocks = (jnp.minimum(max_col, tk) + block_k - 1) // block_k

    for hi in range(h):
        sl = slice(hi * d, (hi + 1) * d)
        q = q_ref[0, :, sl]
        if fast:
            q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
        acc, m, l = _fwd_core(
            q,
            lambda kb, sl=sl: (
                k_ref[0, pl.ds(kb * block_k, block_k), sl],
                v_ref[0, pl.ds(kb * block_k, block_k), sl],
            ),
            num_k_blocks, fast=fast, causal=causal, scale=scale,
            block_q=block_q, block_k=block_k, q_idx=q_idx, tq=tq, tk=tk,
            d=d, dtype=q_ref.dtype,
        )
        o_ref[0, :, sl] = (acc / l).astype(o_ref.dtype)
        if fast:
            lse_ref[0, :, hi:hi + 1] = (m + jnp.log2(l)) * LN2
        else:
            lse_ref[0, :, hi:hi + 1] = m + jnp.log(l)


def _flash_kernel_mh_kv(
    q_ref,  # (1, block_q, h*d)
    kv_ref,  # (1, tk, 2*h*d) — packed wkv projection output (k | v)
    o_ref,  # (1, block_q, h*d)
    lse_ref,  # (1, block_q, h)
    *,
    h: int,
    scale: float,
    causal: bool,
    block_k: int,
    tq: int,
    tk: int,
):
    """Packed-kv forward (see _flash_bwd_fused_kernel_mh_kv): k/v arrive as
    the fused projection's single (tk, 2·h·d) buffer and are peeled as VMEM
    lane slices — no strided k/v slice copies at the pallas boundary."""
    block_q = q_ref.shape[1]
    hd = q_ref.shape[2]
    d = hd // h
    q_idx = pl.program_id(1)
    fast = q_ref.dtype != jnp.float32

    num_k_blocks = pl.cdiv(tk, block_k)
    if causal:
        max_col = (q_idx + 1) * block_q + (tk - tq)
        num_k_blocks = (jnp.minimum(max_col, tk) + block_k - 1) // block_k

    # Scheduling note (r4 experiments, ViTVQGAN recon fwd b=64 t=1024 h=8
    # d=64, in-model device_duration): the per-head chain below measures
    # 1.712 ms/layer = EXACTLY the serial sum of its parts (MXU scores+PV
    # at the d=64 half-depth rate 1.39 ms + softmax VPU passes 0.33 ms).
    # A phase-separated emission (all heads' score matmuls, then all
    # softmaxes, then all PVs — maximal scheduler freedom to overlap VPU
    # with MXU) measured 21.3/12 = 1.78 ms/layer, i.e. WORSE: Mosaic
    # executes ops serially in emission order and the extra live (bq, tk)
    # fp32 score buffers only cost VMEM. The same held for the fused FFN
    # kernel (ops/ffn.py). Conclusion: these kernels sit AT the
    # serial-execution roofline; further gains need fewer VPU ops, not
    # reordering. See docs/ROADMAP.md r4 roofline.
    for hi in range(h):
        sl = slice(hi * d, (hi + 1) * d)
        q = q_ref[0, :, sl]
        if fast:
            q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q_ref.dtype)
        acc, m, l = _fwd_core(
            q,
            lambda kb, hi=hi: (
                kv_ref[0, pl.ds(kb * block_k, block_k),
                       hi * d:(hi + 1) * d],
                kv_ref[0, pl.ds(kb * block_k, block_k),
                       hd + hi * d:hd + (hi + 1) * d],
            ),
            num_k_blocks, fast=fast, causal=causal, scale=scale,
            block_q=block_q, block_k=block_k, q_idx=q_idx, tq=tq, tk=tk,
            d=d, dtype=q_ref.dtype,
        )
        o_ref[0, :, sl] = (acc / l).astype(o_ref.dtype)
        if fast:
            lse_ref[0, :, hi:hi + 1] = (m + jnp.log2(l)) * LN2
        else:
            lse_ref[0, :, hi:hi + 1] = m + jnp.log(l)


def _pick_block(t: int, pref: int) -> int:
    """Largest block size <= pref that divides t (blocks must tile exactly so
    no softmax column reads padding garbage)."""
    for cand in (pref, 512, 256, 128, 64, 32, 16, 8):
        if cand <= pref and t % cand == 0:
            return cand
    raise ValueError(f"sequence length {t} has no supported block tiling")


def _flash_forward(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    *, scale: float, causal: bool, block_q: int, block_k: int,
    interpret: bool = False,
):
    """Returns (out (b,h,tq,d), lse (b,h,tq) fp32)."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    bq = _pick_block(tq, block_q)
    bk = _pick_block(tk, block_k)

    qf = q.reshape(b * h, tq, d)
    kf = k.reshape(b * h, tk, d)
    vf = v.reshape(b * h, tk, d)

    grid = (b * h, pl.cdiv(tq, bq))
    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, block_k=bk, tq=tq, tk=tk
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # trailing dim 1 == array dim satisfies the (8, 128) tiling rule
            pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, tq, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tk * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, tq, d), lse.reshape(b, h, tq)



def _flash_bwd_dkv_kernel(
    q_ref,  # (1, tq, d)
    do_ref,  # (1, tq, d)
    lse_ref,  # (1, tq, 1)
    delta_ref,  # (1, tq, 1)
    k_ref,  # (1, block_k, d)
    v_ref,  # (1, block_k, d)
    dk_ref,  # (1, block_k, d)
    dv_ref,  # (1, block_k, d)
    *,
    scale: float,
    causal: bool,
    block_q: int,
    tq: int,
    tk: int,
):
    """One k/v block per program; stream q blocks and accumulate dk, dv.

    FlashAttention-2 backward: P is recomputed from (q, k, lse) blockwise,
    dV += P^T dO, dS = P∘(dO V^T − Δ), dK += dS^T (q·scale)."""
    block_k = k_ref.shape[1]
    d = k_ref.shape[-1]
    k_idx = pl.program_id(1)
    kT = jnp.transpose(k_ref[0])  # (d, bk), native dtype for MXU dots
    v_blk = v_ref[0]  # (bk, d)
    # bf16 fast path: exp2-domain recompute of P (see _flash_kernel); the
    # score multiply constant absorbs log2e and lse (natural log, per the
    # residual contract) converts on the cheap (bq, 1) side.
    fast = q_ref.dtype != jnp.float32
    s_scale = scale * LOG2E if fast else scale

    num_q_blocks = pl.cdiv(tq, block_q)
    q_start = 0
    if causal:
        # cols of this k block are visible only to rows >= col - (tk - tq);
        # q blocks entirely before that contribute nothing.
        first_row = k_idx * block_k - (tk - tq)
        q_start = jnp.maximum(first_row, 0) // block_q

    dk, dv = _bwd_dkv_core(
        kT, v_blk,
        lambda qb: (q_ref[0, pl.ds(qb * block_q, block_q), :],
                    do_ref[0, pl.ds(qb * block_q, block_q), :],
                    lse_ref[0, pl.ds(qb * block_q, block_q), :],
                    delta_ref[0, pl.ds(qb * block_q, block_q), :]),
        q_start, num_q_blocks,
        fast=fast, causal=causal, scale=scale, s_scale=s_scale,
        block_q=block_q, block_k=block_k, k_idx=k_idx, tq=tq, tk=tk, d=d,
        dtype=q_ref.dtype,
    )
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd_dkv_core(
    kT, v_blk, load_q, q_start, num_q_blocks, *,
    fast, causal, scale, s_scale, block_q, block_k, k_idx, tq, tk, d, dtype,
):
    exp_fn = jnp.exp2 if fast else jnp.exp

    def body(qb, carry):
        dk_acc, dv_acc = carry
        q_blk, do_blk, lse_blk, delta_blk = load_q(qb)

        s = jax.lax.dot_general(
            q_blk, kT,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(dtype),
        ) * s_scale  # (bq, bk) fp32
        p = exp_fn(s - (lse_blk * LOG2E if fast else lse_blk))
        if causal:
            rows = qb * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            cols = k_idx * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            p = jnp.where(cols > rows + (tk - tq), 0.0, p)

        # dV += P^T dO
        dv_acc = dv_acc + jax.lax.dot_general(
            p.astype(do_blk.dtype), do_blk,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(dtype),
        )
        # dP = dO V^T ; dS = P * (dP - delta)
        dp = jax.lax.dot_general(
            do_blk, v_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(dtype),
        )
        ds = p * (dp - delta_blk)
        # dK += scale * dS^T q
        dk_acc = dk_acc + jax.lax.dot_general(
            ds.astype(q_blk.dtype), q_blk,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(dtype),
        ) * scale
        return dk_acc, dv_acc

    init = (
        jnp.zeros((block_k, d), jnp.float32),
        jnp.zeros((block_k, d), jnp.float32),
    )
    return jax.lax.fori_loop(q_start, num_q_blocks, body, init)


def _flash_bwd_fused_kernel_mh(
    q_ref,  # (1, tq, h*d) — full, resident
    do_ref,  # (1, tq, h*d) — full, resident
    lse_ref,  # (1, tq, h) — full
    delta_ref,  # (1, tq, h) — full
    k_ref,  # (1, block_k, h*d)
    v_ref,  # (1, block_k, h*d)
    dq_ref,  # (1, tq, h*d) fp32 — REVISITED across k-block grid steps
    dk_ref,  # (1, block_k, h*d)
    dv_ref,  # (1, block_k, h*d)
    *,
    h: int,
    scale: float,
    causal: bool,
    block_q: int,
    tq: int,
    tk: int,
):
    """Single-pass layout-native backward: one program per k/v block streams
    q blocks, recomputes P ONCE, and emits all three grads — dk/dv into this
    block's outputs, dq accumulated into a full-(tq, h·d) fp32 output block
    that stays resident in VMEM across the k grid steps (its index map
    ignores the k axis, so Pallas keeps and accumulates it, writing back on
    the last revisit). The split dq/dkv pair recomputed the (bq, bk) score
    softmax twice per block pair — on v5e at d=64/t=1024 the backward is
    bound by exactly those VPU passes, so fusing them is a direct win
    (same-process A/B at b=8 h=12 t=1024 d=64 bf16: fwd+bwd 4.16 -> 3.35 ms,
    ~20%, with dq/dk/dv bit-identical to the split pair)."""
    d = k_ref.shape[2] // h

    def load_kv(hi):
        sl = slice(hi * d, (hi + 1) * d)
        return k_ref[0, :, sl], v_ref[0, :, sl]

    def store_dkv(hi, dk, dv):
        sl = slice(hi * d, (hi + 1) * d)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)

    _bwd_fused_body(
        q_ref, do_ref, lse_ref, delta_ref, dq_ref, load_kv, store_dkv,
        h=h, d=d, block_k=k_ref.shape[1], scale=scale, causal=causal,
        block_q=block_q, tq=tq, tk=tk,
    )


def _flash_bwd_fused_kernel_mh_kv(
    q_ref,  # (1, tq, h*d) — full, resident
    do_ref,  # (1, tq, h*d)
    lse_ref,  # (1, tq, h)
    delta_ref,  # (1, tq, h)
    kv_ref,  # (1, block_k, 2*h*d) — packed wkv projection output (k | v)
    dq_ref,  # (1, tq, h*d) fp32 — revisited across k grid steps
    dkv_ref,  # (1, block_k, 2*h*d) — packed (dk | dv)
    *,
    h: int,
    scale: float,
    causal: bool,
    block_q: int,
    tq: int,
    tk: int,
):
    """Packed-kv fused backward: k/v come in as ONE operand — the fused wkv
    projection's own (b, tk, 2·h·d) output, k head-slices in the first h·d
    lanes, v in the second — and dk/dv leave as one packed cotangent. The
    separate-k/v entry point forces XLA to materialize strided slices of
    that projection (and re-concatenate the grads): ~0.05 ms × 2 copies per
    layer at the recon shape. Packing moves the split into VMEM lane slices
    the kernel already does for heads."""
    hd = q_ref.shape[2]
    d = hd // h

    def load_kv(hi):
        return (kv_ref[0, :, hi * d:(hi + 1) * d],
                kv_ref[0, :, hd + hi * d:hd + (hi + 1) * d])

    def store_dkv(hi, dk, dv):
        dkv_ref[0, :, hi * d:(hi + 1) * d] = dk.astype(dkv_ref.dtype)
        dkv_ref[0, :, hd + hi * d:hd + (hi + 1) * d] = dv.astype(
            dkv_ref.dtype)

    _bwd_fused_body(
        q_ref, do_ref, lse_ref, delta_ref, dq_ref, load_kv, store_dkv,
        h=h, d=d, block_k=kv_ref.shape[1], scale=scale, causal=causal,
        block_q=block_q, tq=tq, tk=tk,
    )


def _bwd_fused_body(
    q_ref, do_ref, lse_ref, delta_ref, dq_ref, load_kv, store_dkv,
    *, h, d, block_k, scale, causal, block_q, tq, tk,
):
    k_idx = pl.program_id(1)
    fast = q_ref.dtype != jnp.float32
    s_scale = scale * LOG2E if fast else scale
    exp_fn = jnp.exp2 if fast else jnp.exp

    @pl.when(k_idx == 0)
    def _():
        dq_ref[:] = jnp.zeros_like(dq_ref)

    num_q_blocks = pl.cdiv(tq, block_q)
    q_start = 0
    if causal:
        first_row = k_idx * block_k - (tk - tq)
        q_start = jnp.maximum(first_row, 0) // block_q

    for hi in range(h):
        sl = slice(hi * d, (hi + 1) * d)
        k_blk, v_blk = load_kv(hi)  # (bk, d) each
        kT = jnp.transpose(k_blk)  # (d, bk)

        def body(qb, carry, sl=sl, hi=hi, kT=kT, k_blk=k_blk, v_blk=v_blk):
            dk_acc, dv_acc = carry
            rows = pl.ds(qb * block_q, block_q)
            q_blk = q_ref[0, rows, sl]
            do_blk = do_ref[0, rows, sl]
            lse_blk = lse_ref[0, rows, hi:hi + 1]
            delta_blk = delta_ref[0, rows, hi:hi + 1]

            s = jax.lax.dot_general(
                q_blk, kT,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_dot_precision(q_blk.dtype),
            ) * s_scale  # (bq, bk) fp32
            p = exp_fn(s - (lse_blk * LOG2E if fast else lse_blk))
            if causal:
                r_io = qb * block_q + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0
                )
                c_io = k_idx * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1
                )
                p = jnp.where(c_io > r_io + (tk - tq), 0.0, p)

            # dV += P^T dO
            dv_acc = dv_acc + jax.lax.dot_general(
                p.astype(do_blk.dtype), do_blk,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_dot_precision(q_blk.dtype),
            )
            # dP = dO V^T ; dS = P∘(dP − Δ)
            dp = jax.lax.dot_general(
                do_blk, v_blk,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_dot_precision(q_blk.dtype),
            )
            ds = (p * (dp - delta_blk)).astype(q_blk.dtype)
            # dK += dS^T q · scale
            dk_acc = dk_acc + jax.lax.dot_general(
                ds, q_blk,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_dot_precision(q_blk.dtype),
            ) * scale
            # dQ[rows] += dS K · scale  (fp32 accumulation in the resident
            # output block — correct across both the head loop and k steps)
            dq_c = jax.lax.dot_general(
                ds, k_blk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_dot_precision(q_blk.dtype),
            ) * scale
            dq_ref[0, rows, sl] = dq_ref[0, rows, sl] + dq_c
            return dk_acc, dv_acc

        dk, dv = jax.lax.fori_loop(
            q_start, num_q_blocks, body,
            (jnp.zeros((block_k, d), jnp.float32),
             jnp.zeros((block_k, d), jnp.float32)),
        )
        store_dkv(hi, dk, dv)


def _flash_bwd_dq_kernel(
    k_ref,  # (1, tk, d)
    v_ref,  # (1, tk, d)
    q_ref,  # (1, block_q, d)
    do_ref,  # (1, block_q, d)
    lse_ref,  # (1, block_q, 1)
    delta_ref,  # (1, block_q, 1)
    dq_ref,  # (1, block_q, d)
    *,
    scale: float,
    causal: bool,
    block_k: int,
    tq: int,
    tk: int,
):
    """One q block per program; stream k blocks and accumulate dq:
    dQ += dS K · scale with dS = P∘(dO V^T − Δ)."""
    block_q = q_ref.shape[1]
    d = q_ref.shape[-1]
    q_idx = pl.program_id(1)

    q_blk = q_ref[0]  # native dtype for MXU dots; scale on the scores
    do_blk = do_ref[0]
    lse_blk = lse_ref[0]  # (bq, 1)
    delta_blk = delta_ref[0]  # (bq, 1)
    # bf16 fast path: exp2-domain P recompute (see _flash_bwd_dkv_kernel);
    # the lse -> log2 conversion happens inside _bwd_dq_core.
    fast = q_ref.dtype != jnp.float32
    s_scale = scale * LOG2E if fast else scale

    num_k_blocks = pl.cdiv(tk, block_k)
    if causal:
        max_col = (q_idx + 1) * block_q + (tk - tq)
        num_k_blocks = (jnp.minimum(max_col, tk) + block_k - 1) // block_k

    dq = _bwd_dq_core(
        q_blk, do_blk, lse_blk, delta_blk,
        lambda kb: (k_ref[0, pl.ds(kb * block_k, block_k), :],
                    v_ref[0, pl.ds(kb * block_k, block_k), :]),
        num_k_blocks,
        fast=fast, s_scale=s_scale, causal=causal,
        block_q=block_q, block_k=block_k, q_idx=q_idx, tq=tq, tk=tk, d=d,
        dtype=q_ref.dtype,
    )
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dq_core(
    q_blk, do_blk, lse_blk, delta_blk, load_kv, num_k_blocks, *,
    fast, s_scale, causal, block_q, block_k, q_idx, tq, tk, d, dtype,
):
    exp_fn = jnp.exp2 if fast else jnp.exp
    if fast:
        lse_blk = lse_blk * LOG2E

    def body(kb, dq_acc):
        k_blk, v_blk = load_kv(kb)
        s = jax.lax.dot_general(
            q_blk, k_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(dtype),
        ) * s_scale  # (bq, bk) fp32
        p = exp_fn(s - lse_blk)
        if causal:
            rows = q_idx * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            cols = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            p = jnp.where(cols > rows + (tk - tq), 0.0, p)
        dp = jax.lax.dot_general(
            do_blk, v_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(dtype),
        )
        ds = p * (dp - delta_blk)
        return dq_acc + jax.lax.dot_general(
            ds.astype(k_blk.dtype), k_blk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(dtype),
        )

    return jax.lax.fori_loop(
        0, num_k_blocks, body, jnp.zeros((block_q, d), jnp.float32)
    )


def flash_bwd_dkv(
    q, g, lse, delta, k, v,
    *, scale: float, causal: bool, block_q: int, block_k: int,
    interpret: bool = False,
):
    """Partial gradients dk, dv of flash attention for the given k/v chunk,
    using the GLOBAL logsumexp ``lse`` and ``delta = rowsum(dO·O)`` — so it is
    reusable per-chunk by the ring/context-parallel backward (the global lse
    makes each chunk's recomputed P the true global softmax slice)."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    # backward keeps three (bq, bk) fp32 intermediates (p, dp, ds) live per
    # block pair — cap blocks at 512 so the kernel stack fits in VMEM
    bq = _pick_block(tq, min(block_q, 512))
    bk = _pick_block(tk, min(block_k, 512))

    qf = q.reshape(b * h, tq, d)
    kf = k.reshape(b * h, tk, d)
    vf = v.reshape(b * h, tk, d)
    dof = g.reshape(b * h, tq, d)
    lsef = lse.reshape(b * h, tq, 1)
    delta = delta.reshape(b * h, tq, 1)

    dkv_kernel = functools.partial(
        _flash_bwd_dkv_kernel, scale=scale, causal=causal, block_q=bq,
        tq=tq, tk=tk,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(b * h, pl.cdiv(tk, bk)),
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, tk, d), k.dtype),
            jax.ShapeDtypeStruct((b * h, tk, d), v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * tq * tk * d,
            bytes_accessed=2 * (qf.size + kf.size + vf.size) * 4,
            transcendentals=b * h * tq * tk,
        ),
        interpret=interpret,
    )(qf, dof, lsef, delta, kf, vf)
    return dk.reshape(b, h, tk, d), dv.reshape(b, h, tk, d)


def flash_bwd_dq(
    k, v, q, g, lse, delta,
    *, scale: float, causal: bool, block_q: int, block_k: int,
    interpret: bool = False,
):
    """Partial gradient dq of flash attention against the given k/v chunk,
    using the GLOBAL ``lse``/``delta`` (see flash_bwd_dkv)."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    bq = _pick_block(tq, min(block_q, 512))
    bk = _pick_block(tk, min(block_k, 512))

    qf = q.reshape(b * h, tq, d)
    kf = k.reshape(b * h, tk, d)
    vf = v.reshape(b * h, tk, d)
    dof = g.reshape(b * h, tq, d)
    lsef = lse.reshape(b * h, tq, 1)
    delta = delta.reshape(b * h, tq, 1)

    dq_kernel = functools.partial(
        _flash_bwd_dq_kernel, scale=scale, causal=causal, block_k=bk,
        tq=tq, tk=tk,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b * h, pl.cdiv(tq, bq)),
        in_specs=[
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tk * d,
            bytes_accessed=2 * (qf.size + kf.size + vf.size) * 4,
            transcendentals=b * h * tq * tk,
        ),
        interpret=interpret,
    )(kf, vf, qf, dof, lsef, delta)
    return dq.reshape(b, h, tq, d)


def flash_delta(o, g):
    """delta_i = rowsum(dO_i * O_i) — cheap elementwise, let XLA fuse it."""
    return jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)


def _flash_backward(
    q, k, v, o, lse, g,
    *, scale: float, causal: bool, block_q: int, block_k: int,
    interpret: bool = False,
):
    delta = flash_delta(o, g)
    dk, dv = flash_bwd_dkv(
        q, g, lse, delta, k, v, scale=scale, causal=causal,
        block_q=block_q, block_k=block_k, interpret=interpret,
    )
    dq = flash_bwd_dq(
        k, v, q, g, lse, delta, scale=scale, causal=causal,
        block_q=block_q, block_k=block_k, interpret=interpret,
    )
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _flash(causal, scale, block_q, block_k, interpret, q, k, v):
    out, _ = _flash_forward(
        q, k, v, scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        interpret=interpret,
    )
    return out


def _flash_fwd(causal, scale, block_q, block_k, interpret, q, k, v):
    out, lse = _flash_forward(
        q, k, v, scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        interpret=interpret,
    )
    return out, (q, k, v, out, lse)


def _flash_bwd(causal, scale, block_q, block_k, interpret, res, g):
    q, k, v, o, lse = res
    return _flash_backward(
        q, k, v, o, lse, g,
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        interpret=interpret,
    )


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float | None = None,
    causal: bool = False,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention over (b, h, t, d) tensors. Differentiable.

    Default blocks (512, 1024) measured fastest at the t=1024 d=64 recon
    shape on v5e (0.82 ms vs 0.90-1.05 for 1024x1024/256x1024 at b8 h8):
    two q blocks per (b·h) program let the grid pipeline DMA against the
    VPU-bound softmax."""
    if causal:
        _check_causal_lengths(q.shape[2], k.shape[2])
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    return _flash(causal, scale, block_q, block_k, interpret, q, k, v)


def _check_causal_lengths(tq: int, tk: int) -> None:
    """The causal mask is bottom-right aligned (cols <= row + tk - tq, same
    as ops.attention.make_causal_mask). With tq > tk the first tq - tk query
    rows see ZERO keys, so the online softmax divides 0/0 and emits NaN
    silently. No model hits this (causal is self-attention or tq=1 decode);
    fail loudly at trace time rather than NaN at run time."""
    if tq > tk:
        raise ValueError(
            f"causal flash attention requires tq <= tk (got tq={tq}, "
            f"tk={tk}): rows before tq-tk have no visible keys under the "
            f"bottom-right-aligned mask. Use the XLA path with an explicit "
            f"mask for that shape."
        )


def flash_supported(
    q_shape: tuple, k_shape: tuple, platform: str | None = None,
    itemsize: int = 2,
) -> bool:
    """Dispatch predicate: Pallas TPU kernels only on TPU-like backends; seq
    lens must be >= 2 sublanes to be worth the call, must tile into the
    blocks _pick_block accepts (multiple of 8) — e.g. ViT's 257 tokens
    (image 256 / patch 16 + class token) — AND must fit the kernels' VMEM
    block budget in both the forward (full k/v resident) and backward (full
    q/do resident in the dkv program) role assignments. Any of these failing
    would raise at trace time instead of falling back to the XLA path."""
    from attention_models_tpu.ops.dispatch import on_tpu

    if not on_tpu(platform):
        return False
    b, h, tq, d = q_shape
    tk = k_shape[2]
    if tq < 128 or tk < 128 or tq % 8 or tk % 8:
        return False
    try:  # same probes the kernels run (fwd + bwd swap tq/tk roles)
        _mh_pick_blocks(tq, tk, h, d, 512, 1024, itemsize)
        _mh_pick_blocks(tk, tq, h, d, 1024, 512, itemsize)
        return True
    except ValueError:
        return False


def flash_attention_sharded(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh,
    *,
    scale: float | None = None,
    causal: bool = False,
    data_axis: str = "data",
    model_axis: str = "model",
    block_q: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention under a (data, model) mesh: batch sharded over the
    data axis, HEADS sharded over the model axis — the tensor-parallel layout
    produced by the sharded QKV projections. shard_map runs the Pallas kernel
    on each shard's local heads; no cross-shard communication is needed
    because heads are independent.

    Requires b % data_axis == 0 and h % model_axis == 0 (the dispatch layer
    checks and falls back to the XLA path otherwise)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    from jax.sharding import PartitionSpec as P

    spec = P(data_axis, model_axis, None, None)
    fn = jax.shard_map(
        functools.partial(
            flash_attention, scale=scale, causal=causal,
            block_q=block_q, block_k=block_k, interpret=interpret,
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


# --------------------------------------------------------------------------- #
# Layout-native (b, t, h, d) entry points.
#
# The attention projections produce (b, t, h*d); reshaping that to the
# (b, h, t, d) the classic wrappers take is a real transpose, and because
# pallas_call pins default layouts XLA materializes it as 16MB copies per
# k/v per layer (measured 9.6% of the ViTVQGAN recon step, plus matching
# copies on the output side). These wrappers instead index one head per
# program straight out of the (b, t, h, d) view with strided BlockSpecs —
# no transpose exists anywhere in the program.
# --------------------------------------------------------------------------- #


def _flash_forward_bthd(
    q, k, v, *, scale, causal, block_q, block_k, interpret=False,
):
    """q, k, v: (b, t, h, d). Returns (out (b,tq,h,d), lse (b,tq,h) f32).
    Blocks span ALL heads (TPU tiling runs over the trailing (h, d) dims, so
    per-head HBM blocks are illegal); the kernel peels heads in VMEM. The
    per-head softmax transients bound VMEM, so block_q is capped to keep
    bq*tk fp32 + whole-heads q/k/v blocks under the ~16MB budget."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    bq, bk = _mh_pick_blocks(tq, tk, h, d, block_q, block_k,
                             q.dtype.itemsize)
    qf = q.reshape(b, tq, h * d)  # pure relabel, no data movement
    kf = k.reshape(b, tk, h * d)
    vf = v.reshape(b, tk, h * d)
    q_spec = pl.BlockSpec((1, bq, h * d), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, tk, h * d), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, bq, h), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _flash_kernel_mh, h=h, scale=scale, causal=causal, block_k=bk,
        tq=tq, tk=tk,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, pl.cdiv(tq, bq)),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=[q_spec, lse_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, tq, h * d), q.dtype),
            jax.ShapeDtypeStruct((b, tq, h), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, tq, h, d), lse


def _mh_pick_blocks(tq, tk, h, d, pref_bq, pref_bk, itemsize=2):
    """(bq, bk) for the all-heads-per-program kernels, sized so the scoped
    VMEM stack fits: double-buffered q/o blocks and FULL k/v blocks (the
    k-loop slices them in VMEM) plus the per-head fp32 softmax transients
    must stay under the ~16MB limit (14MB budget for Mosaic's own slack)."""
    hd = h * d
    limit = 14 * 1024 * 1024
    for bkp in (pref_bk, 512, 256, 128):
        if bkp > pref_bk:
            continue
        bk = _pick_block(tk, bkp)
        for bqp in (pref_bq, 512, 256, 128, 64, 32, 16, 8):
            if bqp > pref_bq:
                continue
            bq = _pick_block(tq, bqp)
            used = (
                2 * bq * hd * itemsize          # q block, double-buffered
                + 2 * 2 * tk * hd * itemsize    # full k+v, double-buffered
                + 2 * (bq * hd * itemsize + bq * h * 4)  # o + lse out
                + 2 * bq * bk * 4               # s + p fp32 transients
                + bq * bk * itemsize            # p cast for the pv dot
                + bq * d * 4                    # fp32 accumulator
            )
            if used <= limit:
                return bq, bk
    raise ValueError(
        f"no VMEM-fitting blocks for mh flash at tq={tq} tk={tk} h={h} d={d}"
    )


def _flash_backward_bthd(
    q, k, v, o, lse, g,
    *, scale, causal, block_q, block_k, interpret=False,
):
    b, tq, h, d = q.shape
    tk = k.shape[1]
    # whole-heads q/do/lse/delta stay resident in the dkv program, plus the
    # per-head softmax transients: cap both blocks accordingly (the dkv
    # program streams FULL q/do, so swap tq/tk roles in the budget)
    # prefs go through un-clamped: _mh_pick_blocks enforces the VMEM
    # budget itself, and the backward amortizes its VPU passes better at
    # the forward's big tiles (bq 256 -> 512 measured ~23% off fwd+bwd)
    bq, _ = _mh_pick_blocks(tq, tk, h, d, block_q, block_k,
                            q.dtype.itemsize)
    bk, _ = _mh_pick_blocks(tk, tq, h, d, block_k, block_q,
                            q.dtype.itemsize)
    delta = flash_delta(o, g)  # (b, tq, h)

    qf = q.reshape(b, tq, h * d)
    kf = k.reshape(b, tk, h * d)
    vf = v.reshape(b, tk, h * d)
    gf = g.reshape(b, tq, h * d)

    q_full = pl.BlockSpec((1, tq, h * d), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    r_full = pl.BlockSpec((1, tq, h), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_blk = pl.BlockSpec((1, bk, h * d), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)

    fused_kernel = functools.partial(
        _flash_bwd_fused_kernel_mh, h=h, scale=scale, causal=causal,
        block_q=bq, tq=tq, tk=tk,
    )
    dq, dk, dv = pl.pallas_call(
        fused_kernel,
        grid=(b, pl.cdiv(tk, bk)),
        in_specs=[q_full, q_full, r_full, r_full, kv_blk, kv_blk],
        out_specs=[q_full, kv_blk, kv_blk],
        out_shape=[
            # dq accumulates across k grid steps -> fp32; cast at the seam
            jax.ShapeDtypeStruct((b, tq, h * d), jnp.float32),
            jax.ShapeDtypeStruct((b, tk, h * d), k.dtype),
            jax.ShapeDtypeStruct((b, tk, h * d), v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * tq * tk * d,
            bytes_accessed=2 * (q.size + k.size + v.size) * 4,
            transcendentals=b * h * tq * tk,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qf, gf, lse, delta, kf, vf)
    return (
        dq.astype(q.dtype).reshape(b, tq, h, d),
        dk.reshape(b, tk, h, d),
        dv.reshape(b, tk, h, d),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _flash_bthd(causal, scale, block_q, block_k, interpret, q, k, v):
    out, _ = _flash_forward_bthd(
        q, k, v, scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        interpret=interpret,
    )
    return out


def _flash_bthd_fwd(causal, scale, block_q, block_k, interpret, q, k, v):
    out, lse = _flash_forward_bthd(
        q, k, v, scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        interpret=interpret,
    )
    return out, (q, k, v, out, lse)


def _flash_bthd_bwd(causal, scale, block_q, block_k, interpret, res, g):
    """Backward stays layout-native too: the all-heads-per-program kernels
    at (256, 256) blocks measured 1.78 ms fwd+bwd at the recon shape vs
    3.03 ms for transpose-to-classic-kernels (the (b,h,t,d) transposes at
    d=64 run at a fraction of HBM bandwidth — exactly the copies this
    layout exists to avoid)."""
    q, k, v, o, lse = res
    return _flash_backward_bthd(
        q, k, v, o, lse, g,
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        interpret=interpret,
    )


_flash_bthd.defvjp(_flash_bthd_fwd, _flash_bthd_bwd)


def flash_attention_bthd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float | None = None,
    causal: bool = False,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention over (b, t, h, d) tensors — the projections' natural
    layout, so no transpose copies at the kernel boundary. Differentiable."""
    if causal:
        _check_causal_lengths(q.shape[1], k.shape[1])
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    return _flash_bthd(causal, scale, block_q, block_k, interpret, q, k, v)


def _flash_forward_bthd_kv(
    q, kv, *, scale, causal, block_q, block_k, interpret=False,
):
    """q: (b, tq, h, d); kv: (b, tk, 2, h, d) — a pure relabel of the fused
    wkv projection's (b, tk, 2·h·d) output. Returns (out, lse)."""
    b, tq, h, d = q.shape
    tk = kv.shape[1]
    bq, bk = _mh_pick_blocks(tq, tk, h, d, block_q, block_k,
                             q.dtype.itemsize)
    qf = q.reshape(b, tq, h * d)
    kvf = kv.reshape(b, tk, 2 * h * d)
    q_spec = pl.BlockSpec((1, bq, h * d), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, tk, 2 * h * d), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    lse_spec = pl.BlockSpec((1, bq, h), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _flash_kernel_mh_kv, h=h, scale=scale, causal=causal, block_k=bk,
        tq=tq, tk=tk,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, pl.cdiv(tq, bq)),
        in_specs=[q_spec, kv_spec],
        out_specs=[q_spec, lse_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, tq, h * d), q.dtype),
            jax.ShapeDtypeStruct((b, tq, h), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tk * d,
            bytes_accessed=(q.size + kv.size) * q.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qf, kvf)
    return out.reshape(b, tq, h, d), lse


def _flash_backward_bthd_kv(
    q, kv, o, lse, g, *, scale, causal, block_q, block_k, interpret=False,
):
    b, tq, h, d = q.shape
    tk = kv.shape[1]
    # prefs go through un-clamped: _mh_pick_blocks enforces the VMEM
    # budget itself, and the backward amortizes its VPU passes better at
    # the forward's big tiles (bq 256 -> 512 measured ~23% off fwd+bwd)
    bq, _ = _mh_pick_blocks(tq, tk, h, d, block_q, block_k,
                            q.dtype.itemsize)
    bk, _ = _mh_pick_blocks(tk, tq, h, d, block_k, block_q,
                            q.dtype.itemsize)
    delta = flash_delta(o, g)  # (b, tq, h)
    qf = q.reshape(b, tq, h * d)
    kvf = kv.reshape(b, tk, 2 * h * d)
    gf = g.reshape(b, tq, h * d)

    q_full = pl.BlockSpec((1, tq, h * d), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    r_full = pl.BlockSpec((1, tq, h), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    kv_blk = pl.BlockSpec((1, bk, 2 * h * d), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    fused_kernel = functools.partial(
        _flash_bwd_fused_kernel_mh_kv, h=h, scale=scale, causal=causal,
        block_q=bq, tq=tq, tk=tk,
    )
    dq, dkv = pl.pallas_call(
        fused_kernel,
        grid=(b, pl.cdiv(tk, bk)),
        in_specs=[q_full, q_full, r_full, r_full, kv_blk],
        out_specs=[q_full, kv_blk],
        out_shape=[
            jax.ShapeDtypeStruct((b, tq, h * d), jnp.float32),
            jax.ShapeDtypeStruct((b, tk, 2 * h * d), kv.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * tq * tk * d,
            bytes_accessed=2 * (q.size + kv.size) * 4,
            transcendentals=b * h * tq * tk,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qf, gf, lse, delta, kvf)
    return (
        dq.astype(q.dtype).reshape(b, tq, h, d),
        dkv.reshape(b, tk, 2, h, d),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def _flash_bthd_kv(causal, scale, block_q, block_k, interpret, q, kv):
    out, _ = _flash_forward_bthd_kv(
        q, kv, scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        interpret=interpret,
    )
    return out


def _flash_bthd_kv_fwd(causal, scale, block_q, block_k, interpret, q, kv):
    out, lse = _flash_forward_bthd_kv(
        q, kv, scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        interpret=interpret,
    )
    return out, (q, kv, out, lse)


def _flash_bthd_kv_bwd(causal, scale, block_q, block_k, interpret, res, g):
    q, kv, o, lse = res
    return _flash_backward_bthd_kv(
        q, kv, o, lse, g,
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        interpret=interpret,
    )


_flash_bthd_kv.defvjp(_flash_bthd_kv_fwd, _flash_bthd_kv_bwd)


def flash_attention_bthd_kv(
    q: jnp.ndarray,
    kv: jnp.ndarray,
    *,
    scale: float | None = None,
    causal: bool = False,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention taking the fused wkv projection output UNSLICED:
    q is (b, tq, h, d), kv is (b, tk, 2, h, d) with kv[:, :, 0] = k and
    kv[:, :, 1] = v. Splitting k/v outside the kernel forces XLA to
    materialize strided slices of the projection output (and to
    re-concatenate the cotangents in backward) — real HBM copies at every
    layer; this entry point moves the split into VMEM lane slices.
    Differentiable (packed single-pass backward)."""
    if causal:
        _check_causal_lengths(q.shape[1], kv.shape[1])
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    return _flash_bthd_kv(causal, scale, block_q, block_k, interpret, q, kv)


def flash_attention_sharded_bthd(
    q, k, v, mesh, *,
    scale=None, causal=False, data_axis="data", model_axis="model",
    block_q: int = 512, block_k: int = 1024, interpret: bool = False,
):
    """(b, t, h, d) tensor-parallel variant: batch over data, HEADS (dim 2)
    over model; the kernel runs on each shard's local heads."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    from jax.sharding import PartitionSpec as P

    spec = P(data_axis, None, model_axis, None)
    fn = jax.shard_map(
        functools.partial(
            flash_attention_bthd, scale=scale, causal=causal,
            block_q=block_q, block_k=block_k, interpret=interpret,
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
