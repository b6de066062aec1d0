"""Fused classifier-head + softmax cross-entropy (Pallas).

The generator losses (MUSE muse.py:230-234-equivalent training loss,
MaskGIT maskgit.py:119-124, Parti parti.py:76-83 in the reference) all end
with ``logits = Dense(vocab)(h)`` followed by masked cross-entropy. At
Muse's training shape (16k tokens x 8192 vocab) the logits tensor is 268 MB
in fp32 — materialized, converted, soft-maxed, and re-read by the backward
for ~4-5 GB of HBM traffic per step on a step that is HBM-roofline-bound.

Here the head matmul and the row-wise log-sum-exp fuse into one Pallas pass:
a row tile of h enters VMEM, the (d, V) head weight stays RESIDENT across
the grid, the (bn, V) logits tile lives only in VMEM, and only per-row
nll/lse (n, 1) leave. The backward recomputes the logits tile from (h, w,
lse) and forms dlogits = (softmax - onehot)·coef in VMEM — dh streams out
per tile, dW accumulates in a revisited fp32 VMEM block (same pattern as
ops/ffn.py's dW accumulators).

Numerics: the matmul accumulates in fp32 and is then rounded to the tower
dtype (matching what nn.Dense(dtype=bf16) emits) before the fp32 softmax,
so the fused loss tracks the unfused formulation at bf16 resolution; in
fp32 towers the rounding is a no-op and the match is exact.

``fused_head_xent`` matches
``cross_entropy_ignore_index(jnp.dot(h, w.astype(h.dtype)), targets)``
(torch F.cross_entropy ignore-index semantics — ops/sampling.py:354).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from attention_models_tpu.ops.flash_attention import _dot_precision
from attention_models_tpu.ops.ffn import pick_block_rows


def _head_xent_fwd_kernel(*refs, has_bias: bool):
    if has_bias:
        h_ref, w_ref, b_ref, tgt_ref, nll_ref, lse_ref = refs
    else:
        h_ref, w_ref, tgt_ref, nll_ref, lse_ref = refs
        b_ref = None
    # h_ref (bn, d); w_ref (d, V) resident; b_ref (1, V); tgt_ref (bn, 1)
    # int32; nll_ref / lse_ref (bn, 1) f32
    dtype = h_ref.dtype
    logits = jax.lax.dot_general(
        h_ref[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(dtype),
    ).astype(dtype)  # round like nn.Dense(dtype) does
    if b_ref is not None:
        logits = logits + b_ref[...]  # bias add in the tower dtype too
    logits = logits.astype(jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True))
    lanes = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    onehot = lanes == tgt_ref[...]  # invalid/ignored rows select nothing
    tl = jnp.sum(jnp.where(onehot, logits, 0.0), axis=-1, keepdims=True)
    nll_ref[...] = lse - tl  # garbage on ignored rows; masked by the caller
    lse_ref[...] = lse


def _head_xent_bwd_kernel(*refs, has_bias: bool):
    if has_bias:
        (h_ref, w_ref, b_ref, tgt_ref, lse_ref, coef_ref,
         dh_ref, dw_ref, db_ref) = refs
    else:
        h_ref, w_ref, tgt_ref, lse_ref, coef_ref, dh_ref, dw_ref = refs
        b_ref = db_ref = None
    # h_ref (bn, d); w_ref (d, V) resident; tgt/lse/coef (bn, 1) — coef is
    # dnll per row (0 on ignored rows); dh (bn, d) per tile; dw (d, V) and
    # db (1, V) fp32 accumulators (constant index_map)
    dtype = h_ref.dtype
    prec = _dot_precision(dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        if db_ref is not None:
            db_ref[...] = jnp.zeros_like(db_ref)

    h = h_ref[...]
    logits = jax.lax.dot_general(
        h, w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(dtype)
    if b_ref is not None:
        logits = logits + b_ref[...]
    logits = logits.astype(jnp.float32)
    p = jnp.exp(logits - lse_ref[...])  # softmax row (recomputed from lse)
    lanes = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    onehot = (lanes == tgt_ref[...]).astype(jnp.float32)
    dl32 = (p - onehot) * coef_ref[...]
    if db_ref is not None:
        db_ref[...] += jnp.sum(dl32, axis=0, keepdims=True)
    dl = dl32.astype(dtype)
    dh_ref[...] = jax.lax.dot_general(
        dl, w_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(dh_ref.dtype)
    dw_ref[...] += jax.lax.dot_general(
        h, dl,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _head_nll(block_rows, interpret, h, w, bias, targets):
    nll, _ = _head_nll_fwd_call(block_rows, interpret, h, w, bias, targets)
    return nll


def _head_nll_fwd_call(block_rows, interpret, h, w, bias, targets):
    n, d = h.shape
    v = w.shape[-1]
    bn = pick_block_rows(n, block_rows)
    wc = w.astype(h.dtype)
    res = lambda s0, s1: pl.BlockSpec(  # noqa: E731
        (s0, s1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    tile = lambda s1: pl.BlockSpec(  # noqa: E731
        (bn, s1), lambda t: (t, 0), memory_space=pltpu.VMEM)
    has_bias = bias is not None
    in_specs = [tile(d), res(d, v)]
    args = [h, wc]
    if has_bias:
        in_specs.append(res(1, v))
        args.append(bias.reshape(1, v).astype(h.dtype))
    in_specs.append(tile(1))
    args.append(targets.reshape(n, 1).astype(jnp.int32))
    nll, lse = pl.pallas_call(
        functools.partial(_head_xent_fwd_kernel, has_bias=has_bias),
        grid=(n // bn,),
        in_specs=in_specs,
        out_specs=[tile(1), tile(1)],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * v,
            bytes_accessed=(h.size + w.size) * h.dtype.itemsize,
            transcendentals=n * v,
        ),
        interpret=interpret,
    )(*args)
    return nll.reshape(n), lse


def _head_nll_fwd(block_rows, interpret, h, w, bias, targets):
    nll, lse = _head_nll_fwd_call(block_rows, interpret, h, w, bias, targets)
    return nll, (h, w, bias, targets, lse)


def _head_nll_bwd(block_rows, interpret, res, g):
    h, w, bias, targets, lse = res
    n, d = h.shape
    v = w.shape[-1]
    bn = pick_block_rows(n, block_rows)
    wc = w.astype(h.dtype)
    res_spec = lambda s0, s1: pl.BlockSpec(  # noqa: E731
        (s0, s1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    tile = lambda s1: pl.BlockSpec(  # noqa: E731
        (bn, s1), lambda t: (t, 0), memory_space=pltpu.VMEM)
    has_bias = bias is not None
    in_specs = [tile(d), res_spec(d, v)]
    args = [h, wc]
    if has_bias:
        in_specs.append(res_spec(1, v))
        args.append(bias.reshape(1, v).astype(h.dtype))
    in_specs += [tile(1), tile(1), tile(1)]
    args += [targets.reshape(n, 1).astype(jnp.int32), lse,
             g.reshape(n, 1).astype(jnp.float32)]
    out_specs = [tile(d), res_spec(d, v)]
    out_shape = [
        jax.ShapeDtypeStruct((n, d), h.dtype),
        jax.ShapeDtypeStruct((d, v), jnp.float32),
    ]
    if has_bias:
        out_specs.append(res_spec(1, v))
        out_shape.append(jax.ShapeDtypeStruct((1, v), jnp.float32))
    outs = pl.pallas_call(
        functools.partial(_head_xent_bwd_kernel, has_bias=has_bias),
        grid=(n // bn,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * n * d * v,
            bytes_accessed=(2 * h.size + 2 * w.size) * h.dtype.itemsize,
            transcendentals=n * v,
        ),
        interpret=interpret,
    )(*args)
    dh, dw = outs[0], outs[1]
    db = outs[2].reshape(-1).astype(bias.dtype) if has_bias else None
    return (dh, dw.astype(w.dtype), db,
            np.zeros(targets.shape, jax.dtypes.float0))


_head_nll.defvjp(_head_nll_fwd, _head_nll_bwd)


def fused_head_xent(
    h: jnp.ndarray,  # (..., d) — final hidden states
    w: jnp.ndarray,  # (d, V) — head kernel
    targets: jnp.ndarray,  # (...) int, ignore_index entries skipped
    ignore_index: int = -1,
    *,
    bias: jnp.ndarray | None = None,  # (V,) — Parti's biased to_logits head
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Mean CE over non-ignored positions of ``dot(h, w) (+ bias)`` vs
    ``targets`` without materializing the (N, V) logits in HBM (see module
    docstring)."""
    d = h.shape[-1]
    hf = h.reshape(-1, d)
    # match the unfused formulation's numpy broadcasting: CE(logits(B,t,V),
    # targets(1,t)) broadcasts targets over the batch (hit by e.g. MUSE.
    # init_all, which inits with text batch > image batch)
    tf = jnp.broadcast_to(targets, h.shape[:-1]).reshape(-1)
    nll = _head_nll(block_rows, interpret, hf, w, bias, tf)
    valid = tf != ignore_index
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def head_xent_supported(shape: tuple, d: int, vocab: int,
                        platform: str | None = None) -> bool:
    """Fused path gate: TPU backend, lane-aligned dims, row count tiles."""
    from attention_models_tpu.ops.dispatch import on_tpu, rows_lane_tileable

    return (on_tpu(platform) and vocab % 128 == 0
            and rows_lane_tileable(shape, d))
