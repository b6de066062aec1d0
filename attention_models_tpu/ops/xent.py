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


def _head_xent_fwd_kernel(
    h_ref,  # (bn, d)
    w_ref,  # (d, V) — resident (constant index_map)
    tgt_ref,  # (bn, 1) int32
    nll_ref,  # (bn, 1) f32
    lse_ref,  # (bn, 1) f32
):
    dtype = h_ref.dtype
    logits = jax.lax.dot_general(
        h_ref[...], w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(dtype),
    ).astype(dtype).astype(jnp.float32)  # round like nn.Dense(dtype) does
    m = jnp.max(logits, axis=-1, keepdims=True)
    lse = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=-1, keepdims=True))
    lanes = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    onehot = lanes == tgt_ref[...]  # invalid/ignored rows select nothing
    tl = jnp.sum(jnp.where(onehot, logits, 0.0), axis=-1, keepdims=True)
    nll_ref[...] = lse - tl  # garbage on ignored rows; masked by the caller
    lse_ref[...] = lse


def _head_xent_bwd_kernel(
    h_ref,  # (bn, d)
    w_ref,  # (d, V) — resident
    tgt_ref,  # (bn, 1) int32
    lse_ref,  # (bn, 1) f32
    coef_ref,  # (bn, 1) f32 — dnll per row (0 on ignored rows)
    dh_ref,  # (bn, d) — per tile
    dw_ref,  # (d, V) fp32 accumulator (constant index_map)
):
    dtype = h_ref.dtype
    prec = _dot_precision(dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    h = h_ref[...]
    logits = jax.lax.dot_general(
        h, w_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(dtype).astype(jnp.float32)
    p = jnp.exp(logits - lse_ref[...])  # softmax row (recomputed from lse)
    lanes = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    onehot = (lanes == tgt_ref[...]).astype(jnp.float32)
    dl = ((p - onehot) * coef_ref[...]).astype(dtype)
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
def _head_nll(block_rows, interpret, h, w, targets):
    nll, _ = _head_nll_fwd_call(block_rows, interpret, h, w, targets)
    return nll


def _head_nll_fwd_call(block_rows, interpret, h, w, targets):
    n, d = h.shape
    v = w.shape[-1]
    bn = pick_block_rows(n, block_rows)
    wc = w.astype(h.dtype)
    res = lambda s0, s1: pl.BlockSpec(  # noqa: E731
        (s0, s1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    tile = lambda s1, : pl.BlockSpec(  # noqa: E731
        (bn, s1), lambda t: (t, 0), memory_space=pltpu.VMEM)
    nll, lse = pl.pallas_call(
        _head_xent_fwd_kernel,
        grid=(n // bn,),
        in_specs=[tile(d), res(d, v), tile(1)],
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
    )(h, wc, targets.reshape(n, 1).astype(jnp.int32))
    return nll.reshape(n), lse


def _head_nll_fwd(block_rows, interpret, h, w, targets):
    nll, lse = _head_nll_fwd_call(block_rows, interpret, h, w, targets)
    return nll, (h, w, targets, lse)


def _head_nll_bwd(block_rows, interpret, res, g):
    h, w, targets, lse = res
    n, d = h.shape
    v = w.shape[-1]
    bn = pick_block_rows(n, block_rows)
    wc = w.astype(h.dtype)
    res_spec = lambda s0, s1: pl.BlockSpec(  # noqa: E731
        (s0, s1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    tile = lambda s1: pl.BlockSpec(  # noqa: E731
        (bn, s1), lambda t: (t, 0), memory_space=pltpu.VMEM)
    dh, dw = pl.pallas_call(
        _head_xent_bwd_kernel,
        grid=(n // bn,),
        in_specs=[tile(d), res_spec(d, v), tile(1), tile(1), tile(1)],
        out_specs=[tile(d), res_spec(d, v)],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), h.dtype),
            jax.ShapeDtypeStruct((d, v), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * n * d * v,
            bytes_accessed=(2 * h.size + 2 * w.size) * h.dtype.itemsize,
            transcendentals=n * v,
        ),
        interpret=interpret,
    )(h, wc, targets.reshape(n, 1).astype(jnp.int32), lse,
      g.reshape(n, 1).astype(jnp.float32))
    return dh, dw.astype(w.dtype), np.zeros(targets.shape, jax.dtypes.float0)


_head_nll.defvjp(_head_nll_fwd, _head_nll_bwd)


def fused_head_xent(
    h: jnp.ndarray,  # (..., d) — final hidden states
    w: jnp.ndarray,  # (d, V) — no-bias head kernel
    targets: jnp.ndarray,  # (...) int, ignore_index entries skipped
    ignore_index: int = -1,
    *,
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Mean CE over non-ignored positions of ``dot(h, w)`` vs ``targets``
    without materializing the (N, V) logits in HBM (see module docstring)."""
    d = h.shape[-1]
    hf = h.reshape(-1, d)
    tf = targets.reshape(-1)
    nll = _head_nll(block_rows, interpret, hf, w, tf)
    valid = tf != ignore_index
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def head_xent_supported(shape: tuple, d: int, vocab: int,
                        platform: str | None = None) -> bool:
    """Fused path gate: TPU backend, lane-aligned dims, row count tiles."""
    if platform is None:
        platform = jax.default_backend()
    if platform not in ("tpu", "axon"):
        return False
    n = 1
    for s in shape[:-1]:
        n *= s
    return d % 128 == 0 and vocab % 128 == 0 and n % 8 == 0 and n >= 8
