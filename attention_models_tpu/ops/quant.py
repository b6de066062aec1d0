"""Int8 W8A8 quantized matmuls for the inference fast path.

The reference serves everything in full precision (PyTorch fp32/AMP — e.g.
the Muse CFG decode re-runs the full decoder twice per step,
/root/reference/models/muse.py:211-215). On TPU v5e the MXU executes int8
matmuls at 2x the bf16 rate (394 vs 197 TOPS), and the big decode matmuls
here are already ~86% MFU in bf16 (docs/ROADMAP.md), so dynamic int8
quantization is the remaining large lever.

Scheme (standard W8A8 dynamic quantization):
  - weights:     per-output-channel symmetric scales, int8
  - activations: per-row (= per-token) symmetric scales, computed on the
                 fly inside the kernel — no calibration pass needed
  - accumulate:  int32 on the MXU, dequantized with sx[r] * sw[c]

Everything is OPT-IN (``quant="int8"`` on the model constructors /
``model.params.quant`` in configs): the default path stays bf16 and
reference-exact. Weight quantization runs at trace time on the bf16
params (outside the decode scan, so XLA hoists it out of the loop); the
checkpoint format never changes.

The fused GEGLU-FFN kernel mirrors ops/ffn.py::fused_ffn: one pass over a
row tile with both weight matrices resident in VMEM — int8 residency also
HALVES the weight VMEM footprint, which lets bigger models keep the fused
path. The LN between the two matmuls runs in fp32 exactly like the bf16
kernel; only the matmul operands are quantized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from attention_models_tpu.ops.ffn import (
    _dot_precision,
    _gelu_exact,
    pick_block_rows,
)


def quantize_weight(w: jnp.ndarray, *, axis: int = 0):
    """Symmetric per-output-channel int8 quantization of a (d_in, d_out)
    kernel. Returns (w_q int8, scale fp32 of shape w.shape[1 - axis]
    broadcast over ``axis``)."""
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=axis, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def _quantize_rows_f32(x32: jnp.ndarray):
    """Per-row symmetric int8 quantization (fp32 in). Returns (x_q, sx)
    with sx shaped (rows, 1)."""
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    sx = jnp.maximum(amax, 1e-8) / 127.0
    x_q = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    return x_q, sx


def quant_dot(x: jnp.ndarray, w: jnp.ndarray,
              out_dtype: jnp.dtype | None = None) -> jnp.ndarray:
    """XLA-level W8A8 dot: ``x @ w`` with dynamic per-row activation scales
    and per-column weight scales. x: (..., d_in), w: (d_in, d_out) float.
    Used for the unfused projections (attention qkv/out, logit heads);
    XLA hoists the weight quantization out of decode loops (w is
    loop-invariant)."""
    out_dtype = out_dtype or x.dtype
    w_q, sw = quantize_weight(w)
    shape = x.shape
    x_q, sx = _quantize_rows_f32(x.reshape(-1, shape[-1]).astype(jnp.float32))
    y = jax.lax.dot_general(
        x_q, w_q,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * sx * sw
    return y.reshape(*shape[:-1], w.shape[-1]).astype(out_dtype)


# --------------------------------------------------------------------------- #
# Fused int8 GEGLU FFN: the quantized twin of ops/ffn.py::fused_ffn.
# --------------------------------------------------------------------------- #


def _ffn_q8_kernel(
    x_ref,      # (bn, d) bf16/f32
    w1_ref,     # (d, 2i) int8 — resident
    s1_ref,     # (1, 2i) f32
    gamma_ref,  # (1, i) f32
    w2_ref,     # (i, d) int8 — resident
    s2_ref,     # (1, d) f32
    o_ref,      # (bn, d)
    *,
    eps: float,
):
    i = w2_ref.shape[0]
    x_q, sx = _quantize_rows_f32(x_ref[...].astype(jnp.float32))
    h = jax.lax.dot_general(
        x_q, w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sx * s1_ref[...]
    a = h[:, :i]
    gate = h[:, i:]
    g = gate * _gelu_exact(a)  # fp32
    mean = jnp.mean(g, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(g - mean), axis=-1, keepdims=True)
    y = (g - mean) * jax.lax.rsqrt(var + eps)
    y = y * gamma_ref[...].astype(jnp.float32)
    y_q, sy = _quantize_rows_f32(y)
    o = jax.lax.dot_general(
        y_q, w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sy * s2_ref[...]
    o_ref[...] = o.astype(o_ref.dtype)


def _ffn_q8_reference(x, w1, gamma, w2, eps):
    """Unfused W8A8 formulation with identical quantization points — the
    CPU path and the numerical oracle for the kernel test."""
    d = x.shape[-1]
    i = w2.shape[0]
    w1_q, s1 = quantize_weight(w1)
    w2_q, s2 = quantize_weight(w2)
    x_q, sx = _quantize_rows_f32(x.reshape(-1, d).astype(jnp.float32))
    h = jax.lax.dot_general(
        x_q, w1_q, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sx * s1
    a, gate = h[:, :i], h[:, i:]
    g = gate * jax.nn.gelu(a, approximate=False)
    mean = jnp.mean(g, axis=-1, keepdims=True)
    var = jnp.var(g, axis=-1, keepdims=True)
    y = (g - mean) / jnp.sqrt(var + eps) * gamma.astype(jnp.float32)
    y_q, sy = _quantize_rows_f32(y)
    o = jax.lax.dot_general(
        y_q, w2_q, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sy * s2
    return o.reshape(*x.shape[:-1], w2.shape[-1]).astype(x.dtype)


def ffn_q8_reference(x, w1, gamma, w2, eps: float = 1e-5):
    """Public alias: the unfused W8A8 GEGLU FFN (CPU path / oracle)."""
    return _ffn_q8_reference(x, w1, gamma, w2, eps)


def fused_ffn_q8(
    x: jnp.ndarray,      # (..., d)
    w1: jnp.ndarray,     # (d, 2i) float
    gamma: jnp.ndarray,  # (i,)
    w2: jnp.ndarray,     # (i, d) float
    *,
    eps: float = 1e-5,
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """W8A8 fused GEGLU FFN (inference only — no VJP; training uses the
    bf16 path). Weights are quantized at trace time (loop-invariant under
    decode scans); activations per-row inside the kernel."""
    orig_shape = x.shape
    d = orig_shape[-1]
    two_i = w1.shape[-1]
    i = two_i // 2
    xf = x.reshape(-1, d)
    n = xf.shape[0]
    bn = pick_block_rows(n, block_rows)

    w1_q, s1 = quantize_weight(w1)
    w2_q, s2 = quantize_weight(w2)
    out = pl.pallas_call(
        functools.partial(_ffn_q8_kernel, eps=eps),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, two_i), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, two_i), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((i, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, d), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * two_i + 2 * n * i * d,
            bytes_accessed=xf.size * xf.dtype.itemsize
            + (w1.size + w2.size)  # int8 resident
            + xf.size * xf.dtype.itemsize,
            transcendentals=n * i,
        ),
        interpret=interpret,
    )(xf, w1_q, s1, gamma.reshape(1, i).astype(jnp.float32), w2_q, s2)
    return out.reshape(orig_shape)


# --------------------------------------------------------------------------- #
# Mixed-precision "wide-only" GEGLU FFN: bf16 up-projection, int8 DOWN-
# projection only. int8's 2x MXU rate on v5e only pays when the contraction
# dim is large (≳4096 — below that the per-row quantize/dequantize traffic
# eats the win; measured: full-int8 Muse decode is rate-neutral, recon −7%).
# In the Muse mult=8 FFN the down-projection contracts over inner=4096 — the
# one shipped matmul in int8's profit region — while the up-projection
# contracts over dim=768, so it stays bf16. quant="int8_wide" on the model
# constructors selects this kernel; all other projections fall through to
# their bf16 paths.
# --------------------------------------------------------------------------- #


def _ffn_q8wide_kernel(
    x_ref,      # (bn, d) bf16/f32
    w1_ref,     # (d, 2i) float — resident
    gamma_ref,  # (1, i) f32
    w2_ref,     # (i, d) int8 — resident
    s2_ref,     # (1, d) f32
    o_ref,      # (bn, d)
    *,
    eps: float,
):
    dtype = x_ref.dtype
    i = w2_ref.shape[0]
    h = jax.lax.dot_general(
        x_ref[...], w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(dtype),
    )  # (bn, 2i) fp32
    a = h[:, :i]
    gate = h[:, i:]
    g = gate * _gelu_exact(a)  # fp32
    mean = jnp.mean(g, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(g - mean), axis=-1, keepdims=True)
    y = (g - mean) * jax.lax.rsqrt(var + eps)
    y = y * gamma_ref[...].astype(jnp.float32)
    y_q, sy = _quantize_rows_f32(y)
    o = jax.lax.dot_general(
        y_q, w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sy * s2_ref[...]
    o_ref[...] = o.astype(o_ref.dtype)


def ffn_q8wide_reference(x, w1, gamma, w2, eps: float = 1e-5):
    """Unfused wide-only formulation (bf16 up-proj, W8A8 down-proj) with
    identical quantization points — the CPU path and the kernel oracle."""
    d = x.shape[-1]
    i = w2.shape[0]
    xf = x.reshape(-1, d)
    h = jax.lax.dot_general(
        xf, w1.astype(x.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(x.dtype),
    )
    a, gate = h[:, :i], h[:, i:]
    g = gate * jax.nn.gelu(a, approximate=False)
    mean = jnp.mean(g, axis=-1, keepdims=True)
    var = jnp.var(g, axis=-1, keepdims=True)
    y = (g - mean) / jnp.sqrt(var + eps) * gamma.astype(jnp.float32)
    w2_q, s2 = quantize_weight(w2)
    y_q, sy = _quantize_rows_f32(y)
    o = jax.lax.dot_general(
        y_q, w2_q, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sy * s2
    return o.reshape(*x.shape[:-1], w2.shape[-1]).astype(x.dtype)


def fused_ffn_q8wide(
    x: jnp.ndarray,      # (..., d)
    w1: jnp.ndarray,     # (d, 2i) float
    gamma: jnp.ndarray,  # (i,)
    w2: jnp.ndarray,     # (i, d) float
    *,
    eps: float = 1e-5,
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Wide-only mixed-precision fused GEGLU FFN (inference only — no VJP):
    bf16 up-projection + GEGLU + LN exactly as ops/ffn.py::fused_ffn, int8
    down-projection as fused_ffn_q8. Weight quantization at trace time."""
    orig_shape = x.shape
    d = orig_shape[-1]
    two_i = w1.shape[-1]
    i = two_i // 2
    xf = x.reshape(-1, d)
    n = xf.shape[0]
    bn = pick_block_rows(n, block_rows)

    w2_q, s2 = quantize_weight(w2)
    out = pl.pallas_call(
        functools.partial(_ffn_q8wide_kernel, eps=eps),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, two_i), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((i, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, d), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * two_i + 2 * n * i * d,
            bytes_accessed=xf.size * xf.dtype.itemsize
            + w1.size * w1.dtype.itemsize + w2.size  # w2 int8 resident
            + xf.size * xf.dtype.itemsize,
            transcendentals=n * i,
        ),
        interpret=interpret,
    )(xf, w1.astype(x.dtype), gamma.reshape(1, i).astype(jnp.float32),
      w2_q, s2)
    return out.reshape(orig_shape)


# --------------------------------------------------------------------------- #
# Fused int8 pre-LN MLP block: x + Mlp(LayerNorm(x)) — the quantized twin of
# ops/ffn.py::fused_ln_mlp (the ViTVQGAN TransformerBlock FFN half).
# --------------------------------------------------------------------------- #


def _ln_mlp_q8_kernel(
    x_ref,    # (bn, d)
    lng_ref,  # (1, d) f32
    lnb_ref,  # (1, d) f32
    w1_ref,   # (d, hid) int8 — resident
    s1_ref,   # (1, hid) f32
    b1_ref,   # (1, hid) f32
    w2_ref,   # (hid, d) int8 — resident
    s2_ref,   # (1, d) f32
    b2_ref,   # (1, d) f32
    o_ref,    # (bn, d)
    *,
    eps: float,
):
    x32 = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * lng_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)
    y_q, sy = _quantize_rows_f32(y)
    h = jax.lax.dot_general(
        y_q, w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sy * s1_ref[...] + b1_ref[...]
    g = _gelu_exact(h)
    g_q, sg = _quantize_rows_f32(g)
    o = jax.lax.dot_general(
        g_q, w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sg * s2_ref[...] + b2_ref[...]
    o_ref[...] = (x32 + o).astype(o_ref.dtype)


def ln_mlp_q8_reference(x, lng, lnb, w1, b1, w2, b2, eps: float = 1e-5):
    """Unfused W8A8 pre-LN MLP block with identical quantization points —
    the CPU path and the numerical oracle for the kernel test."""
    d = x.shape[-1]
    x32 = x.reshape(-1, d).astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) / jnp.sqrt(var + eps) * lng.astype(jnp.float32) \
        + lnb.astype(jnp.float32)
    w1_q, s1 = quantize_weight(w1)
    w2_q, s2 = quantize_weight(w2)
    y_q, sy = _quantize_rows_f32(y)
    h = jax.lax.dot_general(
        y_q, w1_q, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sy * s1 + b1.astype(jnp.float32)
    g = jax.nn.gelu(h, approximate=False)
    g_q, sg = _quantize_rows_f32(g)
    o = jax.lax.dot_general(
        g_q, w2_q, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * sg * s2 + b2.astype(jnp.float32)
    return (x32 + o).reshape(x.shape).astype(x.dtype)


def fused_ln_mlp_q8(
    x: jnp.ndarray,         # (..., d)
    ln_gamma: jnp.ndarray,  # (d,)
    ln_beta: jnp.ndarray,   # (d,)
    w1: jnp.ndarray,        # (d, hid) float
    b1: jnp.ndarray,        # (hid,)
    w2: jnp.ndarray,        # (hid, d) float
    b2: jnp.ndarray,        # (d,)
    *,
    eps: float = 1e-5,
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """W8A8 fused x + Mlp(LayerNorm(x)) (inference only — no VJP)."""
    orig_shape = x.shape
    d = orig_shape[-1]
    hid = w1.shape[-1]
    xf = x.reshape(-1, d)
    n = xf.shape[0]
    bn = pick_block_rows(n, block_rows)

    w1_q, s1 = quantize_weight(w1)
    w2_q, s2 = quantize_weight(w2)
    out = pl.pallas_call(
        functools.partial(_ln_mlp_q8_kernel, eps=eps),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hid), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, d), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * d * hid,
            bytes_accessed=2 * xf.size * xf.dtype.itemsize
            + w1.size + w2.size,  # int8 resident
            transcendentals=n * hid,
        ),
        interpret=interpret,
    )(xf, ln_gamma.reshape(1, d).astype(jnp.float32),
      ln_beta.reshape(1, d).astype(jnp.float32),
      w1_q, s1, b1.reshape(1, hid).astype(jnp.float32),
      w2_q, s2, b2.reshape(1, d).astype(jnp.float32))
    return out.reshape(orig_shape)
