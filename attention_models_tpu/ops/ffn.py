"""Fused GEGLU feed-forward (Pallas): Dense(2i) → GEGLU → γ-LayerNorm →
Dense(d) in ONE kernel pass.

Unfused, the FFN round-trips every intermediate through HBM: the (N, 2i)
ff_in output, the (N, i) GEGLU result, and the LN output — ~1GB per layer at
Muse's decode shape (N=16k tokens, i=4096), which profiling shows as ~half
the decode step. Here a row tile of x enters VMEM once, both weight matrices
stay RESIDENT across the whole grid (constant index_map — fetched a single
time), and only the (N, d) output leaves. HBM traffic per layer drops to
x + out + weights ≈ 75MB.

The backward is a Pallas kernel too (`_ffn_bwd_kernel`): one pass over the
same row tiles recomputes h/ĝ blockwise in VMEM from the saved (x, weights)
residuals — FlashAttention-style — and emits dx per tile while dw1/dγ/dw2
accumulate in revisited fp32 VMEM output blocks (constant index_map, same
pattern as ops/flash_attention.py's fused dq accumulator). Training HBM
traffic per layer drops from ~1.3 GB (the unfused recompute materialized
every (N, 2i)/(N, i) intermediate, LN math in fp32) to x + dy + dx +
weights ≈ 100 MB; profiling showed the unfused FFN backward as the largest
HBM consumer of the Muse train step (which is memory-bound at the v5e HBM
roofline). Semantics match models/layers.py::FeedForward exactly: no-bias
denses, gelu(approximate=False) on the FIRST half, gate from the second,
fp32 LN statistics with scale-only gamma; in-kernel backward math runs in
fp32 (LN stats, GELU derivative) with dots on the tower dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from attention_models_tpu.ops.flash_attention import _dot_precision


def _erf_approx(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7) — Mosaic
    has no erf primitive; this uses only exp/mul/add, all supported. The
    error is far below bf16 resolution and the 1e-5 test tolerances."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """gelu(approximate=False): x·Φ(x) — matches jax.nn.gelu to ~1e-7."""
    return x * 0.5 * (1.0 + _erf_approx(x * 0.7071067811865476))


def _ffn_kernel(
    x_ref,  # (bn, d)
    w1_ref,  # (d, 2i) — resident (constant index_map)
    gamma_ref,  # (1, i)
    w2_ref,  # (i, d) — resident
    o_ref,  # (bn, d)
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
    o = jax.lax.dot_general(
        y.astype(dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(dtype),
    )
    o_ref[...] = o.astype(o_ref.dtype)


def _ffn_reference(x, w1, gamma, w2, eps):
    """The unfused formulation (identical to models/layers.py::FeedForward
    with the params applied manually) — the backward path and the CPU path."""
    dtype = x.dtype
    h = jnp.dot(x, w1.astype(dtype))
    i = w2.shape[0]
    a, gate = h[..., :i], h[..., i:]
    g = gate * jax.nn.gelu(a, approximate=False)
    g32 = g.astype(jnp.float32)
    mean = jnp.mean(g32, axis=-1, keepdims=True)
    var = jnp.var(g32, axis=-1, keepdims=True)
    y = (g32 - mean) / jnp.sqrt(var + eps) * gamma
    return jnp.dot(y.astype(dtype), w2.astype(dtype))


def pick_block_rows(n: int, block_rows: int) -> int:
    """Largest row-tile size <= min(block_rows, n) that divides n, stepping
    down in 8-row (sublane) decrements. Shared by every row-tiled kernel in
    ops/ffn.py and ops/quant.py so the tiling heuristic lives in one place."""
    bn = min(block_rows, n)
    while n % bn and bn > 8:
        bn -= 8 if bn % 8 == 0 else bn % 8
    if bn < 8 or n % bn:
        raise ValueError(f"unsupported row count {n}")
    return bn


def _ffn_forward(x, w1, gamma, w2, *, eps, block_rows, interpret):
    orig_shape = x.shape
    d = orig_shape[-1]
    two_i = w1.shape[-1]
    i = two_i // 2
    xf = x.reshape(-1, d)
    n = xf.shape[0]
    bn = pick_block_rows(n, block_rows)

    w1c = w1.astype(x.dtype)
    w2c = w2.astype(x.dtype)
    out = pl.pallas_call(
        functools.partial(_ffn_kernel, eps=eps),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, two_i), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, i), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((i, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, d), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * d * two_i + 2 * n * i * d,
            bytes_accessed=(xf.size + w1.size + w2.size + xf.size)
            * x.dtype.itemsize,
            transcendentals=n * i,
        ),
        interpret=interpret,
    )(xf, w1c, gamma.reshape(1, i), w2c)
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _ffn(eps, block_rows, interpret, x, w1, gamma, w2):
    return _ffn_forward(x, w1, gamma, w2, eps=eps, block_rows=block_rows,
                        interpret=interpret)


def _ffn_fwd(eps, block_rows, interpret, x, w1, gamma, w2):
    return (
        _ffn(eps, block_rows, interpret, x, w1, gamma, w2),
        (x, w1, gamma, w2),
    )


_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _ffn_bwd_kernel(
    x_ref,  # (bn, d)
    w1a_ref,  # (d, i) — resident (first half of w1)
    w1b_ref,  # (d, i) — resident (gate half of w1)
    gamma_ref,  # (1, i)
    w2_ref,  # (i, d) — resident
    dy_ref,  # (bn, d)
    dx_ref,  # (bn, d) — per tile
    dw1a_ref,  # (d, i) fp32 accumulator (constant index_map)
    dw1b_ref,  # (d, i) fp32 accumulator
    dg_ref,  # (1, i) fp32 accumulator
    dw2_ref,  # (i, d) fp32 accumulator
    *,
    eps: float,
):
    dtype = x_ref.dtype
    prec = _dot_precision(dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1a_ref[...] = jnp.zeros_like(dw1a_ref)
        dw1b_ref[...] = jnp.zeros_like(dw1b_ref)
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    def dot(lhs, rhs, dims):
        return jax.lax.dot_general(
            lhs, rhs, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    # --- recompute the forward blockwise (fp32 internals) ---------------- #
    x = x_ref[...]
    a = dot(x, w1a_ref[...], ((1,), (0,)))  # (bn, i) fp32
    gate = dot(x, w1b_ref[...], ((1,), (0,)))
    phi = 0.5 * (1.0 + _erf_approx(a * _INV_SQRT2))  # Φ(a)
    ga = a * phi  # gelu(a)
    g = gate * ga
    mean = jnp.mean(g, axis=-1, keepdims=True)
    c = g - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    ghat = c * rstd
    gamma32 = gamma_ref[...].astype(jnp.float32)
    y = (ghat * gamma32).astype(dtype)

    # --- backward --------------------------------------------------------- #
    do = dy_ref[...].astype(dtype)
    dw2_ref[...] += dot(y, do, ((0,), (0,)))  # yᵀ·do → (i, d)
    dy_ln = dot(do, w2_ref[...], ((1,), (1,)))  # do·w2ᵀ → (bn, i) fp32
    dg_ref[...] += jnp.sum(dy_ln * ghat, axis=0, keepdims=True)
    dghat = dy_ln * gamma32
    m1 = jnp.mean(dghat, axis=-1, keepdims=True)
    m2 = jnp.mean(dghat * ghat, axis=-1, keepdims=True)
    dgrow = rstd * (dghat - m1 - ghat * m2)  # LN backward, rowwise
    dgate = (dgrow * ga).astype(dtype)
    pdf = jnp.exp(-0.5 * a * a) * _INV_SQRT_2PI  # φ(a)
    da = (dgrow * gate * (phi + a * pdf)).astype(dtype)
    dx = (
        dot(da, w1a_ref[...], ((1,), (1,)))
        + dot(dgate, w1b_ref[...], ((1,), (1,)))
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dw1a_ref[...] += dot(x, da, ((0,), (0,)))  # xᵀ·da → (d, i)
    dw1b_ref[...] += dot(x, dgate, ((0,), (0,)))


def _ffn_bwd_pallas(x, w1, gamma, w2, dy, *, eps, block_rows, interpret):
    orig_shape = x.shape
    d = orig_shape[-1]
    two_i = w1.shape[-1]
    i = two_i // 2
    xf = x.reshape(-1, d)
    dyf = dy.reshape(-1, d)
    n = xf.shape[0]
    # smaller default tile than forward: the bwd keeps ~8 (bn, i) fp32
    # intermediates live next to the resident weights + dW accumulators
    bn = pick_block_rows(n, block_rows)

    w1c = w1.astype(x.dtype)
    w2c = w2.astype(x.dtype)
    res = lambda s0, s1: pl.BlockSpec(  # noqa: E731 — resident block
        (s0, s1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    tile = lambda: pl.BlockSpec(  # noqa: E731
        (bn, d), lambda t: (t, 0), memory_space=pltpu.VMEM)
    dx, dw1a, dw1b, dgam, dw2 = pl.pallas_call(
        functools.partial(_ffn_bwd_kernel, eps=eps),
        grid=(n // bn,),
        in_specs=[tile(), res(d, i), res(d, i), res(1, i), res(i, d), tile()],
        out_specs=[tile(), res(d, i), res(d, i), res(1, i), res(i, d)],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), x.dtype),
            jax.ShapeDtypeStruct((d, i), jnp.float32),
            jax.ShapeDtypeStruct((d, i), jnp.float32),
            jax.ShapeDtypeStruct((1, i), jnp.float32),
            jax.ShapeDtypeStruct((i, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * (2 * n * d * two_i + 2 * n * i * d),
            bytes_accessed=(3 * xf.size + 2 * (w1.size + w2.size))
            * x.dtype.itemsize,
            transcendentals=2 * n * i,
        ),
        interpret=interpret,
    )(xf, w1c[:, :i], w1c[:, i:], gamma.reshape(1, i).astype(jnp.float32),
      w2c, dyf)
    dw1 = jnp.concatenate([dw1a, dw1b], axis=1)
    return (
        dx.reshape(orig_shape),
        dw1.astype(w1.dtype),
        dgam.reshape(-1).astype(gamma.dtype),
        dw2.astype(w2.dtype),
    )


def _ffn_bwd(eps, block_rows, interpret, res, g):
    x, w1, gamma, w2 = res
    return _ffn_bwd_pallas(x, w1, gamma, w2, g, eps=eps,
                           block_rows=min(block_rows, 128),
                           interpret=interpret)


_ffn.defvjp(_ffn_fwd, _ffn_bwd)


def fused_ffn(
    x: jnp.ndarray,  # (..., d)
    w1: jnp.ndarray,  # (d, 2i)
    gamma: jnp.ndarray,  # (i,)
    w2: jnp.ndarray,  # (i, d)
    *,
    eps: float = 1e-5,
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused GEGLU FFN (see module docstring)."""
    return _ffn(eps, block_rows, interpret, x, w1, gamma, w2)


def ffn_supported(shape: tuple, d: int, inner: int,
                  platform: str | None = None) -> bool:
    """Fused path gate: TPU backend, lane-aligned dims, row count tiles."""
    from attention_models_tpu.ops.dispatch import on_tpu, rows_lane_tileable

    return (on_tpu(platform) and inner % 128 == 0
            and rows_lane_tileable(shape, d))


# --------------------------------------------------------------------------- #
# Fused plain-GELU MLP (Dense+bias -> gelu -> Dense+bias) — the ViTVQGAN
# TransformerBlock FFN (models/layers.py::Mlp). Same single-pass design as
# fused_ffn; biases ride along, no LN. bf16-only by policy: the fp32 path
# (golden bit-match, CPU parity) keeps the exact unfused formulation, since
# the in-kernel erf is the 1.5e-7 Abramowitz-Stegun approximation.
# --------------------------------------------------------------------------- #


def _mlp_kernel(
    x_ref,  # (bn, d)
    w1_ref,  # (d, hid) — resident
    b1_ref,  # (1, hid)
    w2_ref,  # (hid, d) — resident
    b2_ref,  # (1, d)
    o_ref,  # (bn, d)
):
    dtype = x_ref.dtype
    h = jax.lax.dot_general(
        x_ref[...], w1_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(dtype),
    ) + b1_ref[...].astype(jnp.float32)
    g = _gelu_exact(h)
    o = jax.lax.dot_general(
        g.astype(dtype), w2_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_dot_precision(dtype),
    ) + b2_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _mlp_reference(x, w1, b1, w2, b2):
    """Unfused formulation, identical to models/layers.py::Mlp with the
    params applied manually (the backward path and the CPU/fp32 path)."""
    dtype = x.dtype
    h = jnp.dot(x, w1.astype(dtype)) + b1.astype(dtype)
    g = jax.nn.gelu(h, approximate=False)
    return jnp.dot(g, w2.astype(dtype)) + b2.astype(dtype)


def _mlp_forward(x, w1, b1, w2, b2, *, block_rows, interpret):
    orig_shape = x.shape
    d = orig_shape[-1]
    hid = w1.shape[-1]
    xf = x.reshape(-1, d)
    n = xf.shape[0]
    bn = pick_block_rows(n, block_rows)

    out = pl.pallas_call(
        _mlp_kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hid), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
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
            bytes_accessed=(2 * xf.size + w1.size + w2.size)
            * x.dtype.itemsize,
            transcendentals=n * hid,
        ),
        interpret=interpret,
    )(xf, w1.astype(x.dtype), b1.reshape(1, hid), w2.astype(x.dtype),
      b2.reshape(1, d))
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _mlp(block_rows, interpret, x, w1, b1, w2, b2):
    return _mlp_forward(x, w1, b1, w2, b2, block_rows=block_rows,
                        interpret=interpret)


def _mlp_fwd(block_rows, interpret, x, w1, b1, w2, b2):
    return (
        _mlp(block_rows, interpret, x, w1, b1, w2, b2),
        (x, w1, b1, w2, b2),
    )


def _mlp_bwd_kernel(
    x_ref,  # (bn, d)
    w1_ref,  # (d, hid) — resident
    b1_ref,  # (1, hid)
    w2_ref,  # (hid, d) — resident
    dy_ref,  # (bn, d)
    dx_ref,  # (bn, d) — per tile
    dw1_ref,  # (d, hid) fp32 accumulator (constant index_map)
    db1_ref,  # (1, hid) fp32 accumulator
    dw2_ref,  # (hid, d) fp32 accumulator
    db2_ref,  # (1, d) fp32 accumulator
):
    dtype = x_ref.dtype
    prec = _dot_precision(dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    def dot(lhs, rhs, dims):
        return jax.lax.dot_general(
            lhs, rhs, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    x = x_ref[...]
    h = dot(x, w1_ref[...], ((1,), (0,))) + b1_ref[...].astype(jnp.float32)
    phi = 0.5 * (1.0 + _erf_approx(h * _INV_SQRT2))
    g = (h * phi).astype(dtype)

    do = dy_ref[...]
    do32 = do.astype(jnp.float32)
    db2_ref[...] += jnp.sum(do32, axis=0, keepdims=True)
    dw2_ref[...] += dot(g, do, ((0,), (0,)))  # gᵀ·do → (hid, d)
    dg = dot(do, w2_ref[...], ((1,), (1,)))  # do·w2ᵀ → (bn, hid) fp32
    pdf = jnp.exp(-0.5 * h * h) * _INV_SQRT_2PI
    dh = dg * (phi + h * pdf)
    db1_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dhc = dh.astype(dtype)
    dx_ref[...] = dot(dhc, w1_ref[...], ((1,), (1,))).astype(dx_ref.dtype)
    dw1_ref[...] += dot(x, dhc, ((0,), (0,)))  # xᵀ·dh → (d, hid)


def _mlp_bwd(block_rows, interpret, res, g):
    x, w1, b1, w2, b2 = res
    orig_shape = x.shape
    d = orig_shape[-1]
    hid = w1.shape[-1]
    xf = x.reshape(-1, d)
    dyf = g.reshape(-1, d)
    n = xf.shape[0]
    bn = pick_block_rows(n, min(block_rows, 128))

    res_spec = lambda s0, s1: pl.BlockSpec(  # noqa: E731
        (s0, s1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    tile = lambda: pl.BlockSpec(  # noqa: E731
        (bn, d), lambda t: (t, 0), memory_space=pltpu.VMEM)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        _mlp_bwd_kernel,
        grid=(n // bn,),
        in_specs=[tile(), res_spec(d, hid), res_spec(1, hid),
                  res_spec(hid, d), tile()],
        out_specs=[tile(), res_spec(d, hid), res_spec(1, hid),
                   res_spec(hid, d), res_spec(1, d)],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), x.dtype),
            jax.ShapeDtypeStruct((d, hid), jnp.float32),
            jax.ShapeDtypeStruct((1, hid), jnp.float32),
            jax.ShapeDtypeStruct((hid, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * n * d * hid,
            bytes_accessed=(3 * xf.size + 2 * (w1.size + w2.size))
            * x.dtype.itemsize,
            transcendentals=2 * n * hid,
        ),
        interpret=interpret,
    )(xf, w1.astype(x.dtype), b1.reshape(1, hid).astype(jnp.float32),
      w2.astype(x.dtype), dyf)
    return (
        dx.reshape(orig_shape),
        dw1.astype(w1.dtype),
        db1.reshape(-1).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(-1).astype(b2.dtype),
    )


_mlp.defvjp(_mlp_fwd, _mlp_bwd)


def fused_mlp(
    x: jnp.ndarray,  # (..., d)
    w1: jnp.ndarray,  # (d, hid)
    b1: jnp.ndarray,  # (hid,)
    w2: jnp.ndarray,  # (hid, d)
    b2: jnp.ndarray,  # (d,)
    *,
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused GELU MLP (see section comment)."""
    return _mlp(block_rows, interpret, x, w1, b1, w2, b2)


def mlp_supported(shape: tuple, d: int, platform: str | None = None) -> bool:
    """bf16 TPU fast path only (fp32 keeps the exact unfused formulation);
    hidden width may be lane-unaligned (full-dim blocks pad internally)."""
    from attention_models_tpu.ops.dispatch import on_tpu, rows_lane_tileable

    return on_tpu(platform) and rows_lane_tileable(shape, d)


# --------------------------------------------------------------------------- #
# Fully-fused pre-LN MLP block: out = x + Mlp(LayerNorm(x)) — the entire
# second half of a ViT TransformerBlock in one kernel. The LN is rowwise, so
# it fuses per tile for free; the residual is the tile itself. Saves the LN
# and residual HBM round-trips on top of fused_mlp's savings.
# --------------------------------------------------------------------------- #


def _ln_mlp_kernel(
    x_ref,  # (bn, d)
    lng_ref,  # (1, d)
    lnb_ref,  # (1, d)
    w1_ref,  # (d, hid) — resident
    b1_ref,  # (1, hid)
    w2_ref,  # (hid, d) — resident
    b2_ref,  # (1, d)
    o_ref,  # (bn, d)
    *,
    eps: float,
):
    dtype = x_ref.dtype
    bn = x_ref.shape[0]

    def chain(rows):
        """One LN -> MM1 -> gelu -> MM2 dependency chain over a row slice."""
        x32 = x_ref[rows, :].astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        y = (y * lng_ref[...].astype(jnp.float32)
             + lnb_ref[...].astype(jnp.float32))
        h = jax.lax.dot_general(
            y.astype(dtype), w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(dtype),
        ) + b1_ref[...].astype(jnp.float32)
        g = _gelu_exact(h)
        o = jax.lax.dot_general(
            g.astype(dtype), w2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_dot_precision(dtype),
        ) + b2_ref[...].astype(jnp.float32)
        return (x32 + o).astype(o_ref.dtype)

    # Single chain per program. (An r4 experiment split the block into two
    # independent half-row chains hoping Mosaic would overlap one half's
    # VPU tail with the other's matmuls — measured in-model it was
    # slightly SLOWER (1.346 -> 1.365 ms/layer on the ViTVQGAN recon fwd,
    # b=64): the scheduler emits chains in program order and the split
    # only added per-chain overhead. Reverted.)
    o_ref[...] = chain(slice(0, bn))


def _ln_mlp_reference(x, lng, lnb, w1, b1, w2, b2, eps):
    """Unfused: x + Mlp(LayerNorm(x)) with torch-semantics fp32 LN stats —
    identical to LayerNorm + Mlp applied via their module formulations."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = ((x32 - mean) / jnp.sqrt(var + eps) * lng + lnb).astype(dtype)
    return x + _mlp_reference(y, w1, b1, w2, b2)


def _ln_mlp_forward(x, lng, lnb, w1, b1, w2, b2, *, eps, block_rows,
                    interpret):
    orig_shape = x.shape
    d = orig_shape[-1]
    hid = w1.shape[-1]
    xf = x.reshape(-1, d)
    n = xf.shape[0]
    bn = pick_block_rows(n, block_rows)

    out = pl.pallas_call(
        functools.partial(_ln_mlp_kernel, eps=eps),
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, d), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, hid), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hid), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hid, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
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
            bytes_accessed=(2 * xf.size + w1.size + w2.size)
            * x.dtype.itemsize,
            transcendentals=n * hid,
        ),
        interpret=interpret,
    )(xf, lng.reshape(1, d), lnb.reshape(1, d), w1.astype(x.dtype),
      b1.reshape(1, hid), w2.astype(x.dtype), b2.reshape(1, d))
    return out.reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _ln_mlp(eps, block_rows, interpret, x, lng, lnb, w1, b1, w2, b2):
    return _ln_mlp_forward(x, lng, lnb, w1, b1, w2, b2, eps=eps,
                           block_rows=block_rows, interpret=interpret)


def _ln_mlp_fwd(eps, block_rows, interpret, x, lng, lnb, w1, b1, w2, b2):
    return (
        _ln_mlp(eps, block_rows, interpret, x, lng, lnb, w1, b1, w2, b2),
        (x, lng, lnb, w1, b1, w2, b2),
    )


def _ln_mlp_bwd_kernel(
    x_ref,  # (bn, d)
    lng_ref,  # (1, d)
    lnb_ref,  # (1, d)
    w1_ref,  # (d, hid) — resident
    b1_ref,  # (1, hid)
    w2_ref,  # (hid, d) — resident
    dy_ref,  # (bn, d)
    dx_ref,  # (bn, d) — per tile
    dlng_ref,  # (1, d) fp32 accumulator (constant index_map)
    dlnb_ref,  # (1, d) fp32 accumulator
    dw1_ref,  # (d, hid) fp32 accumulator
    db1_ref,  # (1, hid) fp32 accumulator
    dw2_ref,  # (hid, d) fp32 accumulator
    db2_ref,  # (1, d) fp32 accumulator
    *,
    eps: float,
):
    dtype = x_ref.dtype
    prec = _dot_precision(dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dlng_ref[...] = jnp.zeros_like(dlng_ref)
        dlnb_ref[...] = jnp.zeros_like(dlnb_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    def dot(lhs, rhs, dims):
        return jax.lax.dot_general(
            lhs, rhs, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    # --- recompute the forward blockwise (fp32 internals) ---------------- #
    x32 = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    c = x32 - mean
    var = jnp.mean(c * c, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = c * rstd
    lng32 = lng_ref[...].astype(jnp.float32)
    yc = (xhat * lng32 + lnb_ref[...].astype(jnp.float32)).astype(dtype)
    h = dot(yc, w1_ref[...], ((1,), (0,))) + b1_ref[...].astype(jnp.float32)
    phi = 0.5 * (1.0 + _erf_approx(h * _INV_SQRT2))
    g = (h * phi).astype(dtype)

    # --- backward --------------------------------------------------------- #
    do = dy_ref[...]
    do32 = do.astype(jnp.float32)
    db2_ref[...] += jnp.sum(do32, axis=0, keepdims=True)
    dw2_ref[...] += dot(g, do, ((0,), (0,)))  # gᵀ·do → (hid, d)
    dg = dot(do, w2_ref[...], ((1,), (1,)))  # do·w2ᵀ → (bn, hid) fp32
    pdf = jnp.exp(-0.5 * h * h) * _INV_SQRT_2PI
    dh = dg * (phi + h * pdf)
    db1_ref[...] += jnp.sum(dh, axis=0, keepdims=True)
    dhc = dh.astype(dtype)
    dw1_ref[...] += dot(yc, dhc, ((0,), (0,)))  # ycᵀ·dh → (d, hid)
    dy_ln = dot(dhc, w1_ref[...], ((1,), (1,)))  # dh·w1ᵀ → (bn, d) fp32
    dlng_ref[...] += jnp.sum(dy_ln * xhat, axis=0, keepdims=True)
    dlnb_ref[...] += jnp.sum(dy_ln, axis=0, keepdims=True)
    dxhat = dy_ln * lng32
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = do32 + rstd * (dxhat - m1 - xhat * m2)  # residual + LN backward
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _ln_mlp_bwd(eps, block_rows, interpret, res, g):
    x, lng, lnb, w1, b1, w2, b2 = res
    orig_shape = x.shape
    d = orig_shape[-1]
    hid = w1.shape[-1]
    xf = x.reshape(-1, d)
    dyf = g.reshape(-1, d)
    n = xf.shape[0]
    bn = pick_block_rows(n, min(block_rows, 128))

    res_spec = lambda s0, s1: pl.BlockSpec(  # noqa: E731
        (s0, s1), lambda t: (0, 0), memory_space=pltpu.VMEM)
    tile = lambda: pl.BlockSpec(  # noqa: E731
        (bn, d), lambda t: (t, 0), memory_space=pltpu.VMEM)
    dx, dlng, dlnb, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_ln_mlp_bwd_kernel, eps=eps),
        grid=(n // bn,),
        in_specs=[tile(), res_spec(1, d), res_spec(1, d), res_spec(d, hid),
                  res_spec(1, hid), res_spec(hid, d), tile()],
        out_specs=[tile(), res_spec(1, d), res_spec(1, d), res_spec(d, hid),
                   res_spec(1, hid), res_spec(hid, d), res_spec(1, d)],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), x.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, hid), jnp.float32),
            jax.ShapeDtypeStruct((1, hid), jnp.float32),
            jax.ShapeDtypeStruct((hid, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * n * d * hid,
            bytes_accessed=(3 * xf.size + 2 * (w1.size + w2.size))
            * x.dtype.itemsize,
            transcendentals=2 * n * hid,
        ),
        interpret=interpret,
    )(xf, lng.reshape(1, d).astype(jnp.float32),
      lnb.reshape(1, d).astype(jnp.float32),
      w1.astype(x.dtype), b1.reshape(1, hid).astype(jnp.float32),
      w2.astype(x.dtype), dyf)
    return (
        dx.reshape(orig_shape),
        dlng.reshape(-1).astype(lng.dtype),
        dlnb.reshape(-1).astype(lnb.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(-1).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(-1).astype(b2.dtype),
    )


_ln_mlp.defvjp(_ln_mlp_fwd, _ln_mlp_bwd)


def fused_ln_mlp(
    x: jnp.ndarray,  # (..., d)
    ln_gamma: jnp.ndarray,  # (d,)
    ln_beta: jnp.ndarray,  # (d,)
    w1: jnp.ndarray,  # (d, hid)
    b1: jnp.ndarray,  # (hid,)
    w2: jnp.ndarray,  # (hid, d)
    b2: jnp.ndarray,  # (d,)
    *,
    eps: float = 1e-5,
    block_rows: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused x + Mlp(LayerNorm(x)) (see section comment)."""
    return _ln_mlp(eps, block_rows, interpret, x, ln_gamma, ln_beta,
                   w1, b1, w2, b2)
