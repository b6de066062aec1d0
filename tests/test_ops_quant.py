"""Int8 W8A8 quantized matmul ops (ops/quant.py).

The quantized path is opt-in inference-only; these tests pin down
(a) exactness of the int8 plumbing on scale-grid-aligned inputs — any
bug in scales/rounding/accumulation breaks bit-exactness there — and
(b) accuracy on generic Gaussian inputs vs the fp32 formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attention_models_tpu.ops.ffn import _ffn_reference
from attention_models_tpu.ops.quant import (
    _ffn_q8_reference,
    fused_ffn_q8,
    quant_dot,
    quantize_weight,
)


def _grid_aligned(rs, shape, *, scale, axis):
    """Values exactly representable as int8 * per-axis scale grid, with the
    amax pinned to 127*scale so the dynamic scale recovers `scale` exactly."""
    q = rs.randint(-127, 128, size=shape).astype(np.float32)
    # pin one element per row/col to ±127 so amax/127 == scale exactly
    if axis == -1:
        q[..., 0] = 127.0
    else:
        q[0, ...] = 127.0
    return jnp.asarray(q * scale, jnp.float32)


def test_quantize_weight_roundtrip_exact_on_grid():
    rs = np.random.RandomState(0)
    w = _grid_aligned(rs, (64, 32), scale=0.013, axis=0)
    w_q, s = quantize_weight(w)
    assert w_q.dtype == jnp.int8
    np.testing.assert_allclose(np.asarray(w_q, np.float32) * np.asarray(s),
                               np.asarray(w), rtol=0, atol=1e-6)


def test_quant_dot_exact_on_grid():
    """x and w both on their scale grids => the W8A8 dot is EXACT (int32
    accumulation, scales recovered exactly)."""
    rs = np.random.RandomState(1)
    x = _grid_aligned(rs, (16, 64), scale=0.007, axis=-1)
    w = _grid_aligned(rs, (64, 48), scale=0.019, axis=0)
    got = quant_dot(x, w, out_dtype=jnp.float32)
    want = jnp.dot(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-4)


def test_quant_dot_accuracy_gaussian():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.standard_normal((128, 256)), jnp.float32)
    w = jnp.asarray(0.02 * rs.standard_normal((256, 192)), jnp.float32)
    got = np.asarray(quant_dot(x, w, out_dtype=jnp.float32))
    want = np.asarray(jnp.dot(x, w))
    cos = (got * want).sum() / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.9995, cos
    rel = np.abs(got - want).mean() / np.abs(want).mean()
    assert rel < 0.02, rel


def test_fused_ffn_q8_matches_unfused_reference():
    """Pallas kernel (interpret on CPU) vs the unfused W8A8 oracle —
    identical quantization points, so near-bit-equal (fp32 reassoc only)."""
    rs = np.random.RandomState(3)
    d, inner, n = 128, 256, 64
    x = jnp.asarray(rs.standard_normal((2, n // 2, d)), jnp.float32)
    w1 = jnp.asarray(0.05 * rs.standard_normal((d, 2 * inner)), jnp.float32)
    gamma = jnp.asarray(rs.uniform(0.5, 1.5, (inner,)), jnp.float32)
    w2 = jnp.asarray(0.05 * rs.standard_normal((inner, d)), jnp.float32)

    got = fused_ffn_q8(x, w1, gamma, w2, interpret=True)
    want = _ffn_q8_reference(x, w1, gamma, w2, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ffn_q8_accuracy_vs_fp32():
    """W8A8 FFN vs the exact fp32 FFN on Gaussian data: the quantized
    output must stay directionally faithful (cosine > 0.999)."""
    rs = np.random.RandomState(4)
    d, inner, n = 128, 256, 64
    x = jnp.asarray(rs.standard_normal((n, d)), jnp.float32)
    w1 = jnp.asarray(0.05 * rs.standard_normal((d, 2 * inner)), jnp.float32)
    gamma = jnp.asarray(rs.uniform(0.5, 1.5, (inner,)), jnp.float32)
    w2 = jnp.asarray(0.05 * rs.standard_normal((inner, d)), jnp.float32)

    got = np.asarray(_ffn_q8_reference(x, w1, gamma, w2, 1e-5)).ravel()
    want = np.asarray(_ffn_reference(x, w1, gamma, w2, 1e-5)).ravel()
    cos = (got * want).sum() / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.999, cos


def test_fused_ffn_q8wide_matches_unfused_reference():
    """Wide-only mixed kernel (bf16 up-proj, int8 down-proj) vs its
    unfused oracle."""
    from attention_models_tpu.ops.quant import (
        ffn_q8wide_reference,
        fused_ffn_q8wide,
    )

    rs = np.random.RandomState(8)
    d, inner, n = 128, 256, 64
    x = jnp.asarray(rs.standard_normal((2, n // 2, d)), jnp.float32)
    w1 = jnp.asarray(0.05 * rs.standard_normal((d, 2 * inner)), jnp.float32)
    gamma = jnp.asarray(rs.uniform(0.5, 1.5, (inner,)), jnp.float32)
    w2 = jnp.asarray(0.05 * rs.standard_normal((inner, d)), jnp.float32)

    got = fused_ffn_q8wide(x, w1, gamma, w2, interpret=True)
    want = ffn_q8wide_reference(x, w1, gamma, w2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ffn_q8wide_closer_to_fp32_than_full_q8():
    """int8 only on the down-projection must be MORE accurate than the
    full-int8 FFN (one quantized matmul instead of two), and still
    directionally faithful to fp32."""
    from attention_models_tpu.ops.quant import ffn_q8wide_reference

    rs = np.random.RandomState(9)
    d, inner, n = 128, 256, 64
    x = jnp.asarray(rs.standard_normal((n, d)), jnp.float32)
    w1 = jnp.asarray(0.05 * rs.standard_normal((d, 2 * inner)), jnp.float32)
    gamma = jnp.asarray(rs.uniform(0.5, 1.5, (inner,)), jnp.float32)
    w2 = jnp.asarray(0.05 * rs.standard_normal((inner, d)), jnp.float32)

    fp32 = np.asarray(_ffn_reference(x, w1, gamma, w2, 1e-5)).ravel()
    wide = np.asarray(ffn_q8wide_reference(x, w1, gamma, w2)).ravel()
    full = np.asarray(_ffn_q8_reference(x, w1, gamma, w2, 1e-5)).ravel()
    err_wide = np.abs(wide - fp32).mean()
    err_full = np.abs(full - fp32).mean()
    assert err_wide < err_full, (err_wide, err_full)
    cos = (wide * fp32).sum() / (np.linalg.norm(wide) * np.linalg.norm(fp32))
    assert cos > 0.9995, cos


def test_feedforward_int8_wide_mode():
    """quant='int8_wide' on the flax FeedForward: runs, finite, and closer
    to the bf16 module output than quant='int8'."""
    from attention_models_tpu.models.layers import FeedForward

    rs = np.random.RandomState(10)
    x = jnp.asarray(rs.standard_normal((2, 16, 128)), jnp.float32)
    ff = FeedForward(dim=128, mult=3.0)
    params = ff.init(jax.random.key(0), x)
    base = np.asarray(ff.apply(params, x)).ravel()
    wide = np.asarray(
        FeedForward(dim=128, mult=3.0, quant="int8_wide").apply(params, x)
    ).ravel()
    full = np.asarray(
        FeedForward(dim=128, mult=3.0, quant="int8").apply(params, x)
    ).ravel()
    assert np.isfinite(wide).all()
    assert np.abs(wide - base).mean() < np.abs(full - base).mean()


def test_fused_ln_mlp_q8_matches_unfused_reference():
    from attention_models_tpu.ops.quant import (
        fused_ln_mlp_q8,
        ln_mlp_q8_reference,
    )

    rs = np.random.RandomState(6)
    d, hid, n = 128, 192, 32
    x = jnp.asarray(rs.standard_normal((n, d)), jnp.float32)
    lng = jnp.asarray(rs.uniform(0.5, 1.5, (d,)), jnp.float32)
    lnb = jnp.asarray(0.1 * rs.standard_normal((d,)), jnp.float32)
    w1 = jnp.asarray(0.05 * rs.standard_normal((d, hid)), jnp.float32)
    b1 = jnp.asarray(0.1 * rs.standard_normal((hid,)), jnp.float32)
    w2 = jnp.asarray(0.05 * rs.standard_normal((hid, d)), jnp.float32)
    b2 = jnp.asarray(0.1 * rs.standard_normal((d,)), jnp.float32)

    got = fused_ln_mlp_q8(x, lng, lnb, w1, b1, w2, b2, interpret=True)
    want = ln_mlp_q8_reference(x, lng, lnb, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ln_mlp_q8_accuracy_vs_fp32():
    from attention_models_tpu.ops.ffn import _ln_mlp_reference
    from attention_models_tpu.ops.quant import ln_mlp_q8_reference

    rs = np.random.RandomState(7)
    d, hid, n = 128, 192, 32
    x = jnp.asarray(rs.standard_normal((n, d)), jnp.float32)
    lng = jnp.asarray(rs.uniform(0.5, 1.5, (d,)), jnp.float32)
    lnb = jnp.asarray(0.1 * rs.standard_normal((d,)), jnp.float32)
    w1 = jnp.asarray(0.05 * rs.standard_normal((d, hid)), jnp.float32)
    b1 = jnp.asarray(0.1 * rs.standard_normal((hid,)), jnp.float32)
    w2 = jnp.asarray(0.05 * rs.standard_normal((hid, d)), jnp.float32)
    b2 = jnp.asarray(0.1 * rs.standard_normal((d,)), jnp.float32)

    got = np.asarray(ln_mlp_q8_reference(x, lng, lnb, w1, b1, w2, b2)).ravel()
    want = np.asarray(
        _ln_mlp_reference(x, lng, lnb, w1, b1, w2, b2, 1e-5)
    ).ravel()
    cos = (got * want).sum() / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.999, cos


def test_quant_dot_zero_rows_safe():
    """All-zero activation rows must not divide by zero."""
    x = jnp.zeros((8, 64), jnp.float32)
    w = jnp.asarray(np.random.RandomState(5).standard_normal((64, 32)),
                    jnp.float32)
    out = np.asarray(quant_dot(x, w, out_dtype=jnp.float32))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, 0.0, atol=1e-6)
