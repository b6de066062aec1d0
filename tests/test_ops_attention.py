import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from attention_models_tpu.ops.attention import make_causal_mask, multihead_attention
from attention_models_tpu.ops.flash_attention import flash_attention


def torch_reference_attention(q, k, v, scale, causal_mask=None, context_mask=None):
    """The reference's exact math (softmax_attention.py:62-76) in torch."""
    qt, kt, vt = map(torch.from_numpy, (q, k, v))
    scores = torch.einsum("bhid,bhjd->bhij", qt * scale, kt)
    if context_mask is not None:
        cm = torch.from_numpy(context_mask)[:, None, None, :]
        scores = scores.masked_fill(~cm, -1e9)
    if causal_mask is not None:
        scores = scores.masked_fill(torch.from_numpy(causal_mask), -1e9)
    probs = torch.softmax(scores, dim=-1)
    return torch.einsum("bhij,bhjd->bhid", probs, vt).numpy()


def _rand(*shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_plain_attention_matches_torch():
    q, k, v = _rand(2, 4, 16, 8, seed=0), _rand(2, 4, 16, 8, seed=1), _rand(2, 4, 16, 8, seed=2)
    out = multihead_attention(jnp.array(q), jnp.array(k), jnp.array(v), scale=8 ** -0.5)
    ref = torch_reference_attention(q, k, v, 8 ** -0.5)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_causal_and_context_masks_match_torch():
    q = _rand(2, 2, 8, 4, seed=3)
    k = _rand(2, 2, 10, 4, seed=4)
    v = _rand(2, 2, 10, 4, seed=5)
    causal = np.asarray(make_causal_mask(8, 10))
    # torch triu convention check: same construction as transformer.py:168
    torch_causal = torch.ones((8, 10), dtype=torch.bool).triu(10 - 8 + 1).numpy()
    np.testing.assert_array_equal(causal, torch_causal)

    ctx = np.random.RandomState(6).rand(2, 10) > 0.3
    out = multihead_attention(
        jnp.array(q), jnp.array(k), jnp.array(v), scale=0.5,
        causal_mask=jnp.array(causal), context_mask=jnp.array(ctx),
    )
    ref = torch_reference_attention(q, k, v, 0.5, causal_mask=causal, context_mask=ctx)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_flash_matches_xla_self_attention():
    q, k, v = (_rand(2, 4, 256, 64, seed=s) for s in (7, 8, 9))
    scale = 64 ** -0.5
    out_flash = flash_attention(
        jnp.array(q), jnp.array(k), jnp.array(v), scale=scale, interpret=True
    )
    out_ref = multihead_attention(jnp.array(q), jnp.array(k), jnp.array(v), scale=scale)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_ref), rtol=2e-4, atol=2e-4
    )


def test_flash_causal_matches_xla():
    q, k, v = (_rand(1, 2, 256, 32, seed=s) for s in (10, 11, 12))
    scale = 32 ** -0.5
    out_flash = flash_attention(
        jnp.array(q), jnp.array(k), jnp.array(v), scale=scale, causal=True,
        block_q=128, block_k=128, interpret=True,
    )
    cm = make_causal_mask(256, 256)
    out_ref = multihead_attention(
        jnp.array(q), jnp.array(k), jnp.array(v), scale=scale, causal_mask=cm
    )
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_ref), rtol=2e-4, atol=2e-4
    )


def test_flash_cross_attention_different_lengths():
    q = _rand(1, 2, 128, 32, seed=13)
    k = _rand(1, 2, 256, 32, seed=14)
    v = _rand(1, 2, 256, 32, seed=15)
    out_flash = flash_attention(
        jnp.array(q), jnp.array(k), jnp.array(v), scale=0.2,
        block_q=64, block_k=128, interpret=True,
    )
    out_ref = multihead_attention(jnp.array(q), jnp.array(k), jnp.array(v), scale=0.2)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_ref), rtol=2e-4, atol=2e-4
    )


def test_flash_gradients_match_xla():
    q, k, v = (jnp.array(_rand(1, 2, 128, 32, seed=s)) for s in (16, 17, 18))
    scale = 32 ** -0.5

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, scale=scale, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(multihead_attention(q, k, v, scale=scale) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


def test_flash_supported_requires_tileable_lengths():
    """Regression (round-1 advisor): seq lens with no 8-multiple divisor
    (e.g. ViT's 257 = 256px/patch16 + class token) must dispatch to the XLA
    path instead of crashing in _pick_block at trace time."""
    from attention_models_tpu.ops.flash_attention import flash_supported

    q = (2, 8, 256, 64)
    assert flash_supported(q, q, platform="tpu")
    odd = (2, 8, 257, 64)
    assert not flash_supported(odd, odd, platform="tpu")
    assert not flash_supported(q, odd, platform="tpu")
    assert not flash_supported(q, q, platform="cpu")

    # VMEM-fit gate: the bthd kernels keep full k/v (fwd) or full q/do
    # (bwd dkv program) resident — shapes whose resident blocks exceed the
    # budget must fall back to XLA, not raise "no VMEM-fitting blocks" at
    # trace time (bf16 t=4096, h=12, d=64 -> 2*2*4096*768*2 = 25.2 MB)
    big = (1, 12, 4096, 64)
    assert not flash_supported(big, big, platform="tpu", itemsize=2)
    ok = (1, 8, 1024, 64)  # the production shapes still take the kernel
    assert flash_supported(ok, ok, platform="tpu", itemsize=2)
    assert flash_supported((8, 12, 1024, 64), (8, 12, 1024, 64),
                           platform="tpu", itemsize=2)


def test_flash_gradients_causal_and_cross_length():
    """Pallas backward kernels under causal masking with tq != tk (the
    row-offset corner: cols visible up to row + (tk - tq))."""
    q = jnp.array(_rand(1, 2, 64, 32, seed=19))
    k = jnp.array(_rand(1, 2, 128, 32, seed=20))
    v = jnp.array(_rand(1, 2, 128, 32, seed=21))
    scale = 32 ** -0.5
    cm = make_causal_mask(64, 128)

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, scale=scale, causal=True,
                            block_q=32, block_k=32, interpret=True) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(
            multihead_attention(q, k, v, scale=scale, causal_mask=cm) ** 2
        )

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_flash_gradients_bf16():
    """bf16 inputs: gradients come back in bf16 and track the fp32 XLA
    reference within bf16 tolerance."""
    q, k, v = (jnp.array(_rand(1, 2, 128, 64, seed=s), jnp.bfloat16)
               for s in (22, 23, 24))
    scale = 64 ** -0.5

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, scale=scale, interpret=True)
            .astype(jnp.float32) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(
            multihead_attention(q, k, v, scale=scale).astype(jnp.float32) ** 2
        )

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_flash, g_ref):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0.1, atol=0.1,
        )


def test_flash_bf16_fast_path_matches_fp32_reference():
    """The bf16 kernels run an exp2-domain softmax with scale*log2e folded
    into q (one fewer VPU pass over the t^2 scores). Values and gradients
    must still match the fp32 XLA reference to bf16 resolution."""
    import jax

    rs = np.random.RandomState(7)
    q, k, v = (jnp.array(rs.randn(2, 4, 128, 32), jnp.bfloat16)
               for _ in range(3))
    scale = 32 ** -0.5
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    ref = multihead_attention(qf, kf, vf, scale=scale)
    got = flash_attention(q, k, v, scale=scale, block_q=64, block_k=64,
                          interpret=True)
    assert np.abs(np.asarray(got, np.float32) - np.asarray(ref)).max() < 0.03

    w = jnp.array(rs.randn(2, 4, 128, 32), jnp.float32)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, scale=scale, block_q=64, block_k=64,
                            interpret=True)
        return jnp.sum(o.astype(jnp.float32) * w)

    def loss_ref(q, k, v):
        return jnp.sum(
            multihead_attention(
                q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32), scale=scale,
            ) * w
        )

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        e = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max()
        assert e < 0.06 * max(np.abs(np.asarray(b)).max(), 1.0), e


def test_flash_bthd_matches_bhtd():
    """The layout-native (b, t, h, d) entry point must agree with the classic
    (b, h, t, d) kernel and the XLA reference, values and gradients."""
    import jax

    from attention_models_tpu.ops.flash_attention import flash_attention_bthd

    rs = np.random.RandomState(11)
    b, h, t, d = 2, 4, 128, 32
    q4 = jnp.array(rs.randn(b, t, h, d), jnp.float32)
    k4 = jnp.array(rs.randn(b, t, h, d), jnp.float32)
    v4 = jnp.array(rs.randn(b, t, h, d), jnp.float32)
    scale = d ** -0.5
    ref = multihead_attention(
        jnp.swapaxes(q4, 1, 2), jnp.swapaxes(k4, 1, 2),
        jnp.swapaxes(v4, 1, 2), scale=scale,
    )
    got = flash_attention_bthd(q4, k4, v4, scale=scale, block_q=64,
                               block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(got, 1, 2)),
                               np.asarray(ref), atol=2e-4, rtol=2e-4)

    # causal + gradients
    cm = make_causal_mask(t, t)
    w = jnp.array(rs.randn(b, t, h, d), jnp.float32)

    def loss_bthd(q, k, v):
        o = flash_attention_bthd(q, k, v, scale=scale, causal=True,
                                 block_q=64, block_k=64, interpret=True)
        return jnp.sum(o * w)

    def loss_ref(q, k, v):
        o = multihead_attention(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
            jnp.swapaxes(v, 1, 2), scale=scale, causal_mask=cm,
        )
        return jnp.sum(jnp.swapaxes(o, 1, 2) * w)

    gb = jax.grad(loss_bthd, argnums=(0, 1, 2))(q4, k4, v4)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q4, k4, v4)
    for a, bb in zip(gb, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_flash_bthd_kv_packed_matches_separate():
    """The packed-kv entry point (k/v as one (b, t, 2, h, d) operand — the
    fused wkv projection's own layout) must agree with the separate-k/v
    kernel: values and all three gradients, plain and causal."""
    import jax

    from attention_models_tpu.ops.flash_attention import (
        flash_attention_bthd,
        flash_attention_bthd_kv,
    )

    rs = np.random.RandomState(13)
    b, h, t, d = 2, 4, 128, 32
    q4 = jnp.array(rs.randn(b, t, h, d), jnp.float32)
    kv5 = jnp.array(rs.randn(b, t, 2, h, d), jnp.float32)
    scale = d ** -0.5
    w = jnp.array(rs.randn(b, t, h, d), jnp.float32)

    for causal in (False, True):
        got = flash_attention_bthd_kv(q4, kv5, scale=scale, causal=causal,
                                      block_q=64, block_k=64, interpret=True)
        want = flash_attention_bthd(q4, kv5[:, :, 0], kv5[:, :, 1],
                                    scale=scale, causal=causal,
                                    block_q=64, block_k=64, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

        def loss_packed(q, kv):
            o = flash_attention_bthd_kv(q, kv, scale=scale, causal=causal,
                                        block_q=64, block_k=64,
                                        interpret=True)
            return jnp.sum(o * w)

        def loss_sep(q, kv):
            o = flash_attention_bthd(q, kv[:, :, 0], kv[:, :, 1],
                                     scale=scale, causal=causal,
                                     block_q=64, block_k=64, interpret=True)
            return jnp.sum(o * w)

        gp = jax.grad(loss_packed, argnums=(0, 1))(q4, kv5)
        gs = jax.grad(loss_sep, argnums=(0, 1))(q4, kv5)
        for a, bb in zip(gp, gs):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       atol=1e-5, rtol=1e-5)


def test_flash_causal_rejects_tq_gt_tk():
    """Regression: causal with tq > tk leaves the first tq-tk rows with zero
    visible keys under the bottom-right-aligned mask — the kernel would
    silently emit NaN (0/0). Must fail loudly at trace time instead."""
    import pytest

    from attention_models_tpu.ops.flash_attention import (
        flash_attention_bthd,
        flash_attention_bthd_kv,
    )

    q = jnp.array(_rand(1, 2, 256, 32, seed=40))
    k = jnp.array(_rand(1, 2, 128, 32, seed=41))
    with pytest.raises(ValueError, match="tq <= tk"):
        flash_attention(q, k, k, causal=True, interpret=True)
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    with pytest.raises(ValueError, match="tq <= tk"):
        flash_attention_bthd(qt, kt, kt, causal=True, interpret=True)
    with pytest.raises(ValueError, match="tq <= tk"):
        flash_attention_bthd_kv(
            qt, jnp.stack([kt, kt], axis=2), causal=True, interpret=True
        )


def test_explicit_use_flash_still_honors_masks():
    """Regression: SoftmaxAttention(use_flash=True) called with explicit
    mask tensors routed to the mask-less flash kernel, silently attending to
    padding/future tokens. The dispatch must fall back to the XLA path
    (which also makes this test runnable on CPU — the Pallas kernel would
    simply crash here)."""
    from attention_models_tpu.models.attention import SoftmaxAttention

    x = jnp.array(np.random.RandomState(42).randn(2, 128, 32).astype(np.float32))
    cmask = jnp.array(np.random.RandomState(43).rand(2, 128) > 0.3)
    flash_mod = SoftmaxAttention(dim=32, num_heads=2, dim_head=16, use_flash=True)
    xla_mod = SoftmaxAttention(dim=32, num_heads=2, dim_head=16, use_flash=False)
    params = xla_mod.init(jax.random.key(0), x)  # init maskless via XLA
    got = flash_mod.apply(params, x, context_mask=cmask)
    want = xla_mod.apply(params, x, context_mask=cmask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)
