import jax.numpy as jnp
import numpy as np
import torch

from attention_models_tpu.ops.moe import (
    moe_linear_dense,
    moe_linear_scatter,
    topk_gate,
)


def torch_reference_moe(x, w, b, gate_w, gate_b, k, weighted=True):
    """The reference MoELayer loop semantics (moe.py:25-37) in torch."""
    xt = torch.from_numpy(x)
    gate_logits = xt @ torch.from_numpy(gate_w) + torch.from_numpy(gate_b)
    weights, selected = torch.topk(gate_logits, k)
    weights = torch.sigmoid(weights)
    bsz, t, d_out = x.shape[0], x.shape[1], w.shape[2]
    results = torch.zeros(bsz, t, d_out)
    for i in range(w.shape[0]):
        bi, ti, nth = torch.where(selected == i)
        expert_out = xt[bi, ti] @ torch.from_numpy(w[i]) + torch.from_numpy(b[i])
        if weighted:
            results[bi, ti] += weights[bi, ti, nth, None] * expert_out
        else:
            results[bi, ti] += expert_out
    return gate_logits.numpy(), results.numpy()


def _setup(e=6, k=2, b=2, t=10, d=16, seed=0):
    rs = np.random.RandomState(seed)
    x = rs.randn(b, t, d).astype(np.float32)
    w = rs.randn(e, d, d).astype(np.float32) * 0.1
    bias = rs.randn(e, d).astype(np.float32) * 0.1
    gw = rs.randn(d, e).astype(np.float32)
    gb = rs.randn(e).astype(np.float32)
    return x, w, bias, gw, gb


def test_topk_gate_matches_torch():
    x, w, bias, gw, gb = _setup()
    gate_logits = x @ gw + gb
    ours_w, ours_sel = topk_gate(jnp.array(gate_logits), 2)
    tw, tsel = torch.topk(torch.from_numpy(gate_logits), 2)
    np.testing.assert_array_equal(np.asarray(ours_sel), tsel.numpy())
    np.testing.assert_allclose(
        np.asarray(ours_w), torch.sigmoid(tw).numpy(), rtol=1e-6, atol=1e-6
    )


def test_dense_dispatch_matches_torch_loop():
    x, w, bias, gw, gb = _setup()
    gate_logits = jnp.array(x @ gw + gb)
    wts, sel = topk_gate(gate_logits, 2)
    ours = moe_linear_dense(jnp.array(x), jnp.array(w), sel, wts, jnp.array(bias))
    _, ref = torch_reference_moe(x, w, bias, gw, gb, 2, weighted=True)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_scatter_dispatch_matches_dense():
    x, w, bias, gw, gb = _setup(e=16, seed=1)
    gate_logits = jnp.array(x @ gw + gb)
    wts, sel = topk_gate(gate_logits, 2)
    dense = moe_linear_dense(jnp.array(x), jnp.array(w), sel, wts, jnp.array(bias))
    scat = moe_linear_scatter(
        jnp.array(x), jnp.array(w), sel, wts, jnp.array(bias), capacity_factor=None
    )
    np.testing.assert_allclose(np.asarray(scat), np.asarray(dense), rtol=1e-4, atol=1e-4)


def test_unweighted_dispatch_matches_torch_loop():
    # the SwitchHead moe_out quirk: no combine weights (SURVEY §2.9#8)
    x, w, bias, gw, gb = _setup(seed=2)
    bias = np.zeros_like(bias)  # reference experts_out have no bias
    gate_logits = jnp.array(x @ gw + gb)
    _, sel = topk_gate(gate_logits, 2)
    ours = moe_linear_dense(jnp.array(x), jnp.array(w), sel, None, None)
    _, ref = torch_reference_moe(x, w, bias, gw, gb, 2, weighted=False)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_scatter_capacity_drops_only_overflow_tokens():
    """Regression (round-1 advisor): with a finite capacity, the (token, slot)
    pairs beyond capacity must be dropped WITHOUT clobbering the valid token
    occupying the bucket's last slot. Route 8 tokens to one expert with
    capacity 4: tokens 0-3 keep their outputs, 4-7 are zeroed."""
    n, d, e = 8, 4, 2
    x = np.arange(1, n * d + 1, dtype=np.float32).reshape(1, n, d)
    w = np.stack([np.eye(d, dtype=np.float32),
                  np.zeros((d, d), np.float32)])
    sel = jnp.zeros((1, n, 1), jnp.int32)  # everyone picks expert 0
    # capacity = cf * n * k / e = 1.0 * 8 * 1 / 2 = 4
    out = np.asarray(moe_linear_scatter(
        jnp.array(x), jnp.array(w), sel, None, capacity_factor=1.0
    ))
    np.testing.assert_allclose(out[0, :4], x[0, :4], rtol=1e-6)
    np.testing.assert_array_equal(out[0, 4:], np.zeros((4, d), np.float32))


def test_scatter_capacity_rounds_up_like_ep_path():
    """Regression: scatter sized capacity with truncating int() while the EP
    path uses ceil — cf=1.0, n=5, k=1, e=2 must give capacity ceil(2.5)=3,
    so token 2 (the 3rd routed to expert 0) survives."""
    n, d = 5, 4
    x = np.arange(1, n * d + 1, dtype=np.float32).reshape(1, n, d)
    w = np.stack([np.eye(d, dtype=np.float32), np.zeros((d, d), np.float32)])
    sel = jnp.zeros((1, n, 1), jnp.int32)  # everyone picks expert 0
    out = np.asarray(moe_linear_scatter(
        jnp.array(x), jnp.array(w), sel, None, capacity_factor=1.0
    ))
    np.testing.assert_allclose(out[0, :3], x[0, :3], rtol=1e-6)
    np.testing.assert_array_equal(out[0, 3:], np.zeros((2, d), np.float32))
