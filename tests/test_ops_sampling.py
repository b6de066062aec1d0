import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from attention_models_tpu.ops.sampling import (
    cosine_schedule,
    cross_entropy_ignore_index,
    filter_logits,
    gumbel_argmax,
    lowest_score_mask,
    mask_fill_inputs_and_targets,
    random_mask,
)


def torch_filter_logits(logits, p=0.9):
    """/root/reference/models/muse.py:20-26"""
    lt = torch.from_numpy(logits)
    n_classes = lt.shape[-1]
    k = math.ceil((1 - p) * n_classes)
    val, ind = lt.topk(k, dim=-1)
    filtered = torch.full_like(lt, float("-inf"))
    filtered.scatter_(2, ind, val)
    return filtered.numpy()


def test_filter_logits_matches_torch():
    logits = np.random.RandomState(0).randn(2, 5, 100).astype(np.float32)
    ours = np.asarray(filter_logits(jnp.array(logits), p=0.9))
    ref = torch_filter_logits(logits, p=0.9)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_cosine_schedule():
    t = jnp.array([0.0, 0.5, 1.0])
    got = np.asarray(cosine_schedule(t))
    np.testing.assert_allclose(got, [1.0, math.cos(math.pi / 4), 0.0], atol=1e-6)


def test_gumbel_argmax_greedy_at_zero_temperature():
    logits = jnp.array(np.random.RandomState(1).randn(4, 10, 50).astype(np.float32))
    ids = gumbel_argmax(jax.random.key(0), logits, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(ids), np.argmax(np.asarray(logits), -1))


def test_gumbel_argmax_samples_at_high_temperature():
    logits = jnp.zeros((1, 1, 100))
    ids = [
        int(gumbel_argmax(jax.random.key(i), logits, 1.0)[0, 0]) for i in range(20)
    ]
    assert len(set(ids)) > 5  # actually random


def test_random_mask_rate_and_minimum():
    mask = random_mask(jax.random.key(0), 64, 256)
    per_row = np.asarray(mask).sum(axis=1)
    assert per_row.min() >= 1
    # cosine schedule of uniform t averages 2/pi ≈ 0.63
    assert 0.4 < per_row.mean() / 256 < 0.85


def test_mask_fill_inputs_and_targets():
    idx = jnp.array([[5, 6, 7, 8]])
    mask = jnp.array([[True, False, True, False]])
    inp, tgt = mask_fill_inputs_and_targets(idx, mask, mask_token_id=99)
    np.testing.assert_array_equal(np.asarray(inp), [[99, 6, 99, 8]])
    np.testing.assert_array_equal(np.asarray(tgt), [[5, -1, 7, -1]])


def test_lowest_score_mask():
    scores = jnp.array([[0.5, 0.1, 0.9, 0.1]])
    mask = lowest_score_mask(scores, jnp.array(2))
    # two lowest: positions 1 and 3 (tie at 0.1 resolved stably)
    np.testing.assert_array_equal(np.asarray(mask), [[False, True, False, True]])


def test_cross_entropy_ignore_index_matches_torch():
    rs = np.random.RandomState(2)
    logits = rs.randn(2, 6, 11).astype(np.float32)
    targets = rs.randint(0, 11, (2, 6))
    targets[0, :3] = -1
    ours = float(cross_entropy_ignore_index(jnp.array(logits), jnp.array(targets)))
    ref = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits).permute(0, 2, 1),
        torch.from_numpy(targets),
        ignore_index=-1,
    ).item()
    assert abs(ours - ref) < 1e-5


def test_sample_topk_filtered_equivalence():
    """Shortlist sampler == gumbel_argmax(filter_logits(...)) at temperature
    0 (deterministic argmax of the filtered logits), and the returned chosen
    logit matches the prediction's logit."""
    import numpy as np

    rs = np.random.RandomState(0)
    logits = jnp.array(rs.randn(4, 16, 64).astype(np.float32))
    from attention_models_tpu.ops.sampling import sample_topk_filtered

    pred, chosen = sample_topk_filtered(jax.random.key(1), logits, p=0.9,
                                        temperature=0.0)
    ref = gumbel_argmax(jax.random.key(1), filter_logits(logits, 0.9), 0.0)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(ref))
    np.testing.assert_allclose(
        np.asarray(chosen),
        np.take_along_axis(np.asarray(logits),
                           np.asarray(pred)[..., None], -1)[..., 0],
        rtol=1e-6,
    )


def test_sample_topk_filtered_respects_filter():
    """Sampled ids must always come from the top-k kept set, at any temp."""
    import numpy as np

    rs = np.random.RandomState(1)
    logits = jnp.array(rs.randn(2, 8, 32).astype(np.float32))
    from attention_models_tpu.ops.sampling import sample_topk_filtered

    k = int(np.ceil((1 - 0.9) * 32))
    top = np.argsort(np.asarray(logits), -1)[..., ::-1][..., :k]
    for i in range(5):
        pred, _ = sample_topk_filtered(jax.random.key(i), logits, p=0.9,
                                       temperature=5.0)
        in_top = (np.asarray(pred)[..., None] == top).any(-1)
        assert in_top.all()


def test_kth_value_bisect_superset_of_topk():
    """The bisection threshold keeps AT LEAST the true top-k (full recall),
    and with distinct values converges to exactly the top-k set."""
    from attention_models_tpu.ops.sampling import kth_value_bisect

    rs = np.random.RandomState(42)
    x = jnp.array(rs.randn(4, 64, 512), jnp.float32)
    k = 52  # ceil(0.1 * 512)
    kth = kth_value_bisect(x, k)
    counts = np.asarray(jnp.sum(x >= kth[..., None], axis=-1))
    assert (counts >= k).all(), counts.min()
    # distinct random floats: converges to exactly k after 16 iterations
    assert (counts <= k + 1).all(), counts.max()
    # threshold equals the exact k-th largest value (within the bracket)
    exact_kth = np.asarray(jax.lax.top_k(x, k)[0][..., -1])
    assert np.all(np.asarray(kth) <= exact_kth + 1e-5)


def test_sample_topk_filtered_approx_matches_exact_at_t0():
    """temperature=0: both modes are greedy argmax (always in the top-k)."""
    from attention_models_tpu.ops.sampling import sample_topk_filtered

    rs = np.random.RandomState(7)
    logits = jnp.array(rs.randn(8, 32, 256), jnp.float32)
    key = jax.random.key(0)
    p_e, c_e = sample_topk_filtered(key, logits, p=0.9, temperature=0.0,
                                    approx=False)
    p_a, c_a = sample_topk_filtered(key, logits, p=0.9, temperature=0.0,
                                    approx=True)
    np.testing.assert_array_equal(np.asarray(p_e), np.asarray(p_a))
    np.testing.assert_allclose(np.asarray(c_e), np.asarray(c_a), atol=1e-5)


def test_sample_topk_filtered_approx_stays_in_topk():
    """High temperature: every sampled id is inside the exact top-k set (the
    bisection threshold has full recall; distinct floats leave no extras)."""
    from attention_models_tpu.ops.sampling import sample_topk_filtered

    rs = np.random.RandomState(9)
    logits = jnp.array(rs.randn(4, 16, 256), jnp.float32)
    k = 26  # ceil(0.1 * 256)
    topk_idx = np.asarray(jax.lax.top_k(logits, k + 1)[1])
    pred, _ = sample_topk_filtered(jax.random.key(3), logits, p=0.9,
                                   temperature=4.0, approx=True)
    pred = np.asarray(pred)
    for b in range(pred.shape[0]):
        for t in range(pred.shape[1]):
            assert pred[b, t] in topk_idx[b, t], (b, t)


def test_sample_epilogue_fused_matches_reference_math():
    """The fused decode-epilogue kernel (CFG combine + bisect top-k +
    gumbel argmax + chosen-class softmax prob) must match the same math
    computed in plain JAX when fed the same noise bits (the in-kernel PRNG
    is exercised on TPU; interpret mode feeds bits via the test hook)."""
    import math as _math

    import jax
    from jax.experimental.pallas import tpu as pltpu

    from attention_models_tpu.ops.sampling import (
        kth_value_bisect,
        sample_epilogue_fused,
    )

    rs = np.random.RandomState(5)
    b, n, C = 2, 16, 256
    cond = jnp.array(rs.randn(b, n, C), jnp.float32)
    null = jnp.array(rs.randn(b, n, C), jnp.float32)
    bits = jnp.array(
        rs.randint(-(2 ** 31), 2 ** 31 - 1, (b, n, C)), jnp.int32
    )
    gs, p, temp = 3.0, 0.9, 0.35

    with pltpu.force_tpu_interpret_mode():
        pred, probs = sample_epilogue_fused(
            jax.random.key(0), cond, null,
            guidance_scale=gs, p=p, temperature=temp,
            interpret=True, _noise_bits=bits,
        )

    # reference: identical math in plain JAX
    x = null + gs * (cond - null)
    k = _math.ceil((1 - p) * C)
    kth = kth_value_bisect(x, k)[..., None]
    ubits = jax.lax.bitcast_convert_type(bits, jnp.uint32) >> jnp.uint32(8)
    u = ubits.astype(jnp.float32) * (2.0 ** -24) + 2.0 ** -25
    g = -jnp.log(-jnp.log(u))
    noised = jnp.where(x >= kth, x + temp * g, -jnp.inf)
    want_pred = jnp.argmax(noised, axis=-1).astype(jnp.int32)
    chosen = jnp.take_along_axis(x, want_pred[..., None], axis=-1)[..., 0]
    lse = jax.scipy.special.logsumexp(x, axis=-1)
    want_probs = jnp.exp(chosen - lse)

    np.testing.assert_array_equal(np.asarray(pred), np.asarray(want_pred))
    np.testing.assert_allclose(np.asarray(probs), np.asarray(want_probs),
                               rtol=1e-5, atol=1e-6)
    # sampled ids always come from the kept top-k superset
    keep = x >= kth
    picked_kept = jnp.take_along_axis(keep, pred[..., None], axis=-1)
    assert bool(jnp.all(picked_kept))


def test_sample_epilogue_fused_no_cfg():
    """MaskGIT path: plain logits, no null branch."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from attention_models_tpu.ops.sampling import sample_epilogue_fused

    rs = np.random.RandomState(6)
    logits = jnp.array(rs.randn(4, 8, 128), jnp.float32)
    bits = jnp.array(
        rs.randint(-(2 ** 31), 2 ** 31 - 1, (4, 8, 128)), jnp.int32
    )
    with pltpu.force_tpu_interpret_mode():
        pred, probs = sample_epilogue_fused(
            jax.random.key(1), logits,
            p=0.9, temperature=0.0, interpret=True, _noise_bits=bits,
        )
    # temperature 0 => greedy over the kept set == global argmax
    np.testing.assert_array_equal(
        np.asarray(pred), np.asarray(jnp.argmax(logits, -1).astype(jnp.int32))
    )
    sm = jax.nn.softmax(logits, axis=-1)
    want = jnp.take_along_axis(sm, pred[..., None], axis=-1)[..., 0]
    np.testing.assert_allclose(np.asarray(probs), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_filter_logits_exact_keeps_exactly_k_on_ties():
    """Regression: exact mode must keep exactly k survivors like the
    reference's topk+scatter (threshold-compare kept every tied class,
    letting sampling pick MORE classes than the reference build could).
    Tie selection among equal values is implementation-defined in torch, so
    the contract is count + surviving values, not indices."""
    rs = np.random.RandomState(7)
    # coarse grid forces many value collisions, including at the k-th value
    logits = (np.round(rs.randn(2, 5, 40) * 2) / 2).astype(np.float32)
    k = math.ceil((1 - 0.9) * 40)
    ours = np.asarray(filter_logits(jnp.array(logits), p=0.9))
    ref = torch_filter_logits(logits, p=0.9)
    np.testing.assert_array_equal(
        np.isfinite(ours).sum(axis=-1), np.full((2, 5), k)
    )
    np.testing.assert_array_equal(
        np.sort(ours, axis=-1)[..., -k:], np.sort(ref, axis=-1)[..., -k:]
    )


def test_filter_logits_approx_full_recall_bf16():
    """Regression: the bisection threshold must be compared in fp32 —
    rounding it to bf16 could round it up past the true k-th value and drop
    real top-k members."""
    rs = np.random.RandomState(11)
    logits = jnp.array(rs.randn(4, 256).astype(np.float32)).astype(jnp.bfloat16)
    k = math.ceil((1 - 0.9) * 256)
    out = np.asarray(
        filter_logits(logits, p=0.9, approx=True).astype(jnp.float32)
    )
    vals = np.asarray(logits.astype(jnp.float32))
    kth = np.sort(vals, axis=-1)[:, -k]  # true k-th largest per row
    assert np.all(np.isfinite(out)[vals >= kth[:, None]])
