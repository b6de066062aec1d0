import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from attention_models_tpu.ops.codebook import (
    _nearest_codes_pallas,
    _nearest_codes_xla,
    l2_normalize,
    nearest_codes,
)


def torch_reference_indices(z, codes):
    """The reference quantizer's distance+argmin (vitvqgan.py:151-161)."""
    zt, ct = torch.from_numpy(z), torch.from_numpy(codes)
    d = (
        torch.sum(zt ** 2, dim=1, keepdim=True)
        + torch.sum(ct ** 2, dim=1)
        - 2 * torch.einsum("bd,nd->bn", zt, ct)
    )
    return torch.argmin(d, dim=1).numpy()


def test_l2_normalize_matches_torch():
    x = np.random.RandomState(0).randn(64, 32).astype(np.float32)
    x[0] = 0.0  # eps path
    ours = np.asarray(l2_normalize(jnp.array(x)))
    ref = F.normalize(torch.from_numpy(x), p=2, dim=-1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_xla_nearest_matches_torch():
    rs = np.random.RandomState(1)
    z = rs.randn(512, 32).astype(np.float32)
    codes = rs.randn(1024, 32).astype(np.float32)
    ours = np.asarray(_nearest_codes_xla(jnp.array(z), jnp.array(codes)))
    ref = torch_reference_indices(z, codes)
    np.testing.assert_array_equal(ours, ref)


def test_pallas_nearest_matches_xla_interpreted():
    from jax.experimental.pallas import tpu as pltpu

    rs = np.random.RandomState(2)
    z = rs.randn(256, 32).astype(np.float32)
    codes = rs.randn(512, 32).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            _nearest_codes_pallas(
                jnp.array(z), jnp.array(codes), block_n=128, block_codes=128
            )
        )
    want = np.asarray(_nearest_codes_xla(jnp.array(z), jnp.array(codes)))
    np.testing.assert_array_equal(got, want)


def test_tie_breaking_first_lowest_index():
    # duplicate codes: argmin must pick the first occurrence, like torch
    codes = np.zeros((8, 4), dtype=np.float32)
    codes[2] = codes[5] = [1.0, 0, 0, 0]  # identical entries at 2 and 5
    z = np.array([[1.0, 0, 0, 0]], dtype=np.float32)
    got = np.asarray(nearest_codes(jnp.array(z), jnp.array(codes), use_pallas=False))
    assert got[0] == 2
    ref = torch_reference_indices(z, codes)
    assert ref[0] == 2


def test_normalized_codebook_roundtrip():
    rs = np.random.RandomState(3)
    codes = rs.randn(128, 16).astype(np.float32)
    zn = np.asarray(l2_normalize(jnp.array(codes[7:8])))
    idx = np.asarray(
        nearest_codes(
            jnp.array(zn), np.asarray(l2_normalize(jnp.array(codes))),
            use_pallas=False,
        )
    )
    assert idx[0] == 7

def test_bf16_dot_dtype_near_optimal():
    """dot_dtype=bfloat16 (the bf16-tower fast path: one MXU pass instead of
    the six-pass exact-fp32 decomposition) must pick codes whose TRUE fp32
    distance is within bf16 rounding of the exact minimum."""
    rs = np.random.RandomState(4)
    z = np.asarray(l2_normalize(jnp.array(
        rs.randn(256, 32).astype(np.float32))))
    codes = np.asarray(l2_normalize(jnp.array(
        rs.randn(512, 32).astype(np.float32))))
    got = np.asarray(nearest_codes(jnp.array(z), jnp.array(codes),
                                   use_pallas=False,
                                   dot_dtype=jnp.bfloat16))
    d = (
        np.sum(z ** 2, axis=1, keepdims=True)
        + np.sum(codes ** 2, axis=1)
        - 2.0 * z @ codes.T
    )
    best = d.min(axis=1)
    chosen = d[np.arange(len(z)), got]
    # unit vectors: distances are O(1); bf16 operand rounding perturbs the
    # dot by ~2^-8 relative, so any chosen code is within ~1e-2 of optimal
    assert np.all(chosen - best < 2e-2), (chosen - best).max()
    # and the overwhelming majority are exactly the argmin
    exact = np.asarray(nearest_codes(jnp.array(z), jnp.array(codes),
                                     use_pallas=False))
    assert (got == exact).mean() > 0.95


def test_codebook_module_bf16_fast_path_dispatch():
    """ViT Codebook.nearest keys the bf16 fast path off the incoming z dtype:
    fp32 z (the golden bit-match path) must NOT be rounded to bf16."""
    from attention_models_tpu.models.vitvqgan import Codebook

    rs = np.random.RandomState(5)
    cb = Codebook(codebook_size=64, codebook_dim=16)
    z32 = jnp.array(rs.randn(2, 8, 16).astype(np.float32))
    variables = cb.init(jax.random.key(0), z32)
    idx32 = cb.apply(variables, z32, method=Codebook.nearest)
    # fp32 path: indices equal the exact torch-style reference
    en = np.asarray(l2_normalize(variables["params"]["embedding"]))
    zn = np.asarray(l2_normalize(z32)).reshape(-1, 16)
    ref = torch_reference_indices(zn, en)
    np.testing.assert_array_equal(np.asarray(idx32).ravel(), ref)
    # bf16 path: near-optimal (not asserted equal — operands are rounded)
    idx16 = cb.apply(variables, z32.astype(jnp.bfloat16),
                     method=Codebook.nearest)
    assert np.asarray(idx16).shape == np.asarray(idx32).shape
    assert (np.asarray(idx16) == np.asarray(idx32)).mean() > 0.9
