"""Quality metrics: PSNR, index-match, and the VGG-FID added in round 2.

The reference framework logs no quantitative generation metric at all (its
eval renders image grids only — /root/reference/trainers/vitgqgan.py:211-231);
FID here follows the standard Fréchet formulation with the native VGG16
feature tower standing in for Inception (offline environment).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attention_models_tpu.utils.eval_metrics import (
    feature_stats,
    fid_score,
    frechet_distance,
    index_match_rate,
    psnr,
    vgg_fid_features,
)


def test_psnr_known_value():
    a = np.zeros((2, 3, 8, 8), np.float32)
    b = np.full_like(a, 0.1)  # mse = 0.01 -> psnr = 20 dB
    np.testing.assert_allclose(np.asarray(psnr(a, b)), 20.0, atol=1e-4)


def test_index_match_rate():
    a = np.array([[1, 2, 3, 4]])
    b = np.array([[1, 2, 0, 4]])
    assert float(index_match_rate(a, b)) == 0.75


def test_frechet_distance_analytic():
    """Closed form for diagonal Gaussians: |dmu|^2 + sum (sqrt(s1)-sqrt(s2))^2
    (variances s on the diagonal)."""
    d = 5
    mu1, mu2 = np.zeros(d), np.full(d, 2.0)
    s1, s2 = np.full(d, 1.0), np.full(d, 4.0)
    got = frechet_distance(mu1, np.diag(s1), mu2, np.diag(s2))
    expected = np.sum((mu1 - mu2) ** 2) + np.sum(
        (np.sqrt(s1) - np.sqrt(s2)) ** 2
    )
    np.testing.assert_allclose(got, expected, rtol=1e-8)


def test_fid_identical_and_ordering():
    rs = np.random.RandomState(0)
    f = rs.randn(256, 16)
    assert abs(fid_score(f, f)) < 1e-8
    near = fid_score(f, f + 0.05 * rs.randn(256, 16))
    far = fid_score(f, f + 3.0 + rs.randn(256, 16))
    assert 0 <= near < far


def test_fid_rank_deficient_does_not_blow_up():
    # fewer samples than feature dims (the small-eval-set case): the
    # jittered sqrtm retry must return a finite non-negative value
    rs = np.random.RandomState(1)
    a, b = rs.randn(10, 64), rs.randn(10, 64) + 1.0
    v = fid_score(a, b)
    assert np.isfinite(v) and v >= 0


def test_feature_stats_shapes():
    mu, cov = feature_stats(np.ones((7, 3)))
    assert mu.shape == (3,) and cov.shape == (3, 3)


@pytest.mark.slow
def test_vgg_fid_features_shape_and_signal():
    """Pooled relu5_3 features: (b, 512); identical images give identical
    features, different images differ (randomly-initialized tower is enough
    to carry signal — pretrained weights only change the embedding)."""
    from attention_models_tpu.training.losses import LPIPS

    imgs = jnp.asarray(np.random.RandomState(2).rand(2, 3, 32, 32), jnp.float32)
    params = LPIPS().init(jax.random.key(0), imgs, imgs)
    feats = np.asarray(vgg_fid_features(params, imgs))
    assert feats.shape == (2, 512)
    assert np.isfinite(feats).all()
    again = np.asarray(vgg_fid_features(params, imgs))
    np.testing.assert_array_equal(feats, again)
    other = np.asarray(vgg_fid_features(params, imgs[::-1]))
    assert not np.array_equal(feats[0], other[0])


def test_fid_single_sample_defined():
    # n=1 per side: cov degenerates to 0 -> FID reduces to |mu_a - mu_b|^2
    a, b = np.zeros((1, 4)), np.full((1, 4), 2.0)
    np.testing.assert_allclose(fid_score(a, b), 16.0, rtol=1e-12)
