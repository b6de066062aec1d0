"""Reconstruction / generation quality metrics for the baseline measurement
plan (BASELINE.md: index-match rate, recon PSNR / LPIPS vs reference
outputs)."""

from __future__ import annotations

import jax.numpy as jnp


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio per batch element over (c, h, w)."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2,
                   axis=(-3, -2, -1))
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def index_match_rate(idx_a: jnp.ndarray, idx_b: jnp.ndarray) -> jnp.ndarray:
    """Fraction of identical codebook indices (the bit-match fidelity metric
    vs the released VitVQGAN.pt, SURVEY.md §3.4)."""
    return jnp.mean((idx_a == idx_b).astype(jnp.float32))


def lpips_distance(lpips_module, lpips_params, a, b) -> jnp.ndarray:
    """Perceptual distance via the flax LPIPS tower (published LPIPS only
    with converted pretrained weights — see training/losses.py)."""
    return lpips_module.apply(lpips_params, a, b)


# --------------------------------------------------------------------------- #
# FID (Fréchet distance over deep features)
# --------------------------------------------------------------------------- #
# The canonical FID uses InceptionV3 pool3 features; that artifact is not
# available offline, so the shipped extractor is the native VGG16 tower the
# LPIPS loss already carries (relu5_3, global-avg-pooled) — a "VGG-FID".
# Same Fréchet math, comparable across evals of one run / between runs of
# this framework; swap in converted Inception features for the published
# scale. (The reference logs no generation metric at all — its eval renders
# grids only, /root/reference/trainers/vitgqgan.py:211-231.)


def vgg_fid_features(lpips_params, imgs, dtype=jnp.float32) -> jnp.ndarray:
    """(b, 512) pooled relu5_3 features from the LPIPS VGG16 tower.

    ``imgs`` are NCHW in [0, 1] (the trainers' image convention);
    ``lpips_params`` is the LPIPS variable dict (the ``vgg`` subtree is
    reused, the 1x1 lin heads are not)."""
    from attention_models_tpu.training.losses import (
        _SCALE, _SHIFT, VGG16Features,
    )

    x = jnp.transpose(imgs.astype(dtype), (0, 2, 3, 1)) * 2.0 - 1.0
    x = (x - _SHIFT.astype(dtype)) / _SCALE.astype(dtype)
    taps = VGG16Features(dtype=dtype).apply(
        {"params": lpips_params["params"]["vgg"]}, x
    )
    return jnp.mean(taps[-1], axis=(1, 2))


def inception_fid_features(variables, imgs) -> jnp.ndarray:
    """(b, 2048) InceptionV3 pool3 features — the PUBLISHED FID feature
    space, available once a pytorch-fid/torchvision inception checkpoint is
    converted (utils/torch_convert.convert_inception_fid; the offline
    default is the VGG stand-in above). ``imgs``: NCHW in [0, 1]."""
    from attention_models_tpu.models.inception import InceptionV3Features

    return InceptionV3Features().apply(variables, imgs)


def feature_stats(feats):
    """(mu, cov) of an (n, d) feature matrix in float64 (host numpy)."""
    import numpy as np

    f = np.asarray(feats, np.float64)
    mu = f.mean(axis=0)
    if f.shape[0] < 2:  # np.cov would emit NaN (ddof=1); define cov as 0
        return mu, np.zeros((f.shape[1], f.shape[1]))
    cov = np.cov(f, rowvar=False)
    return mu, np.atleast_2d(cov)


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6) -> float:
    """Fréchet distance between two Gaussians:
    ``|mu1-mu2|^2 + tr(c1 + c2 - 2 sqrtm(c1 c2))``. The matrix sqrt runs on
    host (scipy); a jittered retry covers near-singular covariances (small
    eval sets have rank < d — fine for a relative metric)."""
    import warnings

    import numpy as np
    import scipy.linalg

    mu1, mu2 = np.asarray(mu1, np.float64), np.asarray(mu2, np.float64)
    cov1 = np.atleast_2d(np.asarray(cov1, np.float64))
    cov2 = np.atleast_2d(np.asarray(cov2, np.float64))
    diff = mu1 - mu2
    with warnings.catch_warnings():
        # singular-matrix warnings are the NORM for n < d eval sets; the
        # jittered retry below is the handling
        warnings.simplefilter("ignore")
        covmean, _ = scipy.linalg.sqrtm(cov1 @ cov2, disp=False)
        if not np.isfinite(covmean).all():
            offset = np.eye(cov1.shape[0]) * eps
            covmean, _ = scipy.linalg.sqrtm(
                (cov1 + offset) @ (cov2 + offset), disp=False
            )
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    # the true distance is non-negative; sqrtm roundoff can push
    # near-identical feature sets slightly below zero
    return max(0.0, float(
        diff @ diff + np.trace(cov1) + np.trace(cov2) - 2.0 * np.trace(covmean)
    ))


def fid_score(feats_a, feats_b) -> float:
    """FID between two (n, d) feature sets (order-invariant)."""
    return frechet_distance(*feature_stats(feats_a), *feature_stats(feats_b))
