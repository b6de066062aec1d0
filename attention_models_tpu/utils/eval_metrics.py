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
