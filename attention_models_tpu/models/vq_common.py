"""Shared frozen-VQ-tokenizer plumbing for the token-space generators.

``vq_config`` schema: {"kind": "vitvqgan" (default) | "vqgan", ...constructor
kwargs}. The reference hardcodes ViTVQGAN in Muse/MaskGIT and even ships dead
``muse_vqgan`` configs its factory can't build (SURVEY.md §2.7); here any
generator can sit on either tokenizer.
"""

from __future__ import annotations

import jax.numpy as jnp

from attention_models_tpu.models.vitvqgan import ViTVQGAN
from attention_models_tpu.models.vqgan import VQGAN


def build_vq(vq_config: dict, dtype=jnp.float32):
    cfg = dict(vq_config)
    kind = cfg.pop("kind", "vitvqgan")
    if kind == "vqgan":
        return VQGAN(**cfg, dtype=dtype)
    if kind == "vitvqgan":
        return ViTVQGAN(**cfg, dtype=dtype)
    raise ValueError(f"unknown vq kind {kind!r}")


def vq_codebook_size(vq_config: dict) -> int:
    if vq_config.get("kind", "vitvqgan") == "vqgan":
        return int(vq_config["codebook_size"])
    return int(vq_config["codebook_params"]["codebook_size"])


def vq_num_patches(vq_config: dict) -> int:
    if vq_config.get("kind", "vitvqgan") == "vqgan":
        return 16 * 16  # CNN encoder is hardcoded 256px/16x down (vqgan.py:130)
    vp = vq_config["vit_params"]
    return (vp["img_size"] // vp["patch_size"]) ** 2
