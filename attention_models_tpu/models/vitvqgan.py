"""ViTVQGAN image tokenizer (arXiv 2110.04627; API parity with
/root/reference/models/vitvqgan.py:77-215).

Pipeline: patchify → ViT encoder → pre_quant Linear(dim→codebook_dim) →
L2-normalized codebook (fused Pallas nearest-neighbor lookup) → post_quant →
ViT decoder → un-patchify.

Notes against the reference:
  - Its FeedForward class is broken at this snapshot (TypeError on
    construction, SURVEY.md §2.9#1); the repaired FFN follows the xFormers
    MLP the signature was copied from: Linear(dim, hidden) → GELU →
    Linear(hidden, dim), bias=True, hidden = (int(mlp_dim·2/3)+7)//8·8.
  - Codebook (ViT variant, vitvqgan.py:140-176): normal-init embeddings,
    L2-norm on z, on the table and on every lookup; loss
    β·mean((sg[z_q]−z)²) + mean((z_q−sg[z])²)  (β on the FIRST term — the
    CNN VQGAN swaps this, §2.9#7); straight-through estimator.
  - Quantizer distances/argmin run in float32 with first-lowest tie-breaking
    for bit-fidelity to the released VitVQGAN.pt (§3.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from attention_models_tpu.models.attention import SoftmaxAttention
from attention_models_tpu.models.layers import (
    LayerNorm,
    Mlp,  # noqa: F401 (re-export for ckpt-compat tooling)
    ln_mlp_block,
    xformers_hidden,
)
from attention_models_tpu.models.vit import PatchEmbedding
from attention_models_tpu.ops.codebook import l2_normalize, nearest_codes


class ViTVQGANBlock(nn.Module):
    """Pre-LN block with standard LayerNorm (the reference uses nn.LayerNorm
    here, vitvqgan.py:44-45)."""

    dim: int
    n_heads: int
    d_head: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    quant: str | None = None  # "int8": W8A8 inference path (ops/quant.py)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = LayerNorm(self.dim, dtype=self.dtype, name="norm1")(x)
        x = x + SoftmaxAttention(
            self.dim, self.n_heads, self.d_head, self.dropout,
            dtype=self.dtype, quant=self.quant, name="self_attn",
        )(h, deterministic=deterministic)
        # norm2 + Mlp + residual fuse into one Pallas kernel on the TPU bf16
        # path (ops/ffn.py::fused_ln_mlp); identical module composition and
        # param paths otherwise.
        x = ln_mlp_block(
            x, dim=self.dim, hidden_dim=xformers_hidden(self.mlp_dim),
            dtype=self.dtype, norm_name="norm2", mlp_name="mlp",
            deterministic=deterministic, dropout=0.0, quant=self.quant,
        )
        return x


class ViTEncoder(nn.Module):
    dim: int
    img_size: int
    patch_size: int
    n_heads: int
    d_head: int
    depth: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    quant: str | None = None  # "int8": W8A8 inference path

    @nn.compact
    def __call__(self, imgs, deterministic: bool = True):
        num_patches = (self.img_size // self.patch_size) ** 2
        x = PatchEmbedding(self.dim, self.patch_size, dtype=self.dtype,
                           name="patch_embed")(imgs)
        pos_enc = self.param(
            "pos_enc", nn.initializers.normal(1.0),
            (1, num_patches, self.dim), jnp.float32,
        )
        x = pos_enc.astype(x.dtype) + x
        x = LayerNorm(self.dim, dtype=self.dtype, name="pre_norm")(x)
        for i in range(self.depth):
            x = ViTVQGANBlock(
                self.dim, self.n_heads, self.d_head, self.mlp_dim, self.dropout,
                dtype=self.dtype, quant=self.quant, name=f"layers_{i}",
            )(x, deterministic=deterministic)
        return x


class ViTDecoder(nn.Module):
    dim: int
    img_size: int
    patch_size: int
    n_heads: int
    d_head: int
    depth: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    quant: str | None = None  # "int8": W8A8 inference path

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        num_patches = (self.img_size // self.patch_size) ** 2
        pos_enc = self.param(
            "pos_enc", nn.initializers.normal(1.0),
            (1, num_patches, self.dim), jnp.float32,
        )
        x = x + pos_enc.astype(x.dtype)
        x = LayerNorm(self.dim, dtype=self.dtype, name="pre_norm")(x)
        for i in range(self.depth):
            x = ViTVQGANBlock(
                self.dim, self.n_heads, self.d_head, self.mlp_dim, self.dropout,
                dtype=self.dtype, quant=self.quant, name=f"layers_{i}",
            )(x, deterministic=deterministic)
        x = nn.Dense(self.patch_size ** 2 * 3, dtype=self.dtype, name="fc")(x)
        return rearrange(
            x, "b (h w) (p1 p2 c) -> b c (h p1) (w p2)",
            p1=self.patch_size, p2=self.patch_size,
            h=self.img_size // self.patch_size,
        )


class Codebook(nn.Module):
    """L2-normalized VQ codebook (improved-VQGAN), ViT variant semantics."""

    codebook_size: int = 8192
    codebook_dim: int = 32
    beta: float = 0.25

    def setup(self):
        self.embedding = self.param(
            "embedding", nn.initializers.normal(1.0),
            (self.codebook_size, self.codebook_dim), jnp.float32,
        )

    def nearest(self, z: jnp.ndarray) -> jnp.ndarray:
        """z: (..., d) — returns int32 indices with the reference's exact
        distance math (fp32, L2-normed z and table, first-lowest argmin).

        When ``z`` arrives in bfloat16 (the model tower runs bf16, so ``z``
        already carries bf16 rounding), the distance dots run on bf16
        operands with f32 accumulation — exact-fp32 dots over bf16-derived
        inputs add six MXU passes and no fidelity. The golden bit-match
        path (fp32 model, inference/vitvqgan.py) is unaffected."""
        zn = l2_normalize(z.astype(jnp.float32))
        en = l2_normalize(self.embedding)
        flat = zn.reshape(-1, self.codebook_dim)
        dot_dtype = jnp.bfloat16 if z.dtype == jnp.bfloat16 else None
        idx = nearest_codes(flat, en, dot_dtype=dot_dtype)
        return idx.reshape(z.shape[:-1])

    def __call__(self, z):
        zn = l2_normalize(z.astype(jnp.float32))
        indices = self.nearest(z)
        z_q = l2_normalize(self.embedding[indices])
        loss = self.beta * jnp.mean(
            (jax.lax.stop_gradient(z_q) - zn) ** 2
        ) + jnp.mean((z_q - jax.lax.stop_gradient(zn)) ** 2)
        z_q = zn + jax.lax.stop_gradient(z_q - zn)  # straight-through
        return z_q.astype(z.dtype), indices, loss

    def indices_to_embeddings(self, indices):
        return l2_normalize(self.embedding[indices])


class ViTVQGAN(nn.Module):
    """vit_params / codebook_params mirror the reference constructor
    (vitvqgan.py:181-188)."""

    vit_params: dict
    codebook_params: dict
    dtype: jnp.dtype = jnp.float32
    quant: str | None = None  # "int8": W8A8 inference (codebook stays fp32)

    def setup(self):
        vp = dict(self.vit_params)
        vp["dtype"] = self.dtype
        vp["quant"] = self.quant
        self.encoder = ViTEncoder(**vp)
        self.pre_quant = nn.Dense(
            self.codebook_params["codebook_dim"], dtype=self.dtype
        )
        self.codebook = Codebook(**self.codebook_params)
        self.post_quant = nn.Dense(self.vit_params["dim"], dtype=self.dtype)
        self.decoder = ViTDecoder(**vp)

    def __call__(self, imgs, deterministic: bool = True):
        z = self.encoder(imgs, deterministic=deterministic)
        z = self.pre_quant(z)
        embeds, _, loss = self.codebook(z)
        embeds = self.post_quant(embeds.astype(self.dtype))
        rec = self.decoder(embeds, deterministic=deterministic)
        return rec, loss

    def encode_imgs(self, imgs):
        z = self.encoder(imgs)
        z = self.pre_quant(z)
        return self.codebook.nearest(z)

    def decode_indices(self, indices):
        embeds = self.codebook.indices_to_embeddings(indices)
        embeds = self.post_quant(embeds.astype(self.dtype))
        return self.decoder(embeds)

    @property
    def num_patches(self):
        return (self.vit_params["img_size"] // self.vit_params["patch_size"]) ** 2


def vitvqgan_base(img_size: int = 256, dtype=jnp.float32,
                  quant: str | None = None) -> ViTVQGAN:
    """The released-checkpoint configuration (cfg/vitvqgan.yaml:18-27,
    inference/vitvqgan.py:35-44): dim 512, patch 8, depth 6, mlp 2048,
    codebook 8192x32."""
    return ViTVQGAN(
        vit_params=dict(
            dim=512, img_size=img_size, patch_size=8, n_heads=8, d_head=64,
            depth=6, mlp_dim=2048, dropout=0.0,
        ),
        codebook_params=dict(codebook_size=8192, codebook_dim=32, beta=0.25),
        dtype=dtype,
        quant=quant,
    )
