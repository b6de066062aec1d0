"""ViT classifier (API parity with /root/reference/models/vit.py:24-69).

Deviation (deliberate, SURVEY.md §2.9#3): the reference passes ``dropout``
into the Encoder's ``mult`` slot and attaches a dead ``feed_forward`` module,
so its ``mlp_dim`` knob does nothing and dropout=0 yields zero-width FFNs.
Here the documented API is honored: every block is SoftmaxAttention +
a plain GELU MLP of width ``mlp_dim`` with real dropout, with the
transformer.Encoder's gamma-only pre-LN scheme.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange, repeat

from attention_models_tpu.models.attention import SoftmaxAttention
from attention_models_tpu.models.layers import GammaLayerNorm, Mlp


def _patch_embed_fast(dtype) -> bool:
    """Gate for PatchEmbedding's conv-form fast path (tests monkeypatch
    this to exercise the fast path on the CPU mesh)."""
    from attention_models_tpu.ops.dispatch import on_tpu

    return dtype == jnp.bfloat16 and on_tpu()


class PatchEmbedding(nn.Module):
    """Rearrange b c (h p)(w p) -> b (hw) (p²c), LN, Linear, LN
    (vit.py:34-38 / vitvqgan.py:89-94).

    TPU bf16 fast path: the rearrange's (p1 p2 c)-minor gather is
    layout-hostile (the output's minor dim is c=3 — 6-byte elements force
    scalar-granularity HBM traffic; measured ~10 ms device time at
    bs=256/p=32, 29% of the whole ViT forward). LN1+Linear refold into a
    strided CONV plus window statistics, eliminating the transpose:

        LN1(x)·W + b  =  (conv(x, diag(γ₁)W) − μ·(γ₁ᵀW)) / σ + (β₁ᵀW + b)

    where μ, σ are the per-patch LayerNorm statistics from two window
    sums (NCHW reduce_window — no transpose either) and the conv's
    HWIO kernel is the proj kernel reshaped to (p, p, c, dim) in the
    rearrange's exact (p1 p2 c) feature order. Same parameter pytree
    (param-only stand-ins, the _DenseKernel pattern); fp32 keeps the
    exact unfused formulation bit-for-bit (the golden bit-match path),
    mirroring Mlp's fusion gating."""

    dim: int
    patch_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, imgs):  # imgs: (b, c, H, W) — reference layout
        import jax

        from attention_models_tpu.models.layers import _DenseKernel, _LNParams
        from attention_models_tpu.ops.layernorm import layernorm

        p = self.patch_size
        b, c = imgs.shape[:2]
        feat = p * p * c
        g1, b1 = _LNParams(feat, name="norm1")()
        kernel, bias = _DenseKernel((feat, self.dim), use_bias=True,
                                    name="proj")()
        g2, b2 = _LNParams(self.dim, name="norm2")()
        eps = 1e-5

        if _patch_embed_fast(self.dtype):
            f32 = jnp.float32
            x32 = imgs.astype(f32)
            win = (1, 1, p, p)
            s1 = jax.lax.reduce_window(x32, 0.0, jax.lax.add, win, win,
                                       "VALID")
            s2 = jax.lax.reduce_window(x32 * x32, 0.0, jax.lax.add, win,
                                       win, "VALID")
            mu = s1.sum(axis=1) / feat                      # (b, h, w)
            var = s2.sum(axis=1) / feat - mu * mu
            inv = jax.lax.rsqrt(var + eps)
            folded = kernel * g1[:, None]                    # diag(γ₁)W
            out = jax.lax.conv_general_dilated(
                imgs.astype(self.dtype),
                folded.reshape(p, p, c, self.dim).astype(self.dtype),
                window_strides=(p, p), padding="VALID",
                dimension_numbers=("NCHW", "HWIO", "NHWC"))  # (b, h, w, dim)
            s = folded.sum(axis=0)                           # γ₁ᵀW  (dim,)
            c0 = b1 @ kernel + bias                          # β₁ᵀW + b
            y = ((out.astype(f32) - mu[..., None] * s) * inv[..., None]
                 + c0)
            y = y.reshape(b, -1, self.dim)
            return layernorm(y, g2, b2, eps=eps).astype(self.dtype)

        # exact formulation — bit-identical to LayerNorm→Dense→LayerNorm
        x = rearrange(imgs, "b c (h p1) (w p2) -> b (h w) (p1 p2 c)", p1=p, p2=p)
        x = layernorm(x, g1, b1, eps=eps).astype(self.dtype)
        x = (x @ kernel.astype(self.dtype)) + bias.astype(self.dtype)
        return layernorm(x, g2, b2, eps=eps).astype(self.dtype)


class ViTBlock(nn.Module):
    dim: int
    n_heads: int
    d_head: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = GammaLayerNorm(self.dim, dtype=self.dtype, name="norm1")(x)
        x = x + SoftmaxAttention(
            self.dim, self.n_heads, self.d_head, self.dropout,
            dtype=self.dtype, name="self_attn",
        )(h, deterministic=deterministic)
        h = GammaLayerNorm(self.dim, dtype=self.dtype, name="norm2")(x)
        x = x + Mlp(
            self.dim, self.mlp_dim, self.dropout, dtype=self.dtype, name="mlp"
        )(h, deterministic=deterministic)
        return x


class ViT(nn.Module):
    dim: int
    image_size: int = 256
    patch_size: int = 16
    n_heads: int = 12
    d_head: int = 64
    depth: int = 12
    mlp_dim: int = 3072
    dropout: float = 0.0
    num_classes: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, imgs, deterministic: bool = True):
        num_patches = (self.image_size // self.patch_size) ** 2
        x = PatchEmbedding(self.dim, self.patch_size, dtype=self.dtype,
                           name="patch_embed")(imgs)

        class_token = self.param(
            "class_token", nn.initializers.normal(1.0), (self.dim,), jnp.float32
        )
        cls = repeat(class_token.astype(x.dtype), "d -> b 1 d", b=x.shape[0])
        x = jnp.concatenate([cls, x], axis=1)

        pos_enc = self.param(
            "pos_enc", nn.initializers.normal(1.0),
            (1, num_patches + 1, self.dim), jnp.float32,
        )
        x = x + pos_enc.astype(x.dtype)

        for i in range(self.depth):
            x = ViTBlock(
                self.dim, self.n_heads, self.d_head, self.mlp_dim, self.dropout,
                dtype=self.dtype, name=f"layers_{i}",
            )(x, deterministic=deterministic)

        x = x[:, 0]
        return nn.Dense(self.num_classes, dtype=self.dtype, name="final_fc")(x)
