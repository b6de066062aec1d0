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
from attention_models_tpu.models.layers import GammaLayerNorm, LayerNorm, Mlp


class PatchEmbedding(nn.Module):
    """Rearrange b c (h p)(w p) -> b (hw) (p²c), LN, Linear, LN
    (vit.py:34-38 / vitvqgan.py:89-94)."""

    dim: int
    patch_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, imgs):  # imgs: (b, c, H, W) — reference layout
        p = self.patch_size
        x = rearrange(imgs, "b c (h p1) (w p2) -> b (h w) (p1 p2 c)", p1=p, p2=p)
        x = LayerNorm(x.shape[-1], dtype=self.dtype, name="norm1")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj")(x)
        return LayerNorm(self.dim, dtype=self.dtype, name="norm2")(x)


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
